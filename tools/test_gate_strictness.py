#!/usr/bin/env python3
"""Proof (r11 verdict #2) that the local gate is driver-faithful:
revert q_d75_pagerank's BIGINT cast in a COPY of oracle_sql.json and
assert that check_oracle.py now FAILS that query on dtype kind (the
un-cast sum() comes back HUGEINT -> pandas float64, vs Spark int64),
and that lint_oracle.py flags it. Values are identical either way —
only a representation-strict gate can catch this class of bug.

Usage: test_gate_strictness.py <sfDir> <outDir>
       (outDir as produced by graft.Verify; run check_oracle first)
"""
import sys, os, json, shutil, subprocess, tempfile

sfdir, outdir = sys.argv[1], sys.argv[2]
tools = os.path.dirname(os.path.abspath(__file__))
orig = json.load(open(os.path.join(outdir, "oracle_sql.json")))
sql = orig["q_d75_pagerank"]
needle = "CAST(r AS BIGINT) AS rank_micro"
assert needle in sql, f"expected cast not found in q_d75_pagerank: {sql[-200:]}"
broken = dict(orig)
broken["q_d75_pagerank"] = sql.replace(needle, "r AS rank_micro")

with tempfile.TemporaryDirectory() as tmp:
    # a minimal outDir: the real spark parquet for d75 + the broken oracle
    shutil.copytree(os.path.join(outdir, "q_d75_pagerank"),
                    os.path.join(tmp, "q_d75_pagerank"))
    json.dump(broken, open(os.path.join(tmp, "oracle_sql.json"), "w"))

    r = subprocess.run([sys.executable, os.path.join(tools, "check_oracle.py"),
                        sfdir, tmp, "q_d75_pagerank"],
                       capture_output=True, text=True)
    out = r.stdout + r.stderr
    assert r.returncode != 0, f"check_oracle PASSED an un-cast HUGEINT column:\n{out}"
    assert "dtype kind differs" in out, f"failed for the wrong reason:\n{out}"

    r2 = subprocess.run([sys.executable, os.path.join(tools, "lint_oracle.py"),
                         sfdir, os.path.join(tmp, "oracle_sql.json")],
                        capture_output=True, text=True)
    assert r2.returncode != 0, "lint_oracle missed the un-cast HUGEINT column"
    assert "rank_micro" in r2.stdout, f"lint flagged the wrong thing:\n{r2.stdout}"

    # sanity: the pristine oracle still passes the same strict check
    r3 = subprocess.run([sys.executable, os.path.join(tools, "check_oracle.py"),
                         sfdir, outdir, "q_d75_pagerank"],
                        capture_output=True, text=True)
    assert r3.returncode == 0, f"pristine q_d75_pagerank no longer passes:\n{r3.stdout}"

print("strictness proof OK: un-cast HUGEINT fails check_oracle (dtype kind) "
      "and lint_oracle; pristine oracle passes")
