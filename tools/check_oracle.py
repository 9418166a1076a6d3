#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query in
outDir, load the Spark parquet result and the DuckDB oracle result,
sort columns by name and rows by all columns, and compare values.
Usage: check_oracle.py <sfDir> <outDir> [onlyQuery1,onlyQuery2,...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
try:
    # r13: memory-heavy oracles (the 64-deep d84b replace chain at x10)
    # spill; DuckDB's default temp dir is the CWD, which the repo
    # sandbox blocks -> spurious "Out of Memory" at kilobyte
    # allocations. Pin spill to /tmp and the budget/threads explicitly.
    con.execute("PRAGMA threads=8; PRAGMA memory_limit='64GB'; PRAGMA temp_directory='/tmp/duckdb_spill'")
except Exception as e:
    print(f"note: memory_limit pragma failed: {e}")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # partial corpora (bigdata/x10 has only documents/embeddings/customer)
    # still gate the queries that read what exists; a query touching a
    # missing table fails loudly at its own oracle instead
    try:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    except Exception as e:
        print(f"note: no view for {t}: {type(e).__name__}")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        continue
    if only is not None and name not in only:
        continue
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        bad.append((name, "no spark output")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if "__graft_error" in spark_df.columns:
        # Verify's failure marker: the query threw instead of producing
        # a result — report it as an error, never as a silent skip
        msg = spark_df["__graft_error"].iloc[0] if len(spark_df) else "unknown"
        bad.append((name, f"query FAILED in Verify: {msg}")); continue
    if name not in oracle:
        ok.append((name, f"rows-only ({len(spark_df)} rows)")); continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}")); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
        return df.reset_index(drop=True)
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        bad.append((name, f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")); continue
    if len(s) != len(d):
        bad.append((name, f"row count differ: spark={len(s)} duck={len(d)}")); continue
    # driver-faithful dtype gate (r11 verdict #2): the driver hashes value
    # REPRESENTATIONS, so an int64 Spark column vs a HUGEINT/float oracle
    # column ('20000' vs '20000.0') fails remotely even when the float-cast
    # values match. Fail locally on any dtype-KIND divergence so an un-cast
    # sum() in an oracle can never again pass this mirror.
    def kind_class(dt):
        k = dt.kind
        if k in "iu": return "int"
        if k == "f": return "float"
        if k == "b": return "bool"
        if k in "mM": return "time"
        return "other"
    mism = None
    for c in s.columns:
        ks, kd = kind_class(s[c].dtype), kind_class(d[c].dtype)
        if ks != kd:
            mism = (f"col {c}: dtype kind differs: spark={s[c].dtype}({ks}) "
                    f"duck={d[c].dtype}({kd}) — driver hashes representations; "
                    f"CAST the oracle column")
            break
    if mism:
        bad.append((name, mism)); continue
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                # strict: the driver hashes values, so require bitwise
                # equality (rounding discipline on both sides makes
                # this achievable)
                eq = (a.isna() & b.isna()) | (a.astype(float).values == b.astype(float).values)
            else:
                eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
        except Exception as e:
            mism = f"col {c}: compare error {e}"; break
        if not eq.all():
            i = eq.idxmin()
            mism = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"; break
    if mism: bad.append((name, mism))
    else: ok.append((name, f"MATCH ({len(s)} rows)"))

for n, m in ok: print(f"OK   {n}: {m}")
for n, m in bad: print(f"FAIL {n}: {m}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
