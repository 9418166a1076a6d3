#!/usr/bin/env python3
"""Oracle-type lint (r11 verdict #3): DESCRIBE every oracleSql query
against the sf tables and fail on any result column whose DuckDB type
is HUGEINT / UHUGEINT / DECIMAL — those arrive when an aggregate
(sum, //-division of sums, ...) is left un-cast, and the driver's
representation-hash then mismatches Spark's int64 even when every
value is identical. SURVEY §4's rule ("sums CAST to BIGINT") is
enforced mechanically here.

Usage: lint_oracle.py <sfDir> <oracle_sql.json>
       (oracle_sql.json as dumped by graft.Verify)
"""
import sys, os, json
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    except Exception as e:
        print(f"note: no view for {t}: {type(e).__name__}")

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")
oracle = json.load(open(oracle_path))
bad, skipped = [], []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        # environment-dependent, not a TYPE violation: oracles that
        # read gate-produced files (q_c17/q_c21 under /tmp) or run
        # against a partial corpus (bigdata/x* layouts) can't
        # DESCRIBE here; the value gate (check_oracle) still fails
        # loudly on genuinely broken SQL
        skipped.append((name, f"DESCRIBE failed (missing table/file?): "
                              f"{type(e).__name__}"))
        continue
    for cname, ctype, *_ in cols:
        if any(b in ctype.upper() for b in BANNED):
            bad.append((name, f"column {cname} has un-cast type {ctype} "
                              f"— wrap in CAST(... AS BIGINT/DOUBLE)"))

for n, m in skipped:
    print(f"note {n}: {m}")
for n, m in bad:
    print(f"LINT {n}: {m}")
print(f"\n{len(oracle)} queries linted "
      f"({len(skipped)} skipped as un-describable), {len(bad)} violations")
sys.exit(1 if bad else 0)
