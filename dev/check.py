#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 dev/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB (tables = views over
the sfDir parquet files), and compares: column names (sorted), row counts,
and exact values (rows sorted, floats rounded to 9 dp for display only —
mismatches are reported exactly).
"""
import json, sys, math
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = sorted(
            tuple(norm(v) for _, v in sorted(zip(got.columns, r)))
            for r in got.fetchall())
        exp = con.sql(sql)
        # HUGEINT survives fetchall() as int (so this script would pass)
        # but becomes float64 through pandas/pyarrow — the driver-side
        # comparator then hashes "5.0" vs "5". Fail loudly here instead.
        hugeint = [c for c, t in zip(exp.columns, exp.types)
                   if str(t) in ("HUGEINT", "UHUGEINT")]
        if hugeint:
            print(f"FAIL {name}: oracle cols {hugeint} are HUGEINT — "
                  f"CAST them to BIGINT (pandas turns HUGEINT into float64)")
            fails += 1
            continue
        exp_cols = sorted(exp.columns)
        exp_rows = sorted(
            tuple(norm(v) for _, v in sorted(zip(exp.columns, r)))
            for r in exp.fetchall())
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    if got_cols != exp_cols:
        print(f"FAIL {name}: cols spark={got_cols} oracle={exp_cols}")
        fails += 1
    elif got_rows != exp_rows:
        diff_a = [r for r in got_rows if r not in set(exp_rows)][:3]
        diff_b = [r for r in exp_rows if r not in set(got_rows)][:3]
        print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
        print(f"  spark-only: {diff_a}")
        print(f"  oracle-only: {diff_b}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got_rows)} rows")

sys.exit(1 if fails else 0)
