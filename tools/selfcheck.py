#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (column-name-sorted,
row-sorted, exact values). Usage: selfcheck.py <sfDir> <outDir>."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{q}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {q}: no spark output"); fails += 1; continue
    try:
        oracle_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle error {e}"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in
                          glob.glob(f"{spark_path}/*.parquet")], ignore_index=True)
    a = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    b = spark_df.reindex(sorted(spark_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {q}: columns {list(b.columns)} vs oracle {list(a.columns)}")
        fails += 1; continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f"FAIL {q}: rows {len(b)} vs oracle {len(a)}"); fails += 1; continue
    if a.dtypes.tolist() != b.dtypes.tolist():
        print(f"WARN {q}: dtypes spark={b.dtypes.tolist()} oracle={a.dtypes.tolist()}")
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"OK   {q}: {len(a)} rows")
    except AssertionError as e:
        print(f"FAIL {q}: {str(e).splitlines()[-1]}"); fails += 1

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/q_*")):
    q = os.path.basename(d)
    if q not in oracle and os.path.isdir(d):
        n = sum(pd.read_parquet(f).shape[0] for f in glob.glob(f"{d}/*.parquet"))
        print(f"{'OK  ' if n > 0 else 'FAIL'} {q}: rows-only ({n} rows)")
        fails += 0 if n > 0 else 1
sys.exit(1 if fails else 0)
