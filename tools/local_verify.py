#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, loads the Spark parquet result,
runs the matching oracle SQL (oracle_sql.json) in DuckDB with the sfDir
tables registered as views, sorts both frames by all columns (column
names sorted), and compares values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    return con, oracle

def norm(df):
    # Bit-exact, dtype-sensitive normalization: every cell becomes its repr
    # string, so int64 997 vs float64 997.0 (DuckDB HUGEINT → pandas float)
    # and 1-ulp double differences BOTH fail — mirroring the driver's hash.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con, oracle = load(sf_dir, out_dir)
    n_pass = n_fail = 0
    # Oracle queries with NO output dir are failures, not skips — a thrown
    # query that produced nothing must not read as a clean run (r9 lesson).
    # Skipped when the dump is a small subset (SPARK_GRAFT_ONLY iteration).
    dumped = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{out_dir}/*/")}
    if len(dumped) > len(oracle) // 2:
        for name in sorted(set(oracle) - dumped):
            print(f"FAIL {name}: no output dir (query threw before writing?)")
            n_fail += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
            ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else None
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_df) if spark_df is not None else 0})")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

main()
