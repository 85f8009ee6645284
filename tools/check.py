#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this just mimics the DuckDB compare).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB with views over <sf_dir>/*.parquet,
then compares: columns sorted by name, exact value equality, row order.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    # a name may legitimately have no oracle (rows-only queries like
    # q35_approx_distinct) — its Verify output dir still exists; only
    # names with neither an oracle nor an output are typos
    dumped = {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))}
    unknown = only - set(oracle) - dumped
    if unknown:
        sys.exit(f"ERROR: unknown query name(s) {sorted(unknown)}; "
                 f"known: {sorted(set(oracle) | dumped)}")
    n_skip = 0
    for name in sorted(only - set(oracle)):
        print(f"SKIP {name}: registered but has no oracle (rows-only check)")
        n_skip += 1
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: a DIRECTORY of parts
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}");  n_fail += 1;  continue
        ok = True
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            ok = False
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            ok = False
        else:
            # dtype check (schema match), then exact values
            for c in spark_df.columns:
                if str(spark_df[c].dtype) != str(duck_df[c].dtype):
                    print(f"WARN {name}: dtype[{c}] spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                # row-order-insensitive retry to classify the failure
                s2 = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
                d2 = duck_df.sort_values(list(duck_df.columns)).reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(s2, d2, check_dtype=False, check_exact=True)
                    print(f"FAIL {name}: values match but ROW ORDER differs")
                except AssertionError:
                    print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-3:]}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)");  n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if n_pass + n_fail + n_skip == 0:
        sys.exit("ERROR: zero queries compared — nothing was checked")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
