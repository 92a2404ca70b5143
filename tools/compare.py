#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares against the Spark-written parquet in
<verifyOutDir>/<name>/ — column names (sorted), row count, and a hash of the
sorted stringified values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, float):
            return format(v, ".10g")
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, dc = sorted(sdf.columns), sorted(ddf.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}"); n_fail += 1; continue
        s, d0 = canon(sdf), canon(ddf)
        if s != d0:
            diffs = [i for i, (a, b) in enumerate(zip(s, d0)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for i in diffs:
                print(f"  spark  {s[i]}\n  duckdb {d0[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sdf)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
