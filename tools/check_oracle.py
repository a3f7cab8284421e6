#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table in sfDir under its stem name, runs every
oracle_sql.json query, and compares (after sorting columns by name and
rows by all columns) against the Spark-dumped parquet.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.splitext(os.path.basename(p))[0]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = True
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(out_dir, name)
    try:
        got = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        ok = False
        continue
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark parquet output")
        ok = False
        continue
    exp = pd.concat([pd.read_parquet(f) for f in files])

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    g, e = norm(got), norm(exp)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        ok = False
        continue
    schema_g = {c: str(g[c].dtype) for c in g.columns}
    schema_e = {c: str(e[c].dtype) for c in e.columns}
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
        ok = False
        continue
    if not g.equals(e):
        diff = (g != e)
        cols = [c for c in g.columns if diff[c].any()]
        print(f"FAIL {name}: value mismatch in {cols}; schema duck={schema_g} spark={schema_e}")
        for c in cols[:2]:
            idx = diff[c][diff[c]].index[:5]
            print("  duck :", g.loc[idx, c].tolist())
            print("  spark:", e.loc[idx, c].tolist())
        ok = False
        continue
    note = "" if schema_g == schema_e else f" (dtype diff: {schema_g} vs {schema_e})"
    print(f"OK   {name}: {len(g)} rows{note}")

sys.exit(0 if ok else 1)
