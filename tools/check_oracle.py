#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the corresponding oracle SQL (oracle_sql.json) in DuckDB over the
same fixture tables, normalize (sort columns by name, then sort rows),
and compare values. Mirrors SURVEY.md §5's t2 gate so mismatches are
caught before the driver runs.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"!! {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"   {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"!! {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"!! {name}: columns differ spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"!! {name}: row count spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        mismatch = []
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                mismatch.append((c, int((~eq).sum())))
        if mismatch:
            print(f"!! {name}: value mismatches {mismatch}")
            for c, _ in mismatch[:1]:
                bad = s[c] != d[c]
                print(s[bad].head(3))
                print(d[bad].head(3))
            n_fail += 1
        else:
            # dtype note (informational — driver may be stricter)
            dt = [(c, str(s[c].dtype), str(d[c].dtype))
                  for c in s.columns if str(s[c].dtype) != str(d[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"OK {name}: {len(s)} rows{note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
