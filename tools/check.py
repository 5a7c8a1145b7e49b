#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfDir), load the Spark result parquet, sort
columns by name, sort rows, and compare cell-by-cell. Exact match for
non-floats; floats compared exactly first, then with rtol to show
near-misses. NOT part of the shipped library (driver-side tooling only).
"""
import json, sys, glob, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    import os
    manifest = f"{out_dir}/oracle_sql.json"
    if not os.path.exists(manifest):
        subset = f"{out_dir}/oracle_sql_subset.json"
        if os.path.exists(subset):
            manifest = subset
            print("== SUBSET verify dir: gating only the queries in "
                  "oracle_sql_subset.json — NOT a full run ==")
    oracle = json.load(open(manifest))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {q}: oracle SQL error: {e}"); n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            print(f"FAIL {q}: no spark output"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)],
                              ignore_index=True))
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns got={list(got.columns)} want={list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows got={len(got)} want={len(want)}")
            n_fail += 1; continue
        bad = []
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (g, w) in enumerate(zip(gv, wv)):
                if g is None and w is None: continue
                if isinstance(g, float) and isinstance(w, float):
                    if g == w or (math.isnan(g) and math.isnan(w)): continue
                    if math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-12):
                        bad.append((c, i, g, w, "NEAR")); continue
                    bad.append((c, i, g, w, "FP")); continue
                if str(g) != str(w):
                    bad.append((c, i, g, w, "VAL"))
        if bad:
            print(f"FAIL {q}: {len(bad)} cell diffs, first 5: {bad[:5]}")
            n_fail += 1
        else:
            print(f"PASS {q} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
