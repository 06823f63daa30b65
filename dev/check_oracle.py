#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB oracle compare (not shipped code).

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views over
sfDir), sorts columns by name, and compares values cell-by-cell.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (np.ndarray, list)):
            df[c] = df[c].apply(lambda v: str(list(v)))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    errs = {}
    err_path = f"{out_dir}/_errors.json"
    if os.path.exists(err_path):
        errs = json.load(open(err_path))
    only = set(sys.argv[3:])
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if name in errs:
            # the query threw THIS run; any result files are stale leftovers
            # from a previous run into the same out_dir — never compare them
            print(f"ERROR    {name}: {errs[name]}")
            n_bad += 1
            continue
        if not files:
            print(f"MISSING  {name}: no spark result")
            n_bad += 1
            continue
        got = canon(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df())
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        got_s = got.astype(str).reset_index(drop=True)
        exp_s = exp.astype(str).reset_index(drop=True)
        neq = (got_s != exp_s)
        if neq.any().any():
            cells = int(neq.sum().sum())
            print(f"VALUES   {name}: {cells} differing cells")
            mask = neq.any(axis=1)
            print(pd.concat([got[mask].head(3), exp[mask].head(3)], axis=1))
            n_bad += 1
        else:
            print(f"OK       {name}: {len(got)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
