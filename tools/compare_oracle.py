#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name and rows by all columns, and value-compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, ints to int64 where possible
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for p in sorted(glob.glob(f'{sf_dir}/*.parquet')):
        name = os.path.basename(p).replace('.parquet', '')
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    results = {}
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        files = glob.glob(f'{spark_path}/*.parquet')
        if not files:
            results[name] = 'MISSING_SPARK_OUTPUT'
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            results[name] = f'ERROR: {e}'
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f'SCHEMA: spark={list(got.columns)} duck={list(want.columns)}'
            continue
        if len(got) != len(want):
            results[name] = f'ROWS: spark={len(got)} duck={len(want)}'
            continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            # the driver hashes string reprs: an int64-vs-float64 dtype split
            # (e.g. DuckDB HUGEINT sums -> float64) is a real mismatch even
            # when values are numerically equal
            if pd.api.types.is_float_dtype(g) != pd.api.types.is_float_dtype(w):
                bad = f'DTYPE col={c} spark={g.dtype} duck={w.dtype}'
                break
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
                ok = np.allclose(g.astype(float), w.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = ok
            else:
                exact = g.equals(w)
            if not exact:
                diffs = (g != w)
                i = diffs[diffs].index[0] if diffs.any() else 0
                bad = f'VALUES col={c} row={i} spark={g.iloc[i]!r} duck={w.iloc[i]!r}'
                break
        results[name] = bad or 'OK'
    n_ok = sum(1 for v in results.values() if v == 'OK')
    for k, v in results.items():
        print(f'{"PASS" if v == "OK" else "FAIL"} {k}: {v}')
    print(f'{n_ok}/{len(results)} match')
    sys.exit(0 if n_ok == len(results) else 1)

main()
