#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Reads each <outDir>/<query>/ parquet produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata tables,
canonicalizes both (columns sorted by name, rows sorted by all columns),
and compares values exactly. NOT part of the shipped library — dev tooling.
"""
import sys, json, glob

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("int32", "Int32", "int16", "uint32"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name in sorted(sql):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); failures += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        want = canon(con.execute(sql[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"{name}: SCHEMA mismatch spark={list(got.columns)} oracle={list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"{name}: ROWS mismatch spark={len(got)} oracle={len(want)}"); failures += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        except AssertionError as e:
            print(f"{name}: VALUE mismatch: {str(e)[:500]}")
            failures += 1
            continue
        # The driver's hash is dtype-sensitive (r1: DuckDB sum(BIGINT) →
        # HUGEINT → pandas float64 made 12 value-exact queries hash-fail).
        # Flag any post-canon dtype divergence as a failure here too.
        bad = [c for c in got.columns if got[c].dtype != want[c].dtype]
        if bad:
            detail = ", ".join(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}" for c in bad)
            print(f"{name}: DTYPE mismatch (driver hash would fail): {detail}")
            failures += 1
        else:
            print(f"{name}: OK ({len(got)} rows)")
    rows_only = [n for n in glob.glob(f"{out_dir}/*/") if n.split("/")[-2] not in sql]
    for d in sorted(rows_only):
        n = d.split("/")[-2]
        files = glob.glob(f"{d}*.parquet")
        cnt = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{n}: rows-only ({cnt} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:3]))
