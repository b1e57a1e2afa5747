#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB (views named
after the parquet tables in <sfDir>), and compares: sort columns by name,
sort rows, exact value match (NaN == NaN).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(df[c])
            if s.dt.tz is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            # ints stay integral: float64 would quantize 60-bit hash
            # fingerprints (> 2^53) and silently pass unequal values
            df[c] = pd.to_numeric(df[c]).astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = pd.to_numeric(df[c]).astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    dirs = {d.name for d in Path(out_dir).iterdir() if d.is_dir()}
    # a query that crashed in Verify leaves no output dir — that is a
    # FAIL, not a silent omission; ditto a typo'd filter argument
    expected = set(oracle) & only if only else set(oracle)
    for missing in sorted(expected - dirs):
        print(f"[FAIL] {missing}: no query output written by Verify")
        n_fail += 1
    for typo in sorted(only - (dirs | set(oracle))):
        print(f"[FAIL] {typo}: unknown query name")
        n_fail += 1
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        if only and name not in only:
            continue
        got = normalize(pd.read_parquet(qdir))
        if name not in oracle:
            print(f"[SKIP] {name}: no oracle ({len(got)} rows)")
            continue
        try:
            want = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} "
                  f"!= {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_exact=True)
            print(f"[PASS] {name} ({len(got)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"[FAIL] {name}: " + " | ".join(msg[:4]))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
