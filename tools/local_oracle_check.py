#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 DuckDB-oracle check.

NOT part of the shipped library (the Scala code has zero Python deps) —
this mirrors what the driver does so we can catch Spark-vs-DuckDB
mismatches locally before a round ends: run graft.Verify at some sf,
then compare each <name>.parquet against the oracle SQL in DuckDB.

Usage: python3 tools/local_oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        # unify int widths / nullable ints
        if str(df[c].dtype) in ("int32", "Int32", "Int64", "uint32", "uint64"):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = normalize(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            want = normalize(con.sql(sql).df())
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: exception {e}")
            continue
        if list(got.columns) != list(want.columns):
            failed.append(name)
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failed.append(name)
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                diff_cols.append(f"{c}[dtype {a.dtype}!={b.dtype}]")
                continue
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                diff_cols.append(f"{c}[{int((~eq).sum())} rows]")
        if diff_cols:
            failed.append(name)
            print(f"FAIL  {name}: {', '.join(diff_cols)}")
        else:
            print(f"ok    {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
