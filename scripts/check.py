#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's t2 gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB (tables =
parquet files of <sfDir>), sorts columns by name and rows by all columns, and
compares values exactly (tiny float tolerance report included for triage).
"""
import json
import math
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
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates may come back as datetime.date vs pandas Timestamp
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            av = av.astype(float); bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                maxdiff = (av[neq] - bv[neq]).abs().max()
                return (f"VALUES col={c} n={int(neq.sum())} first@{i} "
                        f"spark={av[i]!r} duck={bv[i]!r} maxdiff={maxdiff:g}")
        else:
            av2 = av.astype(str).where(~av.isna(), "<NA>")
            bv2 = bv.astype(str).where(~bv.isna(), "<NA>")
            neq = av2 != bv2
            if neq.any():
                i = neq.idxmax()
                return (f"VALUES col={c} n={int(neq.sum())} first@{i} "
                        f"spark={av[i]!r} duck={bv[i]!r}")
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            results[name] = "MISSING spark output"
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(qdir.glob("*.parquet"))],
                ignore_index=True)
            duck_df = con.execute(oracle[name]).df()
            err = compare(name, spark_df, duck_df)
        except Exception as e:  # noqa: BLE001
            err = f"ERROR {type(e).__name__}: {e}"
        results[name] = err
    npass = sum(1 for v in results.values() if v is None)
    for name, err in results.items():
        print(f"{'PASS' if err is None else 'FAIL'} {name}" +
              (f"  {err}" if err else ""))
    print(f"== {npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
