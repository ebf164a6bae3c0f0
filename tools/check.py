#!/usr/bin/env python3
"""Local mini-gate mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verifyOutDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB with the sf tables registered as
views, sorts columns by name + rows, and diffs values.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    import numpy as np
    if isinstance(a, np.ndarray):
        a = a.tolist()
    if isinstance(b, np.ndarray):
        b = b.tolist()
    if isinstance(a, (np.floating, np.integer)):
        a = a.item()
    if isinstance(b, (np.floating, np.integer)):
        b = b.item()
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if str(a) == str(b):
        return True
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return False


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_noracle = 0
    for d in sorted(out_dir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        if only and name not in only:
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"  ✗ {name}: COLUMNS spark={list(a.columns)} duck={list(b.columns)}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"  ✗ {name}: ROWS spark={len(a)} duck={len(b)}")
            continue
        bad = []
        for i in range(len(a)):
            for c in a.columns:
                if not cell_eq(a.at[i, c], b.at[i, c]):
                    bad.append((i, c, a.at[i, c], b.at[i, c]))
        if bad:
            n_fail += 1
            print(f"  ✗ {name}: {len(bad)} cell diffs; first: {bad[:3]}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(a)} rows)")
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
