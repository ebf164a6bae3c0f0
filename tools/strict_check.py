#!/usr/bin/env python3
"""Strict local gate: mimics the driver's exact compare (sort columns by
name, sort rows, then require IDENTICAL string rendering of every cell —
no float tolerance). Catches dtype leaks (e.g. DuckDB HUGEINT) that the
tolerant tools/check.py hides.

Usage: python3 tools/strict_check.py <verifyOutDir> <sfDir> [query ...]
"""
import json, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def render(df: pd.DataFrame):
    # the driver hashes string-rendered values; repr differences = mismatch
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]


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
        try:
            spark_df = canon(pd.read_parquet(d))
        except Exception as e:
            print(f"  ✗ {name}: spark result unsortable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"  ✗ {name}: oracle failed: {str(e)[:200]}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"  ✗ {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"  ✗ {name}: cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        a, b = render(spark_df), render(duck_df)
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i, x, y = bad[0]
            print(f"  ✗ {name}: {len(bad)}/{len(a)} rows differ; first at {i}:")
            print(f"      spark: {x}")
            print(f"      duck : {y}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(a)} rows)")
            n_pass += 1
    print(f"STRICT PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
