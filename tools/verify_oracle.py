"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
column names, and sorted values cell-by-cell.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_frame(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def _norm_cell(v):
    import datetime

    import numpy as np
    import pandas as pd
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if v is pd.NaT:
        return None  # NaT != NaT would fail every null-timestamp cell
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    return v


def cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ocr_spark.session import build_session

    spark = build_session("verify_oracle", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    import time
    walls = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            walls[name] = time.monotonic() - t0
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spdf)} rows, "
                  f"cols={sorted(spdf.columns)}")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        scols, srows = norm_frame(spdf)
        dcols, drows = norm_frame(ddf)
        if scols != dcols:
            failures.append((name, f"schema mismatch: spark={scols} duck={dcols}"))
            print(f"[FAIL] {name}: schema mismatch\n  spark={scols}\n  duck ={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"[FAIL] {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        bad = 0
        first_diff = None
        for sr, dr in zip(srows, drows):
            if not all(cells_equal(a, b) for a, b in zip(sr, dr)):
                bad += 1
                if first_diff is None:
                    first_diff = (sr, dr)
        if bad:
            failures.append((name, f"{bad}/{len(srows)} rows differ"))
            print(f"[FAIL] {name}: {bad}/{len(srows)} rows differ")
            print(f"  spark: {first_diff[0]}\n  duck : {first_diff[1]}")
        else:
            print(f"[OK]   {name}: {len(srows)} rows match "
                  f"({walls[name]:.1f}s spark)")

    print()
    if walls:
        total = sum(walls.values())
        print(f"spark wall total {total:.1f}s; slowest:")
        for n, w in sorted(walls.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {n}: {w:.1f}s")
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print("all oracle-checked queries match")
    spark.stop()


if __name__ == "__main__":
    main()
