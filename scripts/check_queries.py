"""Local stand-in for the driver's correctness gate: run every registered
query AND its oracle SQL over an sf dir, compare row-count + schema +
order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"row count {len(ray_df)} != {len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        problems.append(f"columns {rc} != {sc}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if not (a[c].values == b[c].values).all():
                bad = int((a[c].values != b[c].values).sum())
                i = int(np.argmax(a[c].values != b[c].values))
                problems.append(
                    f"col {c}: {bad} mismatches, first at row {i}: "
                    f"{a[c].iloc[i]!r} != {b[c].iloc[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray_ordered_stream.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_nosql = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if sql is None:
            print(f"OK(rows-only) {name}: {len(ray_df)} rows in {dt:.1f}s")
            n_nosql += 1
            continue
        try:
            sql_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name} ({len(ray_df)} vs {len(sql_df)} rows, {dt:.1f}s):")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(ray_df)} rows in {dt:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
