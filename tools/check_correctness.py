"""Local stand-in for the driver's correctness gate.

Runs every registered query's Ray pipeline AND its DuckDB oracle on the
same sf dir, then compares row count, column names and an
order-insensitive value frame. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
        if str(df[c].dtype).startswith(("Int", "UInt")):  # nullable ints
            df[c] = df[c].astype("float64")  # unify null repr for compare
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float64:
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    from dataflow_mm_ray.queries import registry

    failed = []
    for name, q in registry().items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(q.fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if q.sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = canon(con.sql(q.sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-6)
            print(f"ok   {name}: {len(got)} rows match oracle")
        except AssertionError as e:
            print(f"FAIL {name}: mismatch rows ray={len(got)} sql={len(want)}")
            print(str(e).splitlines()[0:6])
            failed.append(name)
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
