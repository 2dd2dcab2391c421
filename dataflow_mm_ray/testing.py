"""Shared test/verification helpers: canonical frame comparison against
DuckDB oracles (mirrors the driver's order-insensitive value compare)."""
from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, sort rows. Deliberately does NOT coerce
    numeric representations: the driver's value hash is
    representation-sensitive (int64 vs float64 vs nullable Int64 hash
    differently — VERDICT r1 #1/#2), so the engine and oracle must emit
    the SAME canonical dtype and bit-exact values."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _kind(dtype) -> str:
    s = str(dtype)
    if s.startswith(("Int", "UInt")) or s.startswith(("int", "uint")):
        # nullable pandas Int* is NOT the same representation as numpy
        # int — flag it distinctly so a NULL-able engine column can't
        # silently pass against a float64 oracle column.
        return "Int(nullable)" if s[0] == "I" or s[0] == "U" else "int"
    if s.startswith(("Float", "float")):
        return "Float(nullable)" if s[0] == "F" else "float"
    return s


def assert_matches_oracle(result, con, sql: str):
    got = canon(to_pandas(result))
    want = canon(con.sql(sql).df())
    for c in want.columns:
        gk, wk = _kind(got[c].dtype), _kind(want[c].dtype)
        assert gk == wk, f"column {c!r}: engine dtype kind {gk} != oracle {wk}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    return got
