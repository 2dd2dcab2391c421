"""Keyed hash-partitioned execution — the engine's one shuffle idiom.

Every keyed stage (windows, sessions, stateful joins, first-wins dedup,
conversation re-assembly) needs *all rows of a key co-located and in a
known order*. Instead of paying one ``groupby(key)`` shuffle per
operator with a Python call per (tiny) group, the engine:

1. adds a stable ``__part = hash(key) % P`` column in a vectorized
   ``map_batches`` (SipHash, process-stable — see hashing.py);
2. runs ONE ``groupby("__part").map_groups`` shuffle, so each function
   call receives a whole hash partition (thousands of conversations)
   and applies a *vectorized* pandas kernel to it.

At 100 TB this means: P is chosen so a partition fits a worker heap,
the shuffle moves each row once, and the per-partition kernel is
numpy/pandas — never a Python loop per conversation. Hot keys can be
salted by passing ``salt_col`` (partials must then be merge-combined by
the caller, see stages/windows.py).
"""
from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from dataflow_mm_ray.hashing import partition_ids
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

PART_COL = "__part"


def with_partition_col(ds, key: str, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Append a stable int32 partition-id column derived from ``key``."""

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch[PART_COL] = partition_ids(batch[key].to_numpy(), num_partitions)
        return batch

    return ds.map_batches(add_part, batch_format="pandas")


def partition_map(
    ds,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    sort_by: Sequence[str] | None = None,
):
    """Apply ``fn`` to each hash partition of ``ds`` keyed by ``key``.

    ``fn`` receives a pandas DataFrame holding *every* row whose key
    hashes to that partition (all rows of any given key — never split),
    optionally pre-sorted by ``sort_by`` (stable mergesort, so ties
    keep input order). It must return a DataFrame.
    """

    def run_part(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns=[PART_COL])
        if sort_by:
            group = group.sort_values(list(sort_by), kind="mergesort")
        return fn(group)

    return (
        with_partition_col(ds, key, num_partitions)
        .groupby(PART_COL)
        .map_groups(run_part, batch_format="pandas")
    )
