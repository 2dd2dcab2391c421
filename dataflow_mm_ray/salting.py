"""Hot-key (skew) handling: salted repartition with merge-combine.

North-rule requirement (SURVEY.md §7.2 milestone 10; §4 skew row): a
Zipf-hot conversation must not serialize its partition. The pattern:

1. **detect** — per-key counts from a cheap per-batch combiner
   (stats.hot_conversations);
2. **salt** — rows of hot keys get a salt derived from a *stable* hash
   of a secondary column (never random — replays must agree), so one
   hot key spreads over ``n_salts`` sub-partitions;
3. **partial** — the per-partition kernel runs per (key, salt),
   producing mergeable partials;
4. **merge-combine** — one (tiny) second exchange keyed by the
   original key merges the partials.

``salted_aggregate`` implements the pattern for any
sum/count/min/max-style aggregation spec. Order-sensitive operators
(sessions, joins) cannot be salted this way — they rely on
pre-aggregation instead (windows.py) or full-key co-location.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd

from dataflow_mm_ray.hashing import stable_hash_array
from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def add_salt(batch: pd.DataFrame, key: str, hot_keys: frozenset, salt_from: str,
             n_salts: int) -> pd.DataFrame:
    """Append an integer ``__salt`` (0 for cold keys; stable-hashed from
    ``salt_from`` for hot keys, so any replay salts identically) and a
    ``__salted`` partitioning column mixing key and salt hashes. The
    original ``key`` column is carried untouched — no delimited string
    round-trip, so keys containing any character (or non-string keys)
    group correctly and keep their dtype."""
    batch = batch.copy(deep=False)
    keys = batch[key].astype(str)
    is_hot = keys.isin(hot_keys).to_numpy()
    salts = (stable_hash_array(batch[salt_from].to_numpy()) % np.uint64(n_salts)).astype(np.int64)
    salts[~is_hot] = 0
    batch["__salt"] = salts
    # partition key: key-hash mixed with salt (numeric, collision-safe
    # for partitioning — the reduce groups by the real columns)
    batch["__salted"] = (
        stable_hash_array(keys.to_numpy(dtype=object))
        ^ (salts.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    ).view(np.int64)
    return batch


def salted_aggregate(
    ds,
    key: str,
    aggs: Mapping[str, tuple[str, str]],  # out_col -> (in_col, fn in sum/count/min/max)
    hot_keys: Sequence[str],
    salt_from: str,
    n_salts: int = 8,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Grouped aggregation that survives arbitrarily hot keys.

    Returns one row per original ``key`` with the requested aggregates;
    results are identical to an unsalted groupby (pytest-pinned).
    """
    hot = frozenset(str(k) for k in hot_keys)

    salted = ds.map_batches(
        lambda b: add_salt(b, key, hot, salt_from, n_salts), batch_format="pandas"
    )

    def partial(part: pd.DataFrame) -> pd.DataFrame:
        # group by the REAL (key, salt) columns — never recovered from a
        # string round-trip, so the key keeps its dtype and content
        g = part.groupby([key, "__salt"], sort=False)
        out = g.size().reset_index().drop(columns=0)
        for out_col, (in_col, fn) in aggs.items():
            if fn == "count":
                out[out_col] = g.size().to_numpy()
            else:
                out[out_col] = g[in_col].agg(fn).to_numpy()
        return out.drop(columns="__salt")

    partials = partition_map(salted, "__salted", partial, num_partitions=num_partitions)

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key, sort=False, as_index=False)
        return g.agg({out_col: _MERGE[fn] for out_col, (_, fn) in aggs.items()})

    # merge-combine: tiny second exchange over one row per (key, salt)
    # post-partial data is one row per (key, salt) — a small fixed P
    # beats the auto rule's CPU floor here
    return partition_map(partials, key, combine, num_partitions=min(16, num_partitions or 16))
