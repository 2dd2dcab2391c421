"""Deduplication stages.

First-wins semantics follow the reference's
``ImageDeduplicateFilter`` (``dataflow/operators/core_vision/filter/
image_deduplication_filter.py:143-157``): among duplicates, keep the
first occurrence in stable row order — here the stable order is
``(conv_id, turn_idx)`` for transcripts and ``doc_id`` for documents.

Exact dedup at scale: add a content key in vectorized ``map_batches``,
hash-partition by the key (one shuffle), keep the min-ordered row per
key inside each partition — never an O(n^2) pairwise matrix like the
reference. Near-dup variants (MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine) live in ``stages/neardup.py``.
"""
from __future__ import annotations

import re
from typing import Sequence

import pandas as pd

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

# Strips the unique " #<event_id> " token injected by the transcript
# derivation, so duplicate event payloads collide (dedup fixture).
_EVENT_ID_RE = re.compile(r" #\d+ ")


def add_dedup_key(ds, text_col: str = "text", out_col: str = "dedup_key",
                  arrow: bool = False):
    """Vectorized content-key column: text with per-event ids removed.
    ``arrow=True`` runs the regex as a pyarrow.compute kernel on Arrow
    batches (RE2, same all-occurrences semantics), so an Arrow source
    (``transcripts_from_events(arrow=True)``) stays Arrow end-to-end."""
    if arrow:
        import pyarrow.compute as pc

        def key_batch_arrow(t):
            key = pc.replace_substring_regex(
                t.column(text_col), pattern=_EVENT_ID_RE.pattern,
                replacement=" ",
            )
            return t.append_column(out_col, key)

        return ds.map_batches(key_batch_arrow, batch_format="pyarrow")

    def key_batch(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b[out_col] = b[text_col].str.replace(_EVENT_ID_RE, " ", regex=True)
        return b

    return ds.map_batches(key_batch, batch_format="pandas")


def _first_per_key_arrow_kernel(key_col: str, order_by: Sequence[str]):
    """Arrow Table -> Table winner pick: sort by (key, *order), keep the
    first row of every key run (null keys group together, matching the
    pandas drop_duplicates NaN rule and SQL PARTITION BY)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(t):
        if t.num_rows == 0:
            return t
        t = t.sort_by([(key_col, "ascending")]
                      + [(c, "ascending") for c in order_by])
        k = t.column(key_col).combine_chunks()
        n = len(k)
        mask = np.ones(n, dtype=bool)
        if n > 1:
            neq = pc.fill_null(
                pc.not_equal(k.slice(1), k.slice(0, n - 1)), False
            ).to_numpy(zero_copy_only=False)
            va = pc.is_valid(k).to_numpy(zero_copy_only=False)
            mask[1:] = neq | (va[1:] != va[:-1])
        return t.filter(pa.array(mask))

    return kernel


def dedup_first_wins(
    ds,
    key_col: str,
    order_by: Sequence[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    arrow: bool = False,
):
    """Keep exactly one row per ``key_col``: the first under ``order_by``.

    One hash shuffle on the key; the per-partition winner selection is a
    vectorized sort + drop_duplicates. With ``arrow=True`` the exchange
    AND the reduce stay Arrow end-to-end (zero-copy string buffers, no
    pandas object materialization — the r4-verdict hot spot on
    string-heavy winner paths); the winner rule is identical
    (``order_by`` must order rows totally within a key, which every
    caller's (doc_id) / (conv_id, turn_idx) / (ts, conv_id, turn_idx)
    key does)."""
    if arrow:
        return partition_map(
            ds, key_col, _first_per_key_arrow_kernel(key_col, order_by),
            num_partitions=num_partitions, arrow_output=True,
        )

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=[key_col], keep="first")

    return partition_map(
        ds, key_col, keep_first, num_partitions=num_partitions, sort_by=list(order_by)
    )
