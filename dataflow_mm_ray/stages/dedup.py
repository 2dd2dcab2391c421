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


def add_dedup_key(ds, text_col: str = "text", out_col: str = "dedup_key"):
    """Vectorized content-key column: text with per-event ids removed."""

    def key_batch(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b[out_col] = b[text_col].str.replace(_EVENT_ID_RE, " ", regex=True)
        return b

    return ds.map_batches(key_batch, batch_format="pandas")


def dedup_first_wins(
    ds,
    key_col: str,
    order_by: Sequence[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Keep exactly one row per ``key_col``: the first under ``order_by``.

    One hash shuffle on the key; the per-partition winner selection is a
    vectorized sort + drop_duplicates.
    """

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=[key_col], keep="first")

    return partition_map(
        ds, key_col, keep_first, num_partitions=num_partitions, sort_by=list(order_by)
    )
