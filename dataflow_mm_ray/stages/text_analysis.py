"""Ray Data stages for the text kernels (rule filter + textstats).

Stateless ``map_batches`` tasks: the kernels compile their regexes at
module import, so each worker process pays setup once; per-batch work
is C-regex over a numpy object array.
"""
from __future__ import annotations

import pandas as pd

from dataflow_mm_ray.functions.text_rules import rule_flags_batch
from dataflow_mm_ray.functions.textstats import textstats_batch
from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE


def rule_filter_flags(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-row rule flags + keep (non-destructive, reference
    ScoreFilter-style marking)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        flags = rule_flags_batch(batch[text_col].tolist())
        flags.insert(0, id_col, batch[id_col].to_numpy())
        return flags

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)


def rule_filter_kept(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Destructive variant: only rows passing all 15 rules survive
    (the reference RuleBaseFilter.run drops failing rows —
    rule_base_filter.py:420-424)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        flags = rule_flags_batch(batch[text_col].tolist())
        return batch.loc[flags["keep"].to_numpy(), [id_col, text_col]]

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)


def text_stats(ds, id_col: str = "doc_id", text_col: str = "text", round_to: int = 6):
    """Full per-document analysis: normalization, token counts, quality
    metrics, language ID, fingerprint."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        stats = textstats_batch(batch[text_col].tolist())
        for c in ("mean_word_len", "stopword_ratio", "punct_ratio"):
            stats[c] = stats[c].round(round_to)
        stats.insert(0, id_col, batch[id_col].to_numpy())
        return stats

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)
