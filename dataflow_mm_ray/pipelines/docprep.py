"""End-to-end document preparation pipeline — the composed
training-data-prep chain a DataFlow-MM user runs as a Python pipeline
script (e.g. the reference's text pipelines wiring RuleBaseFilter ->
refiners -> dedup -> quality scoring through FileStorage steps), here
as ONE streaming Ray Data chain with no per-step file materialization:

  read documents
  -> 15-rule quality filter (RuleBaseFilter semantics, vectorized)
  -> text normalization + quality stats + language id + fingerprint
     (all fused into one stateless map pass)
  -> exact first-wins dedup on the content fingerprint (one keyed
     exchange)
  -> MinHash-LSH near-dup removal (distributed banding + verification)
  -> quality cut: keep documents whose punctuation ratio stays under
     the cap (junk/markup-heavy docs drop)

Each stage streams blocks into the next; the only barriers are the
keyed exchanges (fingerprint dedup, LSH banding/verify) and the
near-dup keep join. Returns the surviving documents with their quality
metadata — the dataset a user would hand to tokenization.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.sources.tables import read_table


def docprep_pipeline(sf_dir: str, neardup_threshold: float = 0.7,
                     max_punct_ratio: float = 0.5, num_partitions: int = 16,
                     neardup: str = "minhash"):
    """``neardup`` picks the near-dup stage: 'minhash' (the scale
    default: banded LSH candidates + exact verify) or 'exact' (the
    distributed inverted-index n-gram Jaccard path — same keep
    semantics, no probabilistic candidate recall, fully SQL-oracled
    as ``docprep_pipeline_exact``)."""
    from dataflow_mm_ray.functions.text_rules import rule_flags_batch
    from dataflow_mm_ray.functions.textstats import textstats_batch
    from dataflow_mm_ray.partition import hash_join
    from dataflow_mm_ray.stages.dedup import dedup_first_wins
    from dataflow_mm_ray.stages.neardup import minhash_lsh_dedup, ngram_jaccard_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def clean_and_annotate(b: pd.DataFrame):
        # emits ARROW blocks: the annotated text/norm_text columns then
        # travel the exchange + winner reduce as zero-copy string
        # buffers instead of pickled object frames (r4-verdict task 4)
        import pyarrow as pa

        flags = rule_flags_batch(b["text"])
        kept = b.loc[flags["keep"].to_numpy()].reset_index(drop=True)
        if not len(kept):
            return _ANNOT_PA_SCHEMA.empty_table()
        stats = textstats_batch(kept["text"])
        # the repo-wide float convention (CLAUDE.md): ratio columns are
        # rounded once at the producing stage, same as stages/
        # text_analysis.text_stats, so any consumer (or oracle)
        # compares identical doubles
        for c in ("stopword_ratio", "punct_ratio"):
            stats[c] = stats[c].round(6)
        return pa.Table.from_arrays(
            [
                pa.array(kept["doc_id"].to_numpy().astype(np.int64)),
                pa.array(kept["text"], type=pa.string()),
                pa.array(stats["norm_text"], type=pa.string()),
                pa.array(stats["n_ws_tokens"].to_numpy().astype(np.int64)),
                pa.array(stats["punct_ratio"].to_numpy()),
                pa.array(stats["stopword_ratio"].to_numpy()),
                pa.array(stats["lang_pred"], type=pa.string()),
                pa.array(stats["fingerprint"], type=pa.string()),
            ],
            schema=_ANNOT_PA_SCHEMA,
        )

    annotated = docs.map_batches(clean_and_annotate, batch_format="pandas")
    # materialize: consumed by BOTH the near-dup pipeline and the final
    # keep join — without it the read+annotate+dedup prefix (the
    # md5-fingerprint pass included) executes twice (CLAUDE.md rule).
    # Arrow end-to-end through the winner exchange (arrow=True).
    exact_deduped = dedup_first_wins(
        annotated, "fingerprint", order_by=("doc_id",),
        num_partitions=num_partitions, arrow=True,
    ).materialize()

    # near-dup keep decisions over the exact-dedup survivors, then a
    # partitioned join to apply them (both sides keyed by doc_id)
    if neardup == "exact":
        keep = ngram_jaccard_dedup(
            sf_dir, threshold=neardup_threshold,
            ds=exact_deduped, num_partitions=num_partitions,
        )
    else:
        keep = minhash_lsh_dedup(
            sf_dir, threshold=neardup_threshold,
            ds=exact_deduped, num_partitions=num_partitions,
        )

    def keep_only(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["keep"].to_numpy(), ["doc_id"]] if len(b) else b[["doc_id"]]

    keep_ids = keep.map_batches(keep_only, batch_format="pandas")
    joined = hash_join(exact_deduped, keep_ids, "doc_id", num_partitions=num_partitions)

    def quality_cut(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        m = b["punct_ratio"].to_numpy() <= max_punct_ratio
        return b.loc[m].drop(columns=["fingerprint"])

    return joined.map_batches(quality_cut, batch_format="pandas")


def _annot_pa_schema():
    import pyarrow as pa

    return pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("norm_text", pa.string()), ("n_tokens", pa.int64()),
        ("punct_ratio", pa.float64()), ("stopword_ratio", pa.float64()),
        ("lang_pred", pa.string()), ("fingerprint", pa.string()),
    ])


_ANNOT_PA_SCHEMA = _annot_pa_schema()
