"""The engine's query registry: name -> (Ray pipeline, DuckDB oracle).

Each entry is one operator/pipeline from SURVEY.md §2 re-expressed
Ray-Data-first, with (where SQL-expressible) an ANSI-SQL oracle that
DuckDB runs over the same parquet tables. Column names and dtypes match
between the two sides; float-sensitive outputs are integer (``*_us``)
or explicitly rounded identically on both sides.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE, transcripts_from_events


class Query(NamedTuple):
    fn: Callable[[str], Any]
    sql: str | None  # DuckDB oracle (None -> rows-only check)


_REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = Query(fn, sql)
        return fn

    return deco


# The driver's correctness gate enumerates queries() in order and caps
# at 50 entries (CORRECTNESS_r02 covered exactly the first 50 of 75).
# This list pins the first 50 so every SURVEY-§2 anchor operator gets a
# driver-visible correctness row: one SQL-oracled anchor per §2 row,
# new operators included, redundant twins demoted below the fold
# (they stay covered by tools/check_correctness.py + pytest).
_DRIVER_PRIORITY = [
    # sources + CEP/windowing core (north star)
    "transcripts", "tumbling_window", "sliding_window", "session_window",
    "tool_join", "late_events", "window_distinct_convs_exact",
    "window_latency_pctl",
    # ivf_knn_percentile is the same-output-contract SCALE twin of
    # knn_percentile (pinned equal at full probe) — the driver row that
    # matters is the scale path; the brute-force parity op stays below
    # the fold. simhash_neardup_first is the batch twin of the streamed
    # near-dup stream (sdup).
    "hot_conversations", "token_doc_freq", "ivf_knn_percentile",
    "simhash_neardup_first",
    # CEP pattern matching + exact heavy hitters (round-4 additions)
    "cep_tool_roundtrip", "cep_tool_chain_nonoverlap", "cep_funnel",
    "cep_unanswered_invocations", "heavy_hitters",
    # text operators (§2.2)
    "rule_filter", "text_stats", "score_filter", "text_normalize",
    "cat_filter", "conversation_message", "udf_refine", "chunk_merge",
    "answer_reward_exact",
    # scorer/filter operators (§2.3) — rule_filter_full is the COMPLETE
    # RuleBaseFilter (text rules + image basic checks + NSFW threshold),
    # nli_cat_filter the fourth NLI decision rule
    "clipscore_filter", "alignment_filter", "nli_sensitive_filter",
    "nli_cat_filter", "rule_filter_full",
    "failrate_filter",
    # video family (§2.2/2.3/2.5) — the aesthetic/OCR/motion scorer trio
    # (round-4); resolution/info/caption/luminance twins demoted below
    # the fold (same probe shape; covered by check_correctness + pytest)
    # (video_motion_filter demoted below the fold: video_score_filter
    # consumes the motion metric column, and the probe shape is shared
    # with the aesthetic/OCR rows — still covered by
    # check_correctness + pytest)
    # video_chain_pipeline is the COMPOSED eight-step reference video
    # pipeline run through the declarative runner (scene chunking is a
    # sub-computation of its oracle, so the standalone scene_segments
    # row is demoted below the fold — still SQL-checked there)
    "video_clip_filter", "video_score_filter",
    "video_aesthetic_filter", "video_ocr_filter",
    "video_chain_pipeline",
    # end-to-end streaming anchors: lambda repair (hash arrival, zero
    # lateness, quarantine replay == the batch tumbling oracle) and the
    # bounded-state production mode (by_ts arrival, finite lateness,
    # committed windows == the batch oracle with zero quarantined)
    "lambda_repair", "bounded_state_stream",
    # generators (§2.4) — the same-shape prompt variants
    # (templated/prompt_templated/batch/pers/cot/reasoning) demoted
    "prompted_qa", "prompted_vqa",
    "llm_judge_score",
    "vlm_bbox", "multimodal_math",
    # refine operators (new this round)
    "visual_grounding_refine", "visual_dependency_refine",
    "seg_cutout_refine",
    # dedup / similarity (§2.6) — distinct_tools (trivial distinct) and
    # embedding_neardup (all-pairs parity op; its scale twin
    # embedding_srp_neardup + ivf_knn_percentile carry the story)
    # demoted for the duplicate-cluster CC operator
    "dedup_exact", "ngram_jaccard_dedup",
    "dup_clusters",
]


def registry() -> dict[str, Query]:
    # import for side-effect registration
    import dataflow_mm_ray.queries_cep  # noqa: F401
    import dataflow_mm_ray.queries_text  # noqa: F401
    import dataflow_mm_ray.queries_dedup  # noqa: F401
    import dataflow_mm_ray.queries_ops  # noqa: F401
    import dataflow_mm_ray.queries_nli  # noqa: F401
    import dataflow_mm_ray.queries_vqa  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    rest = [n for n in _REGISTRY if n not in ordered]
    # below the fold: SQL-oracled entries before rows-only ones, each
    # group in registration order
    for n in rest:
        if _REGISTRY[n].sql is not None:
            ordered[n] = _REGISTRY[n]
    for n in rest:
        if _REGISTRY[n].sql is None:
            ordered[n] = _REGISTRY[n]
    return ordered
