"""Operator registry — the engine's plugin surface.

Reference: ``@OPERATOR_REGISTRY.register()`` on ``OperatorABC``
subclasses with lazy lookup and fuzzy matching
(``dataflow/utils/registry.py:88-105, 304-365``;
``dataflow/core/Operator.py:4-31``).

Engine equivalent: an operator is a typed spec — a callable that takes
a Dataset (or sf_dir for sources) plus config and returns a Dataset —
registered by name. ``get_operator`` resolves exact then
case-insensitive then substring matches, like the reference's fuzzy
lookup.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class OpSpec:
    name: str
    fn: Callable[..., Any]
    description: str
    kind: str  # "map" | "filter" | "window" | "join" | "dedup" | "source" | "generator"
    input_cols: tuple[str, ...] = ()
    output_cols: tuple[str, ...] = ()
    stateful: bool = False  # True -> runs as an actor pool


_OPERATORS: dict[str, OpSpec] = {}


def register_op(name: str, description: str, kind: str, input_cols=(), output_cols=(),
                stateful: bool = False):
    def deco(fn):
        _OPERATORS[name] = OpSpec(
            name, fn, description, kind, tuple(input_cols), tuple(output_cols), stateful
        )
        return fn

    return deco


def get_operator(name: str) -> OpSpec:
    """Exact -> case-insensitive -> unique-substring resolution
    (mirrors registry.py:304-365 fuzzy matching)."""
    _ensure_loaded()
    if name in _OPERATORS:
        return _OPERATORS[name]
    lowered = {k.lower(): v for k, v in _OPERATORS.items()}
    if name.lower() in lowered:
        return lowered[name.lower()]
    matches = [v for k, v in _OPERATORS.items() if name.lower() in k.lower()]
    if len(matches) == 1:
        return matches[0]
    raise KeyError(
        f"operator {name!r} not found; "
        + (f"ambiguous between {[m.name for m in matches]}" if matches else f"known: {sorted(_OPERATORS)}")
    )


def list_operators() -> dict[str, OpSpec]:
    _ensure_loaded()
    return dict(_OPERATORS)


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    from dataflow_mm_ray.serving import prompted_qa, templated_qa
    from dataflow_mm_ray.stages import filters, join, stats, windows
    from dataflow_mm_ray.stages.chunks import chunk_rows
    from dataflow_mm_ray.stages.clip_eval import clip_family_eval
    from dataflow_mm_ray.stages.conversations import conversation_to_message_stage
    from dataflow_mm_ray.stages.dedup import add_dedup_key, dedup_first_wins
    from dataflow_mm_ray.stages.diversity import diversity_filter, diversity_filter_full
    from dataflow_mm_ray.stages.multimodal import audio_vad_pipeline, image_pipeline
    from dataflow_mm_ray.stages.normalize import text_normalize
    from dataflow_mm_ray.stages.nsfw import add_image_key, rule_base_full
    from dataflow_mm_ray.stages.percentile import add_global_rank
    from dataflow_mm_ray.stages.rewards import reward_eval
    from dataflow_mm_ray.stages.text_analysis import rule_filter_flags, rule_filter_kept, text_stats
    from dataflow_mm_ray.stages.udf import functional_refine, mcts_tree_refine

    def add_image_key_stage(ds):
        return ds.map_batches(add_image_key, batch_format="pandas")

    entries = [
        ("rule_base_filter", rule_filter_kept, "15-rule heuristic text filter (destructive)", "filter", ("text",), ("text",), False),
        ("rule_base_filter_flags", rule_filter_flags, "15-rule filter, per-rule flags", "map", ("text",), ("keep",), False),
        ("score_filter", filters.score_filter, "inclusive score-range select mark", "filter", (), ("select",), False),
        ("text_stats", text_stats, "normalize/tokens/quality/lang/fingerprint", "map", ("text",), (), False),
        ("tumbling_window", windows.tumbling_window_agg, "per-conv tumbling window agg", "window", ("conv_id", "ts"), (), False),
        ("sliding_window", windows.sliding_window_agg, "per-conv sliding window agg", "window", ("conv_id", "ts"), (), False),
        ("session_window", windows.session_window_agg, "gap-based session windows", "window", ("conv_id", "ts"), (), False),
        ("tool_response_join", join.tool_response_join, "invocation->response stateful join", "join", ("conv_id", "turn_idx", "role", "tool"), (), False),
        ("dedup_first_wins", dedup_first_wins, "exact first-wins dedup by key", "dedup", (), (), False),
        ("conversation_to_message", conversation_to_message_stage, "explode->nested message format", "map", ("conv_id", "turn_idx", "role", "text"), ("message",), False),
        ("chunk_rows", chunk_rows, "split/merge segment chunking", "map", ("conv_id",), ("sequence_num",), False),
        ("functional_refine", functional_refine, "generic column-mapped row UDF", "map", (), (), False),
        ("mcts_tree_refine", mcts_tree_refine, "MCTS tree -> reasoning chains", "map", ("tree",), ("chains",), False),
        ("reward_eval", reward_eval, "answer-reward evaluation (5 branches)", "map", ("model_output", "solution", "problem_type"), ("reward",), False),
        ("prompted_qa", prompted_qa, "prompt -> answer via serving pool", "generator", ("prompt",), ("answer",), True),
        ("templated_qa", templated_qa, "template fill -> answer via serving pool", "generator", (), ("answer",), True),
        ("image_pipeline", image_pipeline, "binary image decode + aesthetic stats", "map", ("image",), ("quality",), True),
        ("audio_vad", audio_vad_pipeline, "VAD speech segments (Silero params)", "map", ("audio",), ("n_segments",), True),
        ("apply_select", filters.apply_select, "drop rows whose select flag is false (destructive half)", "filter", ("select",), (), False),
        ("add_dedup_key", add_dedup_key, "content fingerprint column for exact dedup", "map", ("text",), ("dedup_key",), False),
        ("text_normalize", text_normalize, "TextNormalizer (basic/en/zh whisper+cn_tn modes)", "map", ("text",), ("norm_text",), False),
        ("diversity_filter", diversity_filter, "ImageDiversityFilter text gate (TF-cosine first-wins)", "dedup", ("doc_id", "text"), (), False),
        ("diversity_filter_full", diversity_filter_full, "ImageDiversityFilter both gates (TF-cosine + phash)", "dedup", ("doc_id", "text"), (), False),
        ("clip_family_eval", clip_family_eval, "CLIP/LongCLIP/VQAScore evaluator score column", "map", (), (), True),
        ("add_global_rank", add_global_rank, "global ordinal rank column (distributed, no driver collect)", "map", (), (), False),
        ("add_image_key", add_image_key_stage, "synthetic per-row image key (source/doc_id.img)", "map", ("doc_id", "source"), ("image_key",), False),
        ("rule_base_full", rule_base_full, "COMPLETE RuleBaseFilter: text rules + image basics + NSFW", "filter", ("doc_id", "text", "image_key"), (), True),
    ]
    # similarity family: the SCALE twins own the primary names (what a
    # user reaches for); the all-pairs/full-matrix parity ops — kept
    # solely because their brute-force semantics anchor the SQL
    # oracles — are registered under *_parity (r4-verdict task 8)
    from dataflow_mm_ray.stages.neardup import embedding_srp_neardup
    from dataflow_mm_ray.stages.similarity import (
        embedding_neardup, ivf_knn_percentile, ivf_topk,
        knn_percentile_filter)

    entries += [
        ("knn_percentile", ivf_knn_percentile, "KNN-sum percentile cut — IVF bucketed scale path (== brute force at full probe)", "filter", ("vec_id", "embedding"), (), False),
        ("knn_percentile_parity", knn_percentile_filter, "KNN-sum percentile cut — all-pairs parity op (oracle anchor)", "filter", ("vec_id", "embedding"), (), False),
        ("embedding_neardup", embedding_srp_neardup, "embedding near-dup — SRP-LSH banded scale path", "dedup", ("vec_id", "embedding"), ("keep",), False),
        ("embedding_neardup_parity", embedding_neardup, "embedding near-dup — all-pairs cosine parity op (oracle anchor)", "dedup", ("vec_id", "embedding"), ("keep",), False),
        ("ann_topk", ivf_topk, "cosine top-k ANN — IVF probed scan", "map", ("vec_id", "embedding"), (), False),
    ]
    # the reference's composed video pipeline
    # (video_clip_and_filter_pipeline.py:126-216) as runner steps —
    # stages/videochain.py; chained end-to-end by
    # jobs/specs/video_chain.json with the video_chain_pipeline oracle
    from dataflow_mm_ray.stages import videochain as _vchain

    entries += [
        ("events_to_transcripts", _vchain.events_to_transcripts, "events rows -> canonical transcript turns", "map", ("user_id", "ts"), ("conv_id", "turn_idx"), False),
        ("video_scene_chunks", _vchain.video_scene_chunks, "VideoSceneFilter: session scenes trimmed/split", "window", ("conv_id", "ts"), ("chunk_start_us",), False),
        ("video_clip_metadata", _vchain.video_clip_metadata, "VideoClipFilter: probe + clip construction + frame/res gates", "map", ("conv_id",), ("clip_id", "passed"), False),
        ("video_frame_plan", _vchain.video_frame_plan, "VideoFrameFilter: per-clip frame export plan", "map", ("clip_id", "num_frames"), ("n_export_frames",), False),
        ("video_aesthetic_score", _vchain.video_aesthetic_score, "VideoAestheticFilter: clip score + gate", "filter", ("clip_id",), ("aesthetic_score",), False),
        ("video_luminance_score", _vchain.video_luminance_score, "VideoLuminanceFilter: clip luminance + range gate", "filter", ("clip_id",), ("luminance_mean",), False),
        ("video_ocr_score", _vchain.video_ocr_score, "VideoOCRFilter: clip OCR area + band gate", "filter", ("clip_id",), ("ocr_score",), False),
        ("video_cut_plan", _vchain.video_cut_plan, "VideoClipGenerator: cut plan for passing clips", "map", ("clip_id", "passed"), ("video_path",), False),
    ]
    # the reference's composed audio VAD pipeline
    # (audio_voice_activity_detection_pipeline.py:18-50) as runner
    # steps — stages/audiochain.py glue around the existing audio_vad +
    # chunk_rows ops; chained by jobs/specs/audio_chain.json
    from dataflow_mm_ray.stages import audiochain as _achain

    entries += [
        ("attach_stub_audio", _achain.attach_stub_audio, "id rows -> deterministic audio-bytes fixture rows", "map", ("doc_id",), ("audio",), False),
        ("vad_segments_to_rows", _achain.vad_segments_to_rows, "VAD timestamps handoff: segment lists -> (conv_id, start_us, end_us) rows", "map", ("seg_starts", "seg_ends"), ("start_us", "end_us"), False),
    ]
    # near-dup family as chainable ds -> ds steps (each already takes a
    # ds= input; the sf_dir form stays for the standalone queries)
    from dataflow_mm_ray.stages.neardup import (
        minhash_lsh_dedup, ngram_jaccard_dedup, simhash_dedup)

    def minhash_dedup_op(ds, threshold=0.7, id_col="doc_id",
                         text_col="text", num_partitions=16):
        return minhash_lsh_dedup(None, threshold, id_col=id_col,
                                 text_col=text_col, ds=ds,
                                 num_partitions=num_partitions)

    def ngram_dedup_op(ds, threshold=0.5, id_col="doc_id", text_col="text",
                       num_partitions=16, max_posting=None):
        return ngram_jaccard_dedup(None, threshold, id_col=id_col,
                                   text_col=text_col, ds=ds,
                                   num_partitions=num_partitions,
                                   max_posting=max_posting)

    def simhash_dedup_op(ds, max_hamming=3, id_col="doc_id",
                         text_col="text", num_partitions=16):
        return simhash_dedup(None, max_hamming, id_col=id_col,
                             text_col=text_col, ds=ds,
                             num_partitions=num_partitions)

    entries += [
        ("minhash_lsh_dedup", minhash_dedup_op, "MinHash-LSH near-dup: (doc_id, keep, n_dup_partners)", "dedup", ("doc_id", "text"), ("keep",), False),
        ("ngram_jaccard_dedup", ngram_dedup_op, "exact n-gram Jaccard near-dup via inverted index: (doc_id, keep)", "dedup", ("doc_id", "text"), ("keep",), False),
        ("simhash_dedup", simhash_dedup_op, "SimHash banded near-dup: (doc_id, simhash, keep)", "dedup", ("doc_id", "text"), ("keep",), False),
    ]
    for name, fn, desc, kind, inp, out, stateful in entries:
        _OPERATORS[name] = OpSpec(name, fn, desc, kind, tuple(inp), tuple(out), stateful)
    # only mark loaded on success: a transient import failure above must
    # surface again on the next call, not leave a silently empty registry
    _LOADED = True
