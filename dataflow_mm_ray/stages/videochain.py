"""The reference's composed video pipeline as declarative-runner steps.

``VideoFilteredClipGenerator`` chains eight operators over one table
(``dataflow/statics/pipelines/gpu_pipelines/
video_clip_and_filter_pipeline.py:126-216``): info -> scene -> clip ->
frames -> aesthetic -> luminance -> OCR -> cut, each step persisting
through the storage cache. Here each step is a ds -> ds operator
resolved through the registry and run by ``pipelines/runner.py`` — one
lazy Ray Data chain by default, spec-hashed parquet IR with resume
when a cache dir is given (the engine twin of the reference's step
files).

The decoder-bound probes reuse the engine's established deterministic
stub universe — the SAME conventions as the standalone
``scene_segments`` / ``video_clip_filter`` / scorer-trio queries
(queries_cep.py), so the composed chain shares their SQL fragments and
gets a full DuckDB oracle (``video_chain_pipeline``):

- video = conversation; scenes = session windows trimmed/split
  (stages/scenes.py);
- probe metadata per video: width 320+(uid%10)*160,
  height 240+(uid%7)*120, fps in {24,30,60} by uid%3;
- frame scores: stages/videoscore.py stub kernels (aesthetic mean,
  OCR max, luminance with the (uid*31+idx*17)%256 stub).

Every op appends columns (or filters) and AND-folds a running
``passed`` flag — the reference mutates ``clip['filtered']`` in place
the same way (video_luminance_filter.py:32-99 et al.).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS
from dataflow_mm_ray.stages.videoscore import (
    AES_MIN,
    OCR_MAX,
    OCR_MIN,
    aesthetic_gate,
    clip_aesthetic_score,
    clip_ocr_score,
    ocr_gate,
)

US = 1_000_000
LUM_MIN, LUM_MAX = 20.0, 235.0
_LUM_MISSING_MOD = 19


def events_to_transcripts(ds, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """events rows -> canonical transcript turns (the ds-level form of
    sources.transcripts.transcripts_from_events, for runner chains
    whose source is the raw events table)."""
    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.sources.transcripts import _events_to_turns

    return partition_map(ds, "user_id", _events_to_turns,
                         num_partitions=num_partitions)


def video_scene_chunks(ds, gap_s: int = 1800, start_remove_s: float = 60.0,
                       end_remove_s: float = 60.0, min_s: float = 120.0,
                       max_s: float = 1800.0,
                       num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """VideoSceneFilter step: transcript turns -> trimmed/split scene
    chunks (one conv-keyed exchange; blocks hold whole conversations,
    which the downstream clip-index cumcounts rely on)."""
    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.stages.scenes import trim_split_kernel
    from dataflow_mm_ray.stages.windows import session_window_kernel

    sr, er = int(start_remove_s * US), int(end_remove_s * US)
    mn, mx = int(min_s * US), int(max_s * US)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        sess = session_window_kernel(part, gap_s)
        seg = pd.DataFrame(
            {
                "conv_id": sess["conv_id"],
                "session_id": sess["session_id"],
                "start_us": sess["session_start"].astype("datetime64[us]").astype(np.int64),
                "end_us": sess["session_end"].astype("datetime64[us]").astype(np.int64),
            }
        )
        return trim_split_kernel(seg, sr, er, mn, mx)

    return partition_map(ds, "conv_id", kernel, num_partitions=num_partitions,
                         sort_by=["conv_id", "turn_idx"])


def _uid(conv: pd.Series) -> np.ndarray:
    return conv.str[5:].astype(np.int64).to_numpy()


def video_clip_metadata(ds, frames_min: int | None = 100,
                        frames_max: int | None = None,
                        fps_min: float | None = None,
                        fps_max: float | None = None,
                        resolution_max: int | None = 1920 * 1080,
                        num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """VideoClipFilter step: scene chunks + per-video probe -> filtered
    clip metadata with a running ``passed=True`` flag. Runs as its own
    conv-keyed exchange: the clip-index cumcount must see every chunk
    of a conv, and a runner CACHE round-trip (per-step parquet IR)
    does not preserve the upstream whole-conv-per-block layout that a
    stateless batch_size=None kernel would need."""
    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.stages.scenes import clip_metadata_kernel

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        # no empty early-out: an empty partition must still emit the
        # TYPED empty schema (partition_map hands a schema-carrying
        # empty frame; the vectorized path below is empty-safe) —
        # a column-less/object empty frame would poison the concat'd
        # result dtypes whenever num_partitions > distinct convs
        b = b.reset_index(drop=True)
        uid = _uid(pd.Series(b["conv_id"]))
        width = (320 + (uid % 10) * 160).astype(np.int64)
        height = (240 + (uid % 7) * 120).astype(np.int64)
        fps = np.choose(uid % 3, [24, 30, 60]).astype(np.float64)
        out = clip_metadata_kernel(
            b, width, height, fps, frames_min, frames_max, fps_min, fps_max,
            resolution_max,
        )
        out["passed"] = np.ones(len(out), dtype=bool)
        return out

    return partition_map(ds, "conv_id", kernel, num_partitions=num_partitions,
                         sort_by=["conv_id", "session_id", "chunk_id"])


def _clip_key(b: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(uid, clip_idx) from the clip_id column ('conv-NNNNNN_idx')."""
    parts = pd.Series(b["clip_id"]).str.rsplit("_", n=1)
    uid = parts.str[0].str[5:].astype(np.int64).to_numpy()
    idx = parts.str[1].astype(np.int64).to_numpy()
    return uid, idx


def video_frame_plan(ds, load_num: int = 3):
    """VideoFrameFilter step: per-clip export plan — the frames each
    scorer samples (reference load_num=3, evenly spaced)."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        nf = b["num_frames"].to_numpy(dtype=np.int64)
        b["n_export_frames"] = np.minimum(np.int64(load_num), nf)
        return b

    return ds.map_batches(kernel, batch_format="pandas")


def video_aesthetic_score(ds, aes_min: float = AES_MIN):
    """VideoAestheticFilter step: stub CLIP+MLP clip score (mean of
    LOAD_NUM frame scores) + gate folded into ``passed``."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        uid, idx = _clip_key(b)
        score = clip_aesthetic_score(uid, idx)
        b["aesthetic_score"] = score
        b["passed"] = aesthetic_gate(b["passed"].to_numpy(dtype=bool), score,
                                     aes_min)
        return b

    return ds.map_batches(kernel, batch_format="pandas")


def video_luminance_score(ds, lum_min: float = LUM_MIN,
                          lum_max: float = LUM_MAX):
    """VideoLuminanceFilter step: per-clip luminance mean stub
    ((uid*31 + idx*17) % 256, missing every 19th) + range gate."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        uid, idx = _clip_key(b)
        missing = (uid + idx) % _LUM_MISSING_MOD == 0
        lum = np.where(missing, np.nan,
                       ((uid * 31 + idx * 17) % 256).astype(np.float64))
        b["luminance_mean"] = lum
        ok = ~missing & (lum >= lum_min) & (lum <= lum_max)
        b["passed"] = b["passed"].to_numpy(dtype=bool) & ok
        return b

    return ds.map_batches(kernel, batch_format="pandas")


def video_ocr_score(ds, ocr_min: float = OCR_MIN, ocr_max: float = OCR_MAX):
    """VideoOCRFilter step: stub per-frame text-area ratio, clip score
    = max over frames, band gate."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        uid, idx = _clip_key(b)
        score = clip_ocr_score(uid, idx)
        b["ocr_score"] = score
        b["passed"] = ocr_gate(b["passed"].to_numpy(dtype=bool), score,
                               ocr_min, ocr_max)
        return b

    return ds.map_batches(kernel, batch_format="pandas")


def video_cut_plan(ds, shorter_size: int = 480):
    """VideoClipGenerator step: cut plan for every clip that passed all
    gates — save path, bounds, and the no-upscale rule (scale only when
    min(height, width) > shorter_size; video_clip_generator.py:57-59)."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        # no empty special-case: the typed vectorized path below emits
        # the correct dtypes on zero rows too — an all-object empty
        # frame here would flip every concat'd column to object
        keep = b.loc[b["passed"].to_numpy(dtype=bool)].reset_index(drop=True)
        h = keep["height"].to_numpy(dtype=np.int64)
        w = keep["width"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "conv_id": keep["conv_id"].to_numpy(),
                "clip_id": keep["clip_id"].to_numpy(),
                "timestamp_start": keep["timestamp_start"].to_numpy(dtype=np.int64),
                "timestamp_end": keep["timestamp_end"].to_numpy(dtype=np.int64),
                "aesthetic_score": keep["aesthetic_score"].to_numpy(dtype=np.float64),
                "luminance_mean": keep["luminance_mean"].to_numpy(dtype=np.float64),
                "ocr_score": keep["ocr_score"].to_numpy(dtype=np.float64),
                "scaled": np.minimum(h, w) > shorter_size,
                "video_path": ("clips/" + pd.Series(keep["clip_id"]).astype(str)
                               + ".mp4").to_numpy(dtype=object),
            }
        )

    return ds.map_batches(kernel, batch_format="pandas")
