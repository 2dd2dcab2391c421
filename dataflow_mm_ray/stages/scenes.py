"""Video scene trim/split segment math (VideoSceneFilter).

Reference: ``dataflow/operators/core_vision/filter/video_scene_filter.py
:155-203`` (``_trim_and_split_scenes``): head/tail trimming then
splitting long scenes into ``[min_seconds, max_seconds]`` chunks.
PySceneDetect (the raw scene detector) is codec-bound and absent; the
scene *list* here comes from the engine's session windows (a
conversation's sessions = its scene intervals), and the trim/split
arithmetic is reproduced exactly, vectorized:

- drop scenes with ``duration < start_remove + end_remove`` or where
  trimming empties them (``ne <= ns``);
- trimmed duration ``nd <= max``: keep iff ``nd >= min`` (one chunk);
- ``nd > max``: emit ``floor(nd / max)`` full ``max``-length chunks
  from ``ns`` plus the remainder iff ``remainder >= min`` (note the
  reference's boundary rule: when ``nd`` is an exact multiple and
  ``min == 0`` the zero-length remainder IS emitted — replicated).

All times are integer microseconds (exact in float64 and BIGINT), so
the vectorized chunk starts ``ns + i*max`` equal the reference loop's
accumulated ``cur += max`` bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

US = 1_000_000


def trim_split_kernel(seg: pd.DataFrame, start_remove_us: int, end_remove_us: int,
                      min_us: int, max_us: int) -> pd.DataFrame:
    """seg: (conv_id, session_id, start_us, end_us) -> chunk rows
    (conv_id, session_id, chunk_id, chunk_start_us, chunk_end_us)."""
    sr = max(0, int(start_remove_us))
    er = max(0, int(end_remove_us))
    total_remove = sr + er
    min_us = max(0, int(min_us))
    max_us = max(min_us, int(max_us))

    s = seg["start_us"].to_numpy(dtype=np.int64)
    e = seg["end_us"].to_numpy(dtype=np.int64)
    dur = e - s
    ns = s + sr
    ne = e - er
    nd = ne - ns
    valid = (e > s) & (dur >= total_remove) & (ne > ns)

    short = valid & (nd <= max_us)
    keep_short = short & (nd >= min_us)
    long = valid & (nd > max_us)

    n_full = np.where(long, nd // max_us, 0).astype(np.int64)
    rem = ne - (ns + n_full * max_us)
    keep_rem = long & (rem >= min_us)
    n_chunks = np.where(keep_short, 1, 0) + n_full + keep_rem.astype(np.int64)

    row_idx = np.repeat(np.arange(len(seg)), n_chunks)
    chunk_id = np.concatenate(
        [np.arange(k, dtype=np.int64) for k in n_chunks]
    ) if len(seg) else np.empty(0, dtype=np.int64)
    ns_r = ns[row_idx]
    ne_r = ne[row_idx]
    nf_r = n_full[row_idx]
    short_r = keep_short[row_idx]
    cs = ns_r + chunk_id * max_us
    ce = np.where(short_r, ne_r, np.where(chunk_id < nf_r, cs + max_us, ne_r))
    return pd.DataFrame(
        {
            "conv_id": seg["conv_id"].to_numpy()[row_idx],
            "session_id": seg["session_id"].to_numpy()[row_idx].astype(np.int32),
            "chunk_id": chunk_id.astype(np.int32),
            "chunk_start_us": cs,
            "chunk_end_us": ce,
        }
    )


def clip_metadata_kernel(chunks: pd.DataFrame, width: np.ndarray, height: np.ndarray,
                         fps: np.ndarray, frames_min: int | None, frames_max: int | None,
                         fps_min: float | None, fps_max: float | None,
                         resolution_max: int | None) -> pd.DataFrame:
    """VideoClipFilter clip construction + filtering
    (video_clip_filter.py:80-170), vectorized. ``chunks`` are scene
    rows (conv_id, session_id, chunk_id, chunk_start_us, chunk_end_us)
    sorted per conv; ``width/height/fps`` are per-row probe metadata.
    Timecodes convert to INTEGER seconds (reference ``_to_secs``), then
    ``frame = floor(sec * fps)`` (``_to_frame_idx``); clip ids number
    ALL scenes of a video, including filtered-out ones."""
    s_sec = chunks["chunk_start_us"].to_numpy(dtype=np.int64) // US
    e_sec = chunks["chunk_end_us"].to_numpy(dtype=np.int64) // US
    sf = np.floor(s_sec * fps).astype(np.int64)
    ef = np.floor(e_sec * fps).astype(np.int64)
    num_frames = ef - sf
    # clip index = position among the conv's scenes (pre-filter)
    idx = (
        chunks.groupby("conv_id", sort=False).cumcount().to_numpy().astype(np.int64)
    )
    keep = np.ones(len(chunks), dtype=bool)
    if frames_min is not None:
        keep &= num_frames >= frames_min
    if frames_max is not None:
        keep &= num_frames <= frames_max
    if fps_min is not None:
        keep &= fps >= fps_min
    if fps_max is not None:
        keep &= fps <= fps_max
    if resolution_max is not None:
        keep &= (width * height) <= resolution_max
    conv = chunks["conv_id"].to_numpy()
    out = pd.DataFrame(
        {
            "conv_id": conv[keep],
            "clip_id": pd.Series(conv[keep]).astype(str) + "_" + pd.Series(idx[keep]).astype(str),
            "num_frames": num_frames[keep],
            "height": height[keep],
            "width": width[keep],
            "fps": fps[keep].astype(np.int64),
            "timestamp_start": s_sec[keep],
            "timestamp_end": e_sec[keep],
            "frame_start": sf[keep],
            "frame_end": ef[keep],
        }
    )
    return out


def video_clip_filter(sf_dir: str, gap_s: int = 1800,
                      start_remove_s: float = 60.0, end_remove_s: float = 60.0,
                      min_s: float = 120.0, max_s: float = 1800.0,
                      frames_min: int | None = 100, frames_max: int | None = None,
                      fps_min: float | None = None, fps_max: float | None = None,
                      resolution_max: int | None = 1920 * 1080):
    """Scene chunks + stub per-video probe -> filtered clip metadata
    rows, all inside the one fused conv-keyed shuffle. The probe
    (cv2-bound in the reference) derives deterministic (width, height,
    fps) from the conversation's numeric id."""
    from dataflow_mm_ray.sources.transcripts import transcripts_partitioned
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
        chunks = trim_split_kernel(seg, sr, er, mn, mx)
        uid = pd.Series(chunks["conv_id"]).str[5:].astype(np.int64).to_numpy()
        width = (320 + (uid % 10) * 160).astype(np.int64)
        height = (240 + (uid % 7) * 120).astype(np.int64)
        fps = np.choose(uid % 3, [24, 30, 60]).astype(np.float64)
        return clip_metadata_kernel(
            chunks, width, height, fps, frames_min, frames_max, fps_min, fps_max,
            resolution_max,
        )

    return transcripts_partitioned(sf_dir, kernel)


def extract_video_name(clip_id: str) -> str:
    """video_merged_caption_generator.py:24-37: strip a trailing
    ``_<int>`` clip index; anything else is already a video name."""
    if "_" not in clip_id:
        return clip_id
    parts = clip_id.split("_")
    try:
        int(parts[-1])
        return "_".join(parts[:-1])
    except ValueError:
        return clip_id


def merge_clip_captions(clips: pd.DataFrame, caption_col: str = "caption") -> pd.DataFrame:
    """``merge_video_captions`` (video_merged_caption_generator.py:40-124)
    vectorized: group clips by extracted video name, order by start
    time (stable — insertion order breaks ties like the reference's
    stable sort), first-char-lowercase each caption, and emit the
    "From S to E, caption" text block per video. Rows with missing
    timestamps or empty captions are skipped."""
    ok = clips["timestamp_start"].notna() & clips["timestamp_end"].notna()
    cap = clips[caption_col].astype(str).str.replace("\n", " ", regex=False).str.strip()
    ok &= cap.str.len() > 0
    c = clips.loc[ok].copy(deep=False)
    cap = cap[ok]
    c["__video"] = [extract_video_name(str(i)) for i in c["clip_id"]]
    c["__line"] = (
        "From " + c["timestamp_start"].astype(np.int64).astype(str)
        + " to " + c["timestamp_end"].astype(np.int64).astype(str)
        + ", " + (cap.str[:1].str.lower() + cap.str[1:])
    )
    c = c.sort_values(["__video", "timestamp_start"], kind="mergesort")
    g = c.groupby("__video", sort=False)
    return pd.DataFrame(
        {
            "id": list(g.groups),
            "captions": g["__line"].agg("\n".join).to_numpy(),
            "num_clips": g.size().to_numpy().astype(np.int64),
        }
    )


def merged_clip_captions(sf_dir: str, gap_s: int = 1800,
                         start_remove_s: float = 60.0, end_remove_s: float = 60.0,
                         min_s: float = 120.0, max_s: float = 1800.0,
                         frames_min: int | None = 100,
                         resolution_max: int | None = 1920 * 1080):
    """Clips -> stub per-clip caption -> per-video merged caption text
    (VideoMergedCaptionGenerator), all in the fused conv-keyed shuffle
    (a conversation's clips are co-located by construction)."""
    base = video_clip_filter(
        sf_dir, gap_s=gap_s, start_remove_s=start_remove_s, end_remove_s=end_remove_s,
        min_s=min_s, max_s=max_s, frames_min=frames_min, resolution_max=resolution_max,
    )

    def caption_and_merge(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"id": pd.Series([], dtype=object), "captions": pd.Series([], dtype=object),
                 "num_clips": pd.Series([], dtype=np.int64)}
            )
        b = b.copy(deep=False)
        # stub captioner (VLM-bound): deterministic per clip
        idx = b["clip_id"].astype(str).str.rsplit("_", n=1).str[1]
        b["caption"] = "Clip " + idx + " shows tool use"
        return merge_clip_captions(b)

    # batch_size=None: batches == blocks == whole conversations
    return base.map_batches(caption_and_merge, batch_format="pandas", batch_size=None)


def scene_segments(sf_dir: str, gap_s: int = 1800,
                   start_remove_s: float = 60.0, end_remove_s: float = 60.0,
                   min_s: float = 120.0, max_s: float = 1800.0):
    """Sessions-as-scenes -> trim/split chunks, one fused conv-keyed
    shuffle then a stateless vectorized flat map."""
    from dataflow_mm_ray.sources.transcripts import transcripts_partitioned
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

    return transcripts_partitioned(sf_dir, kernel)
