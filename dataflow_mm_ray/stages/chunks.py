"""Segment chunking — the reference's ``TimestampChunkRowGenerator``
(``dataflow/operators/core_audio/generaterow/
audio_timestamp_chunk_row_generator.py:181-369``) recast onto
per-conversation ordered segments:

- ``split`` mode: one output row per valid segment, ``sequence_num``
  counting 1..n per source (invalid start>=end segments skipped);
- ``merge`` mode (lines 297-346): greedy in-order accumulation —
  when adding the next segment would exceed ``max_duration`` AND the
  current chunk is non-empty, flush the chunk and start a new one
  (``sequence_num`` restarts per source key); the final partial chunk
  is always flushed. Duration is the SUM of segment durations, not the
  span.

This is the bounded-session primitive of the streaming engine
(SURVEY.md §2.9) in batch form.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

_OUT_COLS = ["conv_id", "sequence_num", "n_segments", "total_duration_us",
             "chunk_start_us", "chunk_end_us"]


def merge_chunks_kernel(part: pd.DataFrame, max_duration_us: int) -> pd.DataFrame:
    """part: (conv_id, start_us, end_us) sorted by (conv_id, start_us)."""
    rows = []
    conv_arr = part["conv_id"].to_numpy()
    s_arr = part["start_us"].to_numpy().astype(np.int64)
    e_arr = part["end_us"].to_numpy().astype(np.int64)
    i = 0
    n = len(part)
    while i < n:
        conv = conv_arr[i]
        seq = 1
        cur_dur = 0
        cur_n = 0
        cur_start = None
        cur_end = None
        while i < n and conv_arr[i] == conv:
            s, e = s_arr[i], e_arr[i]
            i += 1
            if s >= e:  # invalid segment skipped (reference line 308)
                continue
            d = e - s
            if cur_dur + d > max_duration_us and cur_n > 0:
                rows.append((conv, seq, cur_n, cur_dur, cur_start, cur_end))
                seq += 1
                cur_dur, cur_n, cur_start, cur_end = 0, 0, None, None
            cur_n += 1
            cur_dur += d
            cur_start = s if cur_start is None else cur_start
            cur_end = e
        if cur_n > 0:
            rows.append((conv, seq, cur_n, cur_dur, cur_start, cur_end))
    out = pd.DataFrame(rows, columns=_OUT_COLS)
    out["sequence_num"] = out["sequence_num"].astype(np.int32)
    return out


def split_chunks_kernel(part: pd.DataFrame) -> pd.DataFrame:
    valid = part[part["start_us"] < part["end_us"]]
    seq = valid.groupby("conv_id", sort=False).cumcount().to_numpy() + 1
    out = pd.DataFrame(
        {
            "conv_id": valid["conv_id"].to_numpy(),
            "sequence_num": seq.astype(np.int32),
            "n_segments": np.int64(1),
            "total_duration_us": (valid["end_us"] - valid["start_us"]).to_numpy().astype(np.int64),
            "chunk_start_us": valid["start_us"].to_numpy().astype(np.int64),
            "chunk_end_us": valid["end_us"].to_numpy().astype(np.int64),
        }
    )
    return out


def chunk_rows(segments, mode: str = "merge", max_duration_s: float = 3600.0,
               num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """segments: Dataset with (conv_id, start_us, end_us)."""
    if mode == "merge":
        max_us = int(max_duration_s * 1_000_000)
        kernel = lambda p: merge_chunks_kernel(p, max_us)  # noqa: E731
    elif mode == "split":
        kernel = split_chunks_kernel
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return partition_map(
        segments, "conv_id", kernel, num_partitions=num_partitions,
        sort_by=("conv_id", "start_us"),
    )
