"""Event-time windows over the transcript stream.

Tumbling / sliding window assignment is a pure function of ``ts`` and
runs vectorized in ``map_batches``; the per-(conv, window) aggregate is
two-phase: partial sums per batch (combiner — a hot conversation
contributes one row per window per batch no matter how many turns it
has), then ONE hash shuffle on ``conv_id`` (partition_map) with a
vectorized pandas merge per partition. Grouping the merge by
``conv_id`` keeps every key's partials co-located, so the merged sums
are exact.

Session windows need every turn of a conversation co-located and
ts-ordered — one hash-partitioned shuffle, then a vectorized gap-scan.
The gap-close rule mirrors the reference's Silero-VAD
``min_silence_duration_s`` segment closing
(``dataflow/operators/core_audio/generate/
audio_silero_voice_activity_detection_timestamps_generator.py:35-68``):
a session closes when the gap to the next turn exceeds ``gap_s``.

Each construct also exposes a per-partition *kernel* so conv-keyed
pipelines can fuse derivation + windowing into a single shuffle
(``sources.transcripts.transcripts_partitioned``).

All duration outputs are integer microseconds (``*_us``) — exact in
both Arrow and DuckDB, immune to float-rounding drift in the oracle
comparison.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.groupsum import group_sum, group_sum_df
from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

US = 1_000_000

_WINDOW_COLS = ["conv_id", "window_start", "n_turns", "n_user_turns", "n_tool_calls", "sum_chars"]


def _ts_us(ts: pd.Series) -> np.ndarray:
    """timestamp[us] series -> int64 microseconds since epoch."""
    return ts.to_numpy(dtype="datetime64[us]").astype(np.int64)


def _text_chars(batch: pd.DataFrame) -> np.ndarray:
    """Per-turn text length: the precomputed ``text_len`` column when
    the fast fused derivation provided one, else len(text)."""
    if "text_len" in batch.columns:
        return batch["text_len"].to_numpy(dtype=np.int64)
    return batch["text"].str.len().to_numpy(dtype=np.int64)


def _partial_window_counts(batch: pd.DataFrame, width_s: int) -> pd.DataFrame:
    """Per-batch combiner: one partial row per (conv_id, window_start)."""
    us = _ts_us(batch["ts"])
    width_us = width_s * US
    n = len(batch)
    return group_sum(
        {
            "conv_id": batch["conv_id"].to_numpy(),
            "window_start_us": (us // width_us) * width_us,
        },
        {
            "n_turns": np.ones(n, dtype=np.int64),
            "n_user_turns": (batch["role"].to_numpy() == "user").astype(np.int64),
            "n_tool_calls": (
                (batch["role"].to_numpy() == "assistant") & batch["tool"].notna().to_numpy()
            ).astype(np.int64),
            "sum_chars": _text_chars(batch),
        },
    )


def _merge_window_partials(part: pd.DataFrame) -> pd.DataFrame:
    agg = group_sum_df(
        part,
        ["conv_id", "window_start_us"],
        ["n_turns", "n_user_turns", "n_tool_calls", "sum_chars"],
    )
    agg["window_start"] = agg.pop("window_start_us").to_numpy().astype("datetime64[us]")
    return agg[_WINDOW_COLS]


def tumbling_window_kernel(turns: pd.DataFrame, width_s: int) -> pd.DataFrame:
    """Exact per-partition tumbling aggregate (conv co-located)."""
    return _merge_window_partials(_partial_window_counts(turns, width_s))


def tumbling_window_agg(
    transcripts, width_s: int = 3600, num_partitions: int = DEFAULT_NUM_PARTITIONS
):
    """Per (conv_id, tumbling window): turn counts and char volume.

    Returns: conv_id, window_start (timestamp[us]), n_turns,
    n_user_turns, n_tool_calls, sum_chars.
    """
    partials = transcripts.map_batches(
        lambda b: _partial_window_counts(b, width_s), batch_format="pandas"
    )
    return partition_map(partials, "conv_id", _merge_window_partials, num_partitions=num_partitions)


def _partial_sliding(batch: pd.DataFrame, width_s: int, slide_s: int) -> pd.DataFrame:
    k = width_s // slide_s
    us = _ts_us(batch["ts"])
    slide_us = slide_s * US
    bucket = (us // slide_us) * slide_us
    chars = _text_chars(batch)
    conv = batch["conv_id"].to_numpy()
    n = len(batch)
    # replicate as flat arrays (k shifted copies), not k DataFrames
    return group_sum(
        {
            "conv_id": np.tile(conv, k),
            "window_start_us": np.concatenate([bucket - i * slide_us for i in range(k)]),
        },
        {
            "n_turns": np.ones(n * k, dtype=np.int64),
            "sum_chars": np.tile(chars, k),
        },
    )


def _merge_sliding_partials(part: pd.DataFrame) -> pd.DataFrame:
    agg = group_sum_df(part, ["conv_id", "window_start_us"], ["n_turns", "sum_chars"])
    agg["window_start"] = agg.pop("window_start_us").to_numpy().astype("datetime64[us]")
    return agg[["conv_id", "window_start", "n_turns", "sum_chars"]]


def sliding_window_kernel(turns: pd.DataFrame, width_s: int, slide_s: int) -> pd.DataFrame:
    return _merge_sliding_partials(_partial_sliding(turns, width_s, slide_s))


def sliding_window_agg(
    transcripts,
    width_s: int = 7200,
    slide_s: int = 3600,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per (conv_id, sliding window): each turn lands in width/slide
    windows; replication is vectorized per batch (concat of shifted
    copies), then the same two-phase sum as tumbling.

    Returns: conv_id, window_start, n_turns, sum_chars.
    """
    if width_s % slide_s != 0:
        raise ValueError("width_s must be a multiple of slide_s")
    partials = transcripts.map_batches(
        lambda b: _partial_sliding(b, width_s, slide_s), batch_format="pandas"
    )
    return partition_map(partials, "conv_id", _merge_sliding_partials, num_partitions=num_partitions)


def _sessionize(part: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    """Vectorized session assignment over one hash partition
    (pre-sorted by (conv_id, turn_idx))."""
    us = _ts_us(part["ts"])
    conv = part["conv_id"].to_numpy()
    new_conv = np.empty(len(part), dtype=bool)
    new_conv[0:1] = True
    if len(part) > 1:
        new_conv[1:] = conv[1:] != conv[:-1]
    gap = np.empty(len(part), dtype=np.int64)
    gap[0:1] = 0
    if len(part) > 1:
        gap[1:] = us[1:] - us[:-1]
    new_session = new_conv | (gap > gap_s * US)
    # sessions are CONTIGUOUS runs of the (conv_id, turn_idx)-sorted
    # partition, so the aggregate is pure boundary arithmetic — no
    # groupby (the multi-key pandas path is 60x slower at 1M rows;
    # see groupsum.py).
    starts = np.flatnonzero(new_session)
    n_turns = np.diff(np.append(starts, len(part))).astype(np.int64)
    start_us = np.minimum.reduceat(us, starts)
    end_us = np.maximum.reduceat(us, starts)
    conv_out = conv[starts]
    # session_id = 0-based ordinal within its conversation (conv runs
    # are contiguous too: subtract each conv's first session position)
    conv_first = np.flatnonzero(new_conv[starts])
    seg = np.cumsum(new_conv[starts]) - 1
    session_id = (np.arange(len(starts)) - conv_first[seg]).astype(np.int32)
    return pd.DataFrame(
        {
            "conv_id": conv_out,
            "session_id": session_id,
            "n_turns": n_turns,
            "session_start": start_us.astype("datetime64[us]"),
            "session_end": end_us.astype("datetime64[us]"),
            "duration_us": (end_us - start_us).astype(np.int64),
        }
    )


def session_window_kernel(turns: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    if len(turns) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "session_id": pd.Series([], dtype=np.int32),
                "n_turns": pd.Series([], dtype=np.int64),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "duration_us": pd.Series([], dtype=np.int64),
            }
        )
    return _sessionize(turns, gap_s)


def session_window_agg(
    transcripts, gap_s: int = 1800, num_partitions: int = DEFAULT_NUM_PARTITIONS
):
    """Gap-based session windows per conversation.

    A new session starts when the event-time gap to the previous turn
    exceeds ``gap_s``. Returns: conv_id, session_id (int32, 0-based per
    conversation), n_turns, session_start, session_end, duration_us.
    """
    return partition_map(
        transcripts,
        "conv_id",
        lambda part: session_window_kernel(part, gap_s),
        num_partitions=num_partitions,
        sort_by=("conv_id", "turn_idx"),
    )
