"""Turn <-> tool-response correlation (the stateful CEP join).

The reference has no relational joins (SURVEY.md §2.7); its closest
pattern is the rollout->verifier correlation
(``dataflow/operators/core_vision/filter/failrate_filter.py:12-139``).
The engine defines the join: an ``assistant`` turn that invokes a tool
(``tool IS NOT NULL``) is matched to the *next* ``role='tool'`` turn in
the same conversation (by ``turn_idx``); unmatched invocations are kept
with NULL response columns (they stay pending in the streaming path
until the watermark evicts them).

Batch implementation: one hash-partitioned shuffle on ``conv_id``, then
a vectorized backward-fill scan per partition — no Python loop per
conversation. The streaming implementation with per-key pending state
lives in ``dataflow_mm_ray.state``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

_EMPTY = pd.DataFrame(
    {
        "conv_id": pd.Series([], dtype=object),
        "invoke_idx": pd.Series([], dtype=np.int32),
        "tool": pd.Series([], dtype=object),
        "response_idx": pd.Series([], dtype=np.float64),
        "latency_us": pd.Series([], dtype=np.float64),
    }
)


def _join_partition(part: pd.DataFrame, with_response_ts: bool = False) -> pd.DataFrame:
    """part is sorted by (conv_id, turn_idx). With ``with_response_ts``
    an extra ``ts_response_us`` float64 column (NaN unmatched) is
    appended — consumed by the windowed-latency aggregates, which key
    on the response timestamp."""
    if len(part) == 0:
        out = _EMPTY.copy()
        if with_response_ts:
            out["ts_response_us"] = pd.Series([], dtype=np.float64)
        return out
    is_tool_turn = (part["role"] == "tool").to_numpy()
    turn = part["turn_idx"].to_numpy()
    ts_us = part["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)

    ng = part.groupby("conv_id", sort=False).ngroup()
    tool_turn = pd.Series(np.where(is_tool_turn, turn.astype(np.float64), np.nan), index=part.index)
    tool_ts = pd.Series(np.where(is_tool_turn, ts_us.astype(np.float64), np.nan), index=part.index)
    # Nearest tool turn strictly after the current row: shift(-1) within
    # the conversation (so a tool row can't match itself), then
    # backward-fill within the conversation. Both are vectorized.
    next_tool_turn = tool_turn.groupby(ng).shift(-1).groupby(ng).bfill()
    next_tool_ts = tool_ts.groupby(ng).shift(-1).groupby(ng).bfill()

    inv_mask = ((part["role"] == "assistant") & part["tool"].notna()).to_numpy()
    out = pd.DataFrame(
        {
            "conv_id": part.loc[inv_mask, "conv_id"].to_numpy(),
            "invoke_idx": turn[inv_mask].astype(np.int32),
            "tool": part.loc[inv_mask, "tool"].to_numpy(),
            # canonical dtype for the nullable join columns is float64
            # (NaN for unmatched) on BOTH engine and oracle sides: DuckDB's
            # .df() converts NULL-able ints to float64, and the driver's
            # value hash is representation-sensitive (VERDICT r1 #2).
            "response_idx": next_tool_turn.to_numpy()[inv_mask].astype(np.float64),
            "latency_us": (next_tool_ts.to_numpy()[inv_mask] - ts_us[inv_mask]).astype(
                np.float64
            ),
        }
    )
    if with_response_ts:
        out["ts_response_us"] = next_tool_ts.to_numpy()[inv_mask].astype(np.float64)
    return out


def join_kernel(turns: pd.DataFrame) -> pd.DataFrame:
    """Per-partition kernel (fused path): turns sorted by (conv, turn)."""
    return _join_partition(turns)


def tool_response_join(transcripts, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Correlate tool invocations with their responses.

    Returns: conv_id, invoke_idx (int32), tool, response_idx (float64,
    NaN if unmatched), latency_us (float64 µs, response ts - invoke ts).
    """
    return partition_map(
        transcripts,
        "conv_id",
        _join_partition,
        num_partitions=num_partitions,
        sort_by=("conv_id", "turn_idx"),
    )
