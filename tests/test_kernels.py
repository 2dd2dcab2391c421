"""Unit tests for the vectorized per-partition kernels on handcrafted
frames (no Ray needed): session gap scan, tool join backward fill."""
import numpy as np
import pandas as pd

from dataflow_mm_ray.stages.join import _join_partition
from dataflow_mm_ray.stages.windows import _sessionize


def _ts(*secs):
    return pd.Series(np.array([s * 1_000_000 for s in secs], dtype="datetime64[us]"))


def test_sessionize_gaps_and_conv_boundaries():
    part = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "a", "b", "b"],
            "turn_idx": [0, 1, 2, 3, 0, 1],
            "ts": _ts(0, 10, 2000, 2010, 0, 5000),
        }
    )
    out = _sessionize(part, gap_s=1800)
    # conv a: gap 10->2000 = 1990s > 1800 -> two sessions; conv b same
    assert list(out["conv_id"]) == ["a", "a", "b", "b"]
    assert list(out["session_id"]) == [0, 1, 0, 1]
    assert list(out["n_turns"]) == [2, 2, 1, 1]
    assert list(out["duration_us"]) == [10_000_000, 10_000_000, 0, 0]


def test_sessionize_exact_gap_not_new_session():
    part = pd.DataFrame(
        {"conv_id": ["a", "a"], "turn_idx": [0, 1], "ts": _ts(0, 1800)}
    )
    out = _sessionize(part, gap_s=1800)  # gap == threshold -> same session
    assert list(out["n_turns"]) == [2]


def test_join_matches_next_tool_turn_only():
    part = pd.DataFrame(
        {
            "conv_id": ["a"] * 5,
            "turn_idx": np.array([0, 1, 2, 3, 4], dtype=np.int32),
            "role": ["user", "assistant", "tool", "assistant", "tool"],
            "tool": [None, "tool_x", "tool_x", "tool_y", "tool_y"],
            "ts": _ts(0, 1, 2, 3, 4),
        }
    )
    out = _join_partition(part)
    assert list(out["invoke_idx"]) == [1, 3]
    assert list(out["response_idx"]) == [2, 4]
    assert list(out["latency_us"]) == [1_000_000, 1_000_000]


def test_join_unmatched_invocation_is_kept_pending():
    part = pd.DataFrame(
        {
            "conv_id": ["a", "a"],
            "turn_idx": np.array([0, 1], dtype=np.int32),
            "role": ["assistant", "user"],
            "tool": ["tool_x", None],
            "ts": _ts(0, 1),
        }
    )
    out = _join_partition(part)
    assert len(out) == 1
    assert out["response_idx"].isna().all()
    assert out["latency_us"].isna().all()


def test_join_tool_turn_cannot_match_itself():
    # a tool-role row that also carries a tool name must not be its own response
    part = pd.DataFrame(
        {
            "conv_id": ["a", "a"],
            "turn_idx": np.array([0, 1], dtype=np.int32),
            "role": ["assistant", "tool"],
            "tool": ["tool_x", "tool_x"],
            "ts": _ts(0, 5),
        }
    )
    out = _join_partition(part)
    assert list(out["invoke_idx"]) == [0]
    assert list(out["response_idx"]) == [1]
