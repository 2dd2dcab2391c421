"""Temporal non-equi operators over the transcript stream: as-of join
(latest-prior-event enrichment) and range join (interval containment
count). The reference has no relational joins at all (SURVEY §2.7 —
its closest pattern is column chaining within one table), so these are
engine-defined CEP constructs; their ordering rule is the canonical
transcript order ``(ts, event_id)`` == ``turn_idx`` (see
sources/transcripts.py).

Both are ONE hash-partitioned shuffle on ``user_id`` (== ``conv_id``)
followed by a fully vectorized per-partition kernel — no per-key
Python loop, no driver collect:

- **as-of**: for every turn, the most recent *strictly prior* event of
  a given type in the same conversation (classic enrichment: "what was
  the last click before this turn?"). Implemented as a segmented
  running maximum over event positions: a prior match is valid iff its
  position is >= the row's group start, so one ``np.maximum.accumulate``
  serves every conversation in the partition at once.
- **range join**: per-conversation incident intervals
  ``[ts, ts + width)`` opened by trigger events; for every turn, the
  number of open intervals containing its ``ts``. Implemented as a
  merged ±1 boundary sweep (start=+1, end=-1, query reads the running
  sum) with a segmented cumulative sum — exact for arbitrarily
  overlapping intervals, O(n log n) per partition, and robust to any
  interval nesting (unlike searchsorted tricks that need sorted ends).

Nullable outputs follow the repo convention (CLAUDE.md): float64 with
NaN on both engine and oracle sides; counts are int64.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

ASOF_EVENT_TYPE = "click"
INCIDENT_EVENT_TYPE = "error"
INCIDENT_WIDTH_S = 1800


def _conv_id(user_id: pd.Series) -> pd.Series:
    # same derivation as sources/transcripts.py
    return "conv-" + user_id.astype(str).str.zfill(6)


def _sorted_with_turn_idx(part: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
    part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    turn_idx = part.groupby("user_id", sort=False).cumcount().to_numpy().astype(np.int32)
    return part, turn_idx


def _group_starts(uid: np.ndarray) -> np.ndarray:
    """Per-row index of the first row of its (sorted, contiguous) group."""
    n = len(uid)
    starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    return np.repeat(starts, np.diff(np.r_[starts, n]))


def latest_prior_match(group_key: np.ndarray, is_match: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Segmented as-of core: for rows sorted with equal keys contiguous,
    return (index of the latest STRICTLY-prior matching row within the
    same group — clamped to 0 where none — and the validity mask).
    Shared by the batch as-of kernel and the streamed as-of finalize
    (state/store.py) so the tie/strictness rule lives in one place."""
    n = len(group_key)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    grp_start = _group_starts(group_key)
    pos = np.arange(n, dtype=np.int64)
    run = np.maximum.accumulate(np.where(is_match, pos, np.int64(-1)))
    prior = np.empty(n, dtype=np.int64)
    prior[0] = -1
    prior[1:] = run[:-1]  # strictly prior: shift by one row
    valid = prior >= grp_start  # a hit from an earlier group is out of segment
    return np.maximum(prior, 0), valid


def asof_enrich_kernel(part: pd.DataFrame, event_type: str = ASOF_EVENT_TYPE) -> pd.DataFrame:
    """Per partition (hash(user_id)): attach the latest strictly-prior
    ``event_type`` event's id and value to every turn."""
    if len(part) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "prior_click_event_id": pd.Series([], dtype=np.float64),
                "prior_click_value": pd.Series([], dtype=np.float64),
            }
        )
    part, turn_idx = _sorted_with_turn_idx(part)
    uid = part["user_id"].to_numpy()
    safe, valid = latest_prior_match(uid, part["event_type"].to_numpy() == event_type)
    ev_id = part["event_id"].to_numpy()
    val = part["value"].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "conv_id": _conv_id(part["user_id"]),
            "turn_idx": turn_idx,
            "prior_click_event_id": np.where(valid, ev_id[safe].astype(np.float64), np.nan),
            "prior_click_value": np.where(valid, val[safe], np.nan),
        }
    )


def incident_count_kernel(
    part: pd.DataFrame,
    event_type: str = INCIDENT_EVENT_TYPE,
    width_s: int = INCIDENT_WIDTH_S,
) -> pd.DataFrame:
    """Per partition (hash(user_id)): for every turn, the number of
    open incident intervals ``[trigger_ts, trigger_ts + width_s)`` of
    the same conversation containing the turn's ``ts`` (a trigger turn
    counts its own incident: start <= ts is inclusive)."""
    if len(part) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "n_open_incidents": pd.Series([], dtype=np.int64),
            }
        )
    part, turn_idx = _sorted_with_turn_idx(part)
    n = len(part)
    uid = part["user_id"].to_numpy()
    ts = part["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    trig = part["event_type"].to_numpy() == event_type
    width_us = np.int64(width_s) * 1_000_000

    t_uid, t_ts = uid[trig], ts[trig]
    # merged boundary sweep: kind 0 = boundary (start +1 / end -1),
    # kind 1 = query. At equal (uid, t) boundaries precede queries:
    # start<=ts is inclusive, ts<end exclusive — both resolved by
    # applying the delta before the read; start-vs-end mutual order at
    # equal t is irrelevant to reads.
    m_uid = np.concatenate([t_uid, t_uid, uid])
    m_t = np.concatenate([t_ts, t_ts + width_us, ts])
    m_kind = np.concatenate(
        [np.zeros(2 * len(t_uid), dtype=np.int8), np.ones(n, dtype=np.int8)]
    )
    m_delta = np.concatenate(
        [np.ones(len(t_uid), dtype=np.int64), -np.ones(len(t_uid), dtype=np.int64),
         np.zeros(n, dtype=np.int64)]
    )
    m_qidx = np.concatenate(
        [np.full(2 * len(t_uid), -1, dtype=np.int64), np.arange(n, dtype=np.int64)]
    )
    order = np.lexsort((m_kind, m_t, m_uid))
    s_uid, s_delta = m_uid[order], m_delta[order]
    s_qidx = m_qidx[order]
    cum = np.cumsum(s_delta)
    # segmented: subtract the running sum carried in from the previous uid
    grp_start = _group_starts(s_uid)
    base = cum[grp_start] - s_delta[grp_start]
    seg = cum - base
    q = s_qidx >= 0
    counts = np.zeros(n, dtype=np.int64)
    counts[s_qidx[q]] = seg[q]
    return pd.DataFrame(
        {
            "conv_id": _conv_id(part["user_id"]),
            "turn_idx": turn_idx,
            "n_open_incidents": counts,
        }
    )
