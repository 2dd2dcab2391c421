"""Stream-health statistics: skew detection, out-of-order (late) turns,
conversation digests.

- ``hot_conversations``: per-key counts with a per-batch combiner, one
  hash-shuffle merge, then a driver-side top-k over the (tiny) per-key
  count table — the detection half of the salted repartition strategy
  (SURVEY.md §7.2 milestone 10).
- ``late_events``: per-conversation out-of-order detection under a
  deterministic arrival permutation — the batch analog of
  watermark-based late routing (streaming path:
  dataflow_mm_ray.streaming).
- ``conversation_digest``: order-stable re-assembly check — per
  conversation the MD5 of the ts-ordered concatenated turn texts, the
  pipe-joined role string, and the turn count. Any instability of
  per-turn text or ordering after shuffles changes the digest.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

US = 1_000_000


def conv_count_kernel(turns: pd.DataFrame) -> pd.DataFrame:
    g = turns.groupby("conv_id", as_index=False, sort=False).size()
    return g.rename(columns={"size": "n_turns"})


def topk_counts(counts: pd.DataFrame, k: int) -> pd.DataFrame:
    """Deterministic top-k: (n_turns desc, conv_id asc)."""
    out = counts.sort_values(["n_turns", "conv_id"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def hot_conversations(transcripts, k: int = 10):
    """Top-k conversations by turn count; deterministic tie-break on
    conv_id. Returns: conv_id, n_turns (pandas, small).

    Scale: the per-key count table is one row per conversation — far
    too big to collect at 10^12 turns. Each reduce partition holds all
    rows of its keys, so it emits only its local top-k; the driver sees
    P*k rows and takes the global top-k."""
    partials = transcripts.map_batches(conv_count_kernel, batch_format="pandas")
    local_topk = partition_map(partials, "conv_id", lambda p: topk_counts(conv_count_kernel_merge(p), k))
    return topk_counts(local_topk.to_pandas(), k)


def conv_count_kernel_merge(part: pd.DataFrame) -> pd.DataFrame:
    return part.groupby("conv_id", as_index=False, sort=False)["n_turns"].sum()


def late_events(sf_dir: str, lateness_s: int = 604800, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Out-of-order events per conversation under a synthetic arrival
    permutation.

    ``event_id`` order is globally ts-monotone in the test data, so a
    deterministic arrival shuffle is applied: arrival order within a
    conversation = lexicographic ``md5(event_id)``. An event is *late*
    if an earlier-arriving event of the same conversation carries a
    later event-time by more than ``lateness_s`` — exactly the rows a
    watermark of ``max(seen ts) - lateness`` would route to the
    quarantine table (streaming path: dataflow_mm_ray.streaming).

    Returns: conv_id, event_id, ts, late_by_us (>0).
    """
    def fn(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "event_id": pd.Series([], dtype=np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "late_by_us": pd.Series([], dtype=np.int64),
                }
            )
        part = part.copy(deep=False)
        part["__ak"] = [
            hashlib.md5(str(e).encode()).hexdigest() for e in part["event_id"].to_numpy()
        ]
        part = part.sort_values(["user_id", "__ak"], kind="mergesort")
        us = part["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        uid = part["user_id"].to_numpy()
        new_u = np.ones(len(part), dtype=bool)
        new_u[1:] = uid[1:] != uid[:-1]
        # running max of ts over *earlier-arriving* rows of the same
        # conversation: grouped cummax then shift(1), both vectorized.
        s = pd.Series(us)
        g = pd.Series(np.cumsum(new_u))
        prev_max = s.groupby(g).cummax().groupby(g).shift(1)
        late_by = prev_max.to_numpy() - us - lateness_s * US
        late_by = np.where(np.isnan(late_by), -1, late_by)
        mask = late_by > 0
        return pd.DataFrame(
            {
                "conv_id": "conv-" + part.loc[mask, "user_id"].astype(str).str.zfill(6),
                "event_id": part.loc[mask, "event_id"].to_numpy(),
                "ts": part.loc[mask, "ts"].to_numpy(),
                "late_by_us": late_by[mask].astype(np.int64),
            }
        )

    from dataflow_mm_ray.partition import partition_map_parquet
    from dataflow_mm_ray.sources.tables import table_path

    return partition_map_parquet(
        table_path(sf_dir, "events"), ["event_id", "ts", "user_id"], "user_id", fn,
        num_partitions=num_partitions,
    )


def digest_kernel(turns: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation digest over a (conv, turn)-sorted partition."""
    if len(turns) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "roles_str": pd.Series([], dtype=object),
                "text_md5": pd.Series([], dtype=object),
            }
        )
    g = turns.groupby("conv_id", sort=False)
    agg = g.agg(
        n_turns=("turn_idx", "size"),
        roles_str=("role", "|".join),
        joined=("text", "\x1f".join),
    ).reset_index()
    agg["text_md5"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in agg.pop("joined")]
    agg["n_turns"] = agg["n_turns"].astype(np.int64)
    return agg


def conversation_digest(transcripts, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Per conversation: n_turns, roles pipe-joined in turn order, and
    MD5 of the unit-separator-joined texts in turn order.

    Returns: conv_id, n_turns, roles_str, text_md5.
    """
    return partition_map(
        transcripts, "conv_id", digest_kernel, num_partitions=num_partitions,
        sort_by=("conv_id", "turn_idx"),
    )


TOP_TOOLS_K = 3  # hot tools per window (batch query + wtopk stream)


def window_topk_cut(agg: pd.DataFrame, k: int) -> pd.DataFrame:
    """Vectorized per-window rank cut over merged (window_start_us,
    tool, n_invocations) counts: rank by (count desc, tool asc) within
    each window, keep rank <= k. Shared by the batch
    ``windowed_top_tools`` query and the streamed ``wtopk`` stream so
    tie-breaks are bit-identical."""
    if not len(agg):
        return pd.DataFrame(
            {"window_start_us": pd.Series([], dtype=np.int64),
             "tool": pd.Series([], dtype=object),
             "n_invocations": pd.Series([], dtype=np.int64),
             "rank": pd.Series([], dtype=np.int64)}
        )
    agg = agg.sort_values(["window_start_us", "n_invocations", "tool"],
                          ascending=[True, False, True], kind="mergesort")
    w = agg["window_start_us"].to_numpy(dtype=np.int64)
    chg = np.empty(len(agg), dtype=bool)
    chg[0] = True
    chg[1:] = w[1:] != w[:-1]
    rank = np.arange(len(agg)) - np.flatnonzero(chg)[np.cumsum(chg) - 1] + 1
    keep = rank <= k
    out = agg[keep]
    return pd.DataFrame(
        {"window_start_us": out["window_start_us"].to_numpy(dtype=np.int64),
         "tool": out["tool"].to_numpy(),
         "n_invocations": out["n_invocations"].to_numpy(dtype=np.int64),
         "rank": rank[keep].astype(np.int64)}
    )
