"""Stream-health statistics: skew detection, out-of-order (late) turns,
conversation digests.

- ``hot_conversations``: per-key counts with a per-batch combiner, then
  top-k by (count desc, conv_id) — the detection half of the salted
  repartition strategy (SURVEY.md §7.2 milestone 10).
- ``late_events``: per-conversation out-of-order detection in *arrival*
  order (event_id): an event is late if an earlier-arriving event of
  the same conversation carries a later event-time by more than the
  allowed lateness. This is the batch analog of watermark-based late
  routing (streaming path: dataflow_mm_ray.streaming.watermark).
- ``conversation_digest``: order-stable re-assembly check — per
  conversation the MD5 of the ts-ordered concatenated turn texts, the
  pipe-joined role string, and the turn count. Any instability of
  per-turn text or ordering after shuffles changes the digest.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data.aggregate import Sum

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

US = 1_000_000


def hot_conversations(transcripts, k: int = 10):
    """Top-k conversations by turn count; deterministic tie-break on
    conv_id. Returns: conv_id, n_turns."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("conv_id", as_index=False, sort=False).size()
        return g.rename(columns={"size": "n_turns"})

    partials = transcripts.map_batches(partial, batch_format="pandas")
    counts = partials.groupby("conv_id").aggregate(Sum("n_turns", alias_name="n_turns"))
    # top-k: small result — sort by (n_turns desc, conv_id asc) and limit.
    return counts.sort(["n_turns", "conv_id"], descending=[True, False]).limit(k)


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
    import hashlib

    from dataflow_mm_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

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

    return partition_map(ev, "user_id", fn, num_partitions=num_partitions)


def conversation_digest(transcripts, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Per conversation: n_turns, roles pipe-joined in turn order, and
    MD5 of the unit-separator-joined texts in turn order.

    Returns: conv_id, n_turns, roles_str, text_md5.
    """

    def fn(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "n_turns": pd.Series([], dtype=np.int64),
                    "roles_str": pd.Series([], dtype=object),
                    "text_md5": pd.Series([], dtype=object),
                }
            )
        g = part.groupby("conv_id", sort=False)
        agg = g.agg(
            n_turns=("turn_idx", "size"),
            roles_str=("role", "|".join),
            joined=("text", "\x1f".join),
        ).reset_index()
        agg["text_md5"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in agg.pop("joined")
        ]
        agg["n_turns"] = agg["n_turns"].astype(np.int64)
        return agg

    return partition_map(
        transcripts, "conv_id", fn, num_partitions=num_partitions, sort_by=("conv_id", "turn_idx")
    )
