"""Guaranteed-exact heavy hitters: Misra-Gries candidates + exact verify.

The production-shape frequent-items operator the reference lacks
(engine-original; its closest shape is the `dedup_and_sort` counting
helper, reference `dataflow/utils/utils.py`): find every item whose
frequency exceeds ``phi = num/den`` of the stream, with EXACT counts,
in two narrow passes — never materializing the full item dictionary.

Pass 1 (candidate sketch): each batch is summarized by a Misra-Gries
summary of at most ``k`` counters (exact batch counts, then subtract
the (k+1)-th largest and drop non-positives — the classic MG merge
step, Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012). Summaries are tiny (<= k rows/batch); one hash
exchange sums them per item. The subtraction undercounts any SINGLE
item by at most the pivot, and (k+1)*pivot <= n_batch, so each item's
total undercount is <= sum_i n_i/(k+1) = n/(k+1). Hence any item with
true count ``> n/(k+1)`` keeps a positive summed lower bound, and

    {true count > phi*n}  ⊆  {summed_lower > phi*n - n/(k+1)}

whenever ``k+1 >= den/num``. The candidate cut uses that inequality in
pure integer arithmetic. Candidate count is bounded by
``1/(phi - 1/(k+1))`` — a CONSTANT (e.g. <= 400 for phi=1/200,
k+1=400) — so broadcasting the candidate set is always cheap.

Pass 2 (exact verify): candidates are broadcast (``ray.put`` once,
read per task); each batch counts ONLY candidate occurrences; one
tiny exchange sums; the final integer cut ``cnt*den > n*num`` keeps
exactly the true heavy hitters. The output is therefore a pure
function of the multiset of items — independent of batch boundaries,
partition count and arrival order — even though the intermediate
candidate set is not.

At 100 TB: pass-1 state is k counters per in-flight batch, the
exchanges move O(batches * k) and O(candidates) rows, and the item
dictionary (which may not fit anywhere) is never built.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

_SUMMARY_COLS = ("token", "cnt", "n")


def mg_truncate(items: np.ndarray, counts: np.ndarray, k: int):
    """One Misra-Gries merge step: keep at most ``k`` counters by
    subtracting the (k+1)-th largest count and dropping non-positives.
    Deterministic (no tie-order dependence: ties with the pivot drop to
    zero together). Any single item undercounts by at most the pivot,
    and pivot <= sum(counts)/(k+1) — the per-item MG error bound."""
    if len(items) <= k:
        return items, counts
    pivot = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > pivot
    return items[keep], counts[keep] - pivot


def heavy_hitters(
    docs,
    items_fn: Callable[[pd.DataFrame], np.ndarray],
    num: int,
    den: int,
    k: int | None = None,
    num_partitions: int = 16,
):
    """Exact heavy hitters of the item stream ``items_fn(batch)`` over
    Dataset ``docs``: every item with count*den > n*num, with exact
    counts. ``k`` defaults to the smallest guarantee-preserving sketch
    size doubled (2*den/num)."""
    import ray

    from dataflow_mm_ray.partition import partition_map

    if not (0 < num < den):
        raise ValueError("phi = num/den must be in (0, 1)")
    if k is None:
        k = 2 * ((den + num - 1) // num)
    if k + 1 < (den + num - 1) // num:
        raise ValueError(f"k+1={k + 1} < den/num: the MG superset guarantee breaks")

    docs = docs.materialize()  # consumed by both passes

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        toks = items_fn(b)
        if len(toks) == 0:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        items, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        items, counts = mg_truncate(items, counts.astype(np.int64), k)
        # one sentinel row carries this batch's exact item total
        return pd.DataFrame(
            {"token": np.append(items, None),
             "cnt": np.append(counts, 0).astype(np.int64),
             "n": np.append(np.zeros(len(items), dtype=np.int64), len(toks))}
        )

    summaries = docs.map_batches(summarize, batch_format="pandas").materialize()
    n_total = int(summaries.sum("n") or 0)  # None on an empty dataset
    if n_total == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"token": pd.Series([], dtype=object),
                          "cnt": pd.Series([], dtype=np.int64)})
        )

    def merge_lower(p: pd.DataFrame) -> pd.DataFrame:
        p = p[p["token"].notna()]
        if not len(p):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "lower": pd.Series([], dtype=np.int64)})
        agg = p.groupby("token", as_index=False, sort=False)["cnt"].sum()
        agg.columns = ["token", "lower"]
        # superset cut: lower > phi*n - n/(k+1), integer arithmetic
        m = agg["lower"].to_numpy(dtype=np.int64) * den * (k + 1) \
            > n_total * (num * (k + 1) - den)
        return agg[m]

    cand = partition_map(summaries, "token", merge_lower,
                         num_partitions=num_partitions).to_pandas()
    if not len(cand):  # no candidate survives the superset cut -> no HH
        return ray.data.from_pandas(
            pd.DataFrame({"token": pd.Series([], dtype=object),
                          "cnt": pd.Series([], dtype=np.int64)})
        )
    # bounded by 1/(phi - 1/(k+1)) items — safe to broadcast
    cand_ref = ray.put(frozenset(cand["token"].tolist()))

    def count_candidates(b: pd.DataFrame) -> pd.DataFrame:
        cset = ray.get(cand_ref)
        toks = items_fn(b)
        if len(toks) == 0:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        items, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        m = np.fromiter((t in cset for t in items), dtype=bool, count=len(items))
        return pd.DataFrame({"token": items[m], "cnt": counts[m].astype(np.int64)})

    partials = docs.map_batches(count_candidates, batch_format="pandas")

    def exact_cut(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        agg = p.groupby("token", as_index=False, sort=False)["cnt"].sum()
        m = agg["cnt"].to_numpy(dtype=np.int64) * den > n_total * num
        return agg[m]

    return partition_map(partials, "token", exact_cut, num_partitions=num_partitions)


def whitespace_tokens(batch: pd.DataFrame, col: str = "text") -> np.ndarray:
    """lowercase whitespace tokens, '' dropped — the token_doc_freq
    convention (SQL twin: regexp_split_to_array(lower(text), '\\s+'))."""
    out: list[str] = []
    for t in batch[col]:
        if t is None or (isinstance(t, float) and np.isnan(t)):
            continue
        out.extend(str(t).lower().split())
    return np.asarray(out, dtype=object)
