"""Distributed exact percentile / quantile selection.

Reference semantics: the global ``keep_ratio`` percentile cuts of
``KNNSimilarityFilter`` (``dataflow/operators/core_vision/filter/
knn_similarity_filter.py:194-196``) and the CLIPScore-style top-fraction
keeps use ``np.percentile(scores, q)`` — linear interpolation between
the two straddling order statistics (identical to DuckDB
``quantile_cont``).

Scale shape: ``np.percentile`` needs the k-th and (k+1)-th order
statistics of a column that at 10^12 rows can never be collected.
``exact_quantile`` finds them with distributed passes only:

1. one stats pass (count / min / max partials — a few bytes per block);
2. iterative histogram narrowing: each pass buckets the candidate
   interval into ``n_buckets`` and keeps the bucket containing the
   target rank (interval shrinks ~n_buckets x per pass, <= ~7 passes
   for float64);
3. when the candidate interval holds <= ``small_cutoff`` values, one
   gather pass collects JUST those values (bounded, driver-safe) and
   picks the order statistic directly;
4. one final pass derives the next order statistic (count <= v and
   min value > v), giving the interpolation partner.

Every pass is a ``map_batches`` with a tiny partial result; the input
Dataset is re-executed per pass, so callers should hand in either a
cheap re-readable source (a column-pruned parquet read) or a
materialized score Dataset.

The interpolated value reproduces numpy's lerp expression
(``a + (b - a) * frac``) so thresholds are bit-identical to
``np.percentile`` and to DuckDB ``quantile_cont``.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _finite(b: pd.DataFrame, col: str) -> np.ndarray:
    """Column as float64 with non-finite values dropped — NULL/NaN rows
    are ignored throughout, matching DuckDB quantile_cont and
    np.nanquantile semantics."""
    v = b[col].to_numpy(dtype=np.float64)
    return v[np.isfinite(v)]


def _stats(ds, col: str) -> tuple[int, float, float]:
    def part(b: pd.DataFrame) -> pd.DataFrame:
        v = _finite(b, col)
        if len(v) == 0:
            return pd.DataFrame({"n": [0], "mn": [np.inf], "mx": [-np.inf]})
        return pd.DataFrame({"n": [len(v)], "mn": [v.min()], "mx": [v.max()]})

    agg = ds.map_batches(part, batch_format="pandas").to_pandas()
    return int(agg["n"].sum()), float(agg["mn"].min()), float(agg["mx"].max())


def _kth_value(ds, col: str, k: int, lo: float, hi: float, below: int,
               n_buckets: int = 512, small_cutoff: int = 200_000) -> float:
    """0-indexed k-th smallest value, knowing it lies in [lo, hi] and
    exactly ``below`` values are < lo."""
    for _ in range(80):
        if lo == hi:
            return lo

        def hist(b: pd.DataFrame, lo=lo, hi=hi) -> pd.DataFrame:
            v = _finite(b, col)
            v = v[(v >= lo) & (v <= hi)]
            edges = np.linspace(lo, hi, n_buckets + 1)
            idx = np.clip(np.searchsorted(edges, v, side="right") - 1, 0, n_buckets - 1)
            c = np.bincount(idx, minlength=n_buckets)
            return pd.DataFrame({"j": np.arange(n_buckets), "c": c})

        counts = (
            ds.map_batches(hist, batch_format="pandas").to_pandas()
            .groupby("j", sort=True)["c"].sum().to_numpy()
        )
        r = k - below  # 0-indexed rank within [lo, hi]
        cum = np.cumsum(counts)
        j = int(np.searchsorted(cum, r + 1))
        edges = np.linspace(lo, hi, n_buckets + 1)
        new_lo, new_hi = float(edges[j]), float(edges[j + 1] if j + 1 < len(edges) else hi)
        below += int(cum[j - 1]) if j > 0 else 0
        in_bucket = int(counts[j])
        if in_bucket <= small_cutoff:
            def gather(b: pd.DataFrame, lo=new_lo, hi=new_hi) -> pd.DataFrame:
                v = _finite(b, col)
                # right-open except when the bucket touches the global max
                m = (v >= lo) & ((v < hi) if j + 1 < n_buckets else (v <= hi))
                return pd.DataFrame({"v": v[m]})

            vals = np.sort(
                ds.map_batches(gather, batch_format="pandas").to_pandas()["v"].to_numpy()
            )
            return float(vals[k - below])
        if new_lo == lo and new_hi == hi:
            # cannot shrink further: all remaining mass at one float
            return new_lo
        lo, hi = new_lo, new_hi
    raise RuntimeError("quantile narrowing did not converge")


def exact_quantile(ds, col: str, q: float,
                   n_buckets: int = 512, small_cutoff: int = 200_000) -> float:
    """Exact linear-interpolated quantile (numpy/DuckDB ``quantile_cont``
    semantics) of ``ds[col]`` computed with distributed passes only."""
    n, mn, mx = _stats(ds, col)
    if n == 0:
        raise ValueError("exact_quantile of an empty column")
    h = q * (n - 1)
    k0 = int(math.floor(h))
    frac = h - k0
    v0 = _kth_value(ds, col, k0, mn, mx, 0, n_buckets, small_cutoff)
    if frac == 0.0:
        return v0
    # next order statistic: v[k0+1] == v0 if duplicates span the rank,
    # else the min value strictly above v0 — one combined pass
    def nxt(b: pd.DataFrame, v0=v0) -> pd.DataFrame:
        v = _finite(b, col)
        above = v[v > v0]
        return pd.DataFrame(
            {"n_le": [int((v <= v0).sum())],
             "mn_above": [above.min() if len(above) else np.inf]}
        )

    agg = ds.map_batches(nxt, batch_format="pandas").to_pandas()
    n_le = int(agg["n_le"].sum())
    v1 = v0 if n_le > k0 + 1 else float(agg["mn_above"].min())
    return _lerp(v0, v1, frac)


def _lerp(v0: float, v1: float, frac: float) -> float:
    # numpy's _lerp, reproduced bit-exactly: a + (b-a)*t, except
    # b - (b-a)*(1-t) when t >= 0.5 (numpy/lib/function_base.py)
    if frac >= 0.5:
        return v1 - (v1 - v0) * (1 - frac)
    return v0 + (v1 - v0) * frac


def _rank_shuffle(ds, col: str, tie_col: str, out_col: str, edges: np.ndarray,
                  offsets: np.ndarray, n_buckets: int, num_partitions: int):
    """One keyed exchange on the value-bucket id; each partition sorts
    its buckets locally and assigns ``offset + local position``."""
    from dataflow_mm_ray.partition import partition_map

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        v = b[col].to_numpy(dtype=np.float64)
        b["__bucket"] = np.clip(np.searchsorted(edges, v, side="right") - 1, 0, n_buckets - 1)
        return b

    tagged = ds.map_batches(tag, batch_format="pandas")

    def rank_part(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for j, g in part.groupby("__bucket", sort=False):
            g = g.sort_values([col, tie_col], kind="mergesort")
            g = g.drop(columns="__bucket")
            g[out_col] = offsets[int(j)] + np.arange(len(g), dtype=np.int64)
            outs.append(g)
        if outs:
            return pd.concat(outs, ignore_index=True)
        # empty partition: keep the full output schema incl. out_col
        # (schema-invariant of partition_map)
        empty = part.drop(columns="__bucket")
        empty[out_col] = pd.Series([], dtype=np.int64)
        return empty

    return partition_map(tagged, "__bucket", rank_part, num_partitions=min(num_partitions, n_buckets))


def add_global_ranks(ds, cols, tie_col: str, out_cols,
                     n_buckets: int = 64, num_partitions: int = 16):
    """Append the global 0-based ordinal rank (ascending, ties broken by
    ``tie_col`` — i.e. ``np.argsort(np.argsort)`` with a deterministic
    tie rule) of EACH column in ``cols`` as the matching ``out_cols``
    entry, fully distributed. The stats and histogram passes are fused
    across all columns (2 passes total), then one keyed exchange per
    column."""

    def stat(b: pd.DataFrame) -> pd.DataFrame:
        row = {}
        for c in cols:
            v = _finite(b, c)
            row[f"n_{c}"] = [len(v)]
            row[f"mn_{c}"] = [v.min() if len(v) else np.inf]
            row[f"mx_{c}"] = [v.max() if len(v) else -np.inf]
        return pd.DataFrame(row)

    agg = ds.map_batches(stat, batch_format="pandas").to_pandas()
    edges = {
        c: np.linspace(float(agg[f"mn_{c}"].min()), float(agg[f"mx_{c}"].max()), n_buckets + 1)
        for c in cols
    }

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        row = {}
        for c in cols:
            v = b[c].to_numpy(dtype=np.float64)
            idx = np.clip(np.searchsorted(edges[c], v, side="right") - 1, 0, n_buckets - 1)
            row[f"c_{c}"] = np.bincount(idx, minlength=n_buckets)
        row["j"] = np.arange(n_buckets)
        return pd.DataFrame(row)

    hc = ds.map_batches(hist, batch_format="pandas").to_pandas().groupby("j", sort=True).sum()
    offsets = {
        c: np.concatenate([[0], np.cumsum(hc[f"c_{c}"].to_numpy())[:-1]]).astype(np.int64)
        for c in cols
    }
    cur = ds
    for c, oc in zip(cols, out_cols):
        cur = _rank_shuffle(cur, c, tie_col, oc, edges[c], offsets[c], n_buckets, num_partitions)
    return cur


def add_global_rank(ds, col: str, tie_col: str, out_col: str,
                    n_buckets: int = 64, num_partitions: int = 16):
    """Single-column ``add_global_ranks``."""
    return add_global_ranks(ds, [col], tie_col, [out_col], n_buckets, num_partitions)
