"""Distinct-count sketching (HyperLogLog) — an engine addition.

The reference has NO distinct-count or approximate aggregates
(SURVEY.md §2.8: "No global sorts, no distinct-count sketches, no
approximate aggregates exist in the reference"), but a 100 TB
training-data pipeline needs cardinality estimates (distinct documents
per source, distinct tokens, distinct users per window) without a
full-key shuffle. HyperLogLog gives them with one tiny mergeable state
per group:

- **map side** (``map_batches``): hash values with SipHash, take
  per-(group, register) maxima of the leading-zero ranks — the classic
  combiner: a batch of any size reduces to at most
  ``groups x 2^p`` one-byte registers;
- **reduce side**: registers merge by elementwise max (commutative,
  associative, idempotent — re-applying a partial is harmless), so the
  result is independent of partitioning and arrival order;
- **estimate**: the standard bias-corrected harmonic mean with the
  small-range (linear counting) and large-range corrections of the
  original HLL paper (Flajolet et al., 2007).

Determinism: SipHash is process-stable (hashing.py), register merges
are order-free, so any run at any parallelism yields identical
estimates. Standard error ~ 1.04/sqrt(2^p): p=14 -> ~0.8%.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.hashing import stable_hash_array

HLL_P = 14
_M = 1 << HLL_P


def _ranks(hashes: np.ndarray, p: int = HLL_P) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: index = top p bits, rank = one
    plus leading-zero count of the remaining 64-p bits (capped)."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # remaining bits, left-aligned
    # leading zeros of a left-aligned uint64, vectorized: compare
    # against descending powers of two via log2 on the float mantissa
    # is lossy for low bits — use a bit-scan loop over the 64-p bit
    # budget instead (6 iterations, branch-free)
    lz = np.zeros(len(hashes), dtype=np.uint64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint64(shift)
        x[mask] <<= np.uint64(shift)
    rank = np.minimum(lz.astype(np.int64), 64 - p) + 1
    return idx, rank


def hll_partial(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Dense register array (uint8, 2^p) for one group's values."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(values):
        idx, rank = _ranks(stable_hash_array(values), p)
        np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with small/large-range corrections."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))  # 2^-reg, exact in float64
    e = alpha * m * m / inv.sum()
    if e <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            e = m * np.log(m / zeros)  # linear counting
    elif e > (1 << 64) / 30.0:
        e = -(2.0**64) * np.log1p(-e / 2.0**64)
    return int(round(e))


def hll_triples(values: np.ndarray, p: int, hasher=stable_hash_array) -> tuple[np.ndarray, np.ndarray]:
    """Per-row sparse HLL updates: (register index int32, rank uint8).
    A row costs 5 bytes on the wire instead of a dense 2^p-byte
    register block per (group, batch) — the dense form is built only
    where registers are MERGED (``registers_from_triples``). Identical
    final registers either way (max over the same update multiset), so
    streamed and batch results stay bit-equal. ``hasher`` defaults to
    SipHash; pass ``md5_hash64`` for the SQL-oracled twin."""
    return hll_triples_from_hashes(hasher(values), p)


def hll_triples_from_hashes(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """hll_triples over precomputed SipHash values — callers that
    already hash the column (e.g. the streaming apply-id digest) reuse
    the pass instead of hashing twice."""
    idx, rank = _ranks(hashes, p)
    return idx.astype(np.int32), rank.astype(np.uint8)


def registers_from_triples(group_vals: np.ndarray, idx: np.ndarray,
                           rank: np.ndarray, p: int):
    """Densify sparse updates: per distinct group, the elementwise-max
    register array. ONE vectorized maximum.at over a fused
    (group code, register) key — no per-group Python loop. Returns
    (sorted group keys, list of register bytes)."""
    m = 1 << p
    codes, uniq = pd.factorize(group_vals, sort=True)
    regs = np.zeros(len(uniq) * m, dtype=np.uint8)
    flat = codes.astype(np.int64) * m + idx.astype(np.int64)
    np.maximum.at(regs, flat, rank)
    regs = regs.reshape(len(uniq), m)
    if isinstance(uniq, pd.Index):
        uniq = uniq.to_numpy()
    return uniq, [r.tobytes() for r in regs]


def hll_partials_by_group(group_vals: np.ndarray, values: np.ndarray,
                          p: int, hasher=stable_hash_array) -> tuple[np.ndarray, list[bytes]]:
    """Per-group dense register partials for one batch (triples +
    densify) — used where a caller wants register blocks directly."""
    idx, rank = hll_triples(values, p, hasher=hasher)
    return registers_from_triples(group_vals, idx, rank, p)


def merge_register_frames(window_keys: np.ndarray, reg_bytes, p: int):
    """Merge (key, registers) partial rows: per distinct key, the
    elementwise max of its registers. Returns (keys array, list of
    register bytes)."""
    df = pd.DataFrame({"k": window_keys, "r": list(reg_bytes)})
    ks, out = [], []
    for k, sub in df.groupby("k", sort=True):
        regs = np.zeros(1 << p, dtype=np.uint8)
        for rb in sub["r"]:
            regs = np.maximum(regs, np.frombuffer(rb, dtype=np.uint8))
        ks.append(k)
        out.append(regs.tobytes())
    return np.asarray(ks), out


def approx_distinct(ds, group_col: str, value_col: str, p: int = HLL_P,
                    num_partitions: int = 8, hasher=stable_hash_array,
                    estimator=None):
    """Approximate COUNT(DISTINCT value) per group over a Dataset.

    One combiner pass (per-batch registers) + one tiny keyed exchange of
    ``groups x 2^p`` bytes — never a shuffle of the raw values. Returns
    (group_col, approx_distinct:int64), deterministic at any
    parallelism. ``hasher``/``estimator`` default to the SipHash
    production pair; pass ``md5_hash64`` + ``hll_estimate_sqlexact``
    for the fully SQL-oracled twin."""
    from dataflow_mm_ray.partition import partition_map

    estimator = estimator or hll_estimate

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        gs, regs = hll_partials_by_group(
            b[group_col].to_numpy(), b[value_col].to_numpy(dtype=object), p,
            hasher=hasher,
        )
        return pd.DataFrame({group_col: np.asarray(gs, dtype=object), "__regs": regs})

    part = ds.map_batches(partials, batch_format="pandas")

    def merge(part_df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for g, sub in part_df.groupby(group_col, sort=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for rb in sub["__regs"]:
                regs = hll_merge(regs, np.frombuffer(rb, dtype=np.uint8))
            out_g.append(g)
            out_n.append(estimator(regs))
        return pd.DataFrame(
            {group_col: np.asarray(out_g, dtype=object),
             "approx_distinct": np.asarray(out_n, dtype=np.int64)}
        )

    return partition_map(part, group_col, merge, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# SQL-oracle-exact HLL twin (md5 hashes + exact-integer register sum)
# ---------------------------------------------------------------------------

def md5_hash64(values: np.ndarray) -> np.ndarray:
    """64-bit hashes from the first 16 hex chars of md5(str(v)) —
    SQL-recomputable stand-in for SipHash, used only by the oracled
    sketch twin (the SipHash path stays the production default: one
    vectorized pass, no per-value digest)."""
    import hashlib

    return np.asarray(
        [int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:16], 16) for v in values],
        dtype=np.uint64,
    )


def hll_estimate_sqlexact(regs: np.ndarray) -> int:
    """``hll_estimate`` with the register sum carried as an EXACT
    integer (sum of 2^(51-reg), reg <= 51) before one float division —
    the same double DuckDB computes from HUGEINT, so the estimate is
    bit-reproducible in SQL (numpy's pairwise float sum is not).
    Differs from hll_estimate by <= 1 ulp of the harmonic mean; int()
    truncation like the paper's floor."""
    import math

    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    counts = np.bincount(regs.astype(np.int64), minlength=52)
    s = 0
    for r in range(52):
        c = int(counts[r])
        if c:
            s += c << (51 - r)
    e = (alpha * m * m) / (float(s) * 2.0 ** -51)
    if e <= 2.5 * m:
        zeros = int(counts[0])
        if zeros:
            e = m * math.log(m / zeros)
    # No 64-bit large-range correction: the SQL twin
    # (functions/hll_sql.py) doesn't apply one, and keeping it here
    # would make the bit-equality claim silently conditional on
    # e <= 2^64/30 (~6.1e17 — unreachable, but the contract should be
    # unconditional).
    return int(e)


# ---------------------------------------------------------------------------
# Mergeable latency histogram (the windowed-percentile sketch): quarter-
# octave log2 bins over integer microseconds. Bin 0 holds lat <= 1us;
# bin b holds (2^((b-1)/4), 2^(b/4)] us; the last bin is open-ended at
# ~2^44 us (~200 days). A window's histogram is 177 int64s (1.4 KiB);
# shard partials merge by elementwise sum, so the cross-shard /
# cross-epoch split is lossless — the same mergeability contract as the
# HLL registers above. The quantile estimate returns the covering bin's
# UPPER edge: a guaranteed overestimate of the exact nearest-rank
# percentile within a factor of 2^(1/4) (~19%) + 1us of it.

LAT_BINS = 177


def lat_bins(lat_us: np.ndarray) -> np.ndarray:
    """Bin index per latency (int64 us, >= 0)."""
    lat = np.asarray(lat_us, dtype=np.float64)
    b = np.zeros(len(lat), dtype=np.int64)
    pos = lat > 1.0
    b[pos] = np.minimum(LAT_BINS - 1,
                        np.ceil(4.0 * np.log2(lat[pos])).astype(np.int64))
    return b


def lat_bin_upper(b: int) -> int:
    """Inclusive upper edge of bin b in integer us."""
    return 1 if b <= 0 else int(np.ceil(2.0 ** (b / 4.0)))


def lat_hist(lat_us: np.ndarray) -> np.ndarray:
    h = np.zeros(LAT_BINS, dtype=np.int64)
    np.add.at(h, lat_bins(lat_us), 1)
    return h


def lat_hist_quantile(hist: np.ndarray, q: float) -> int:
    """Nearest-rank quantile upper bound from a merged histogram:
    exact_nearest_rank <= result <= exact * 2^(1/4) + 1."""
    n = int(hist.sum())
    if n == 0:
        return 0
    r = max(1, int(np.ceil(q * n)))
    b = int(np.searchsorted(np.cumsum(hist), r))
    return lat_bin_upper(b)
