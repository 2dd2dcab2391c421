"""Sequential diversity filter — the reference's ``ImageDiversityFilter``
(``dataflow/operators/core_vision/filter/image_diversity_filter.py:
14-62 (caches), 100-119 (scan)``): keep a row iff its TF-IDF cosine
similarity against every previously-KEPT text is below ``threshold``;
kept texts are appended to an in-operator cache capped at ``max_cache``
entries. First-wins and order-dependent by construction.

Distribution note (documented, inherent): the scan is sequential over
the kept-set, so the engine runs the *vectorization* distributed (one
map_batches pass builds the sparse term vectors) and the scan itself
on the driver over the collected vectors in stable id order — the same
shape as the reference, minus the per-row Python TF-IDF cost. For
corpus-scale near-dup use the order-free MinHash/SimHash pipelines
(stages/neardup.py); this operator exists for semantic parity.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.functions.textstats import normalize_basic


def _term_counts(text: str) -> dict[str, int]:
    c: dict[str, int] = {}
    for w in normalize_basic(text).split():
        c[w] = c.get(w, 0) + 1
    return c


def _cosine(a: dict[str, float], b: dict[str, float]) -> float:
    if len(b) < len(a):
        a, b = b, a
    dot = sum(v * b.get(k, 0.0) for k, v in a.items())
    na = np.sqrt(sum(v * v for v in a.values()))
    nb = np.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


class _KeptIndex:
    """Inverted index over the kept cache for vectorized cosine: word ->
    (vec ids, counts). TF counts are INTEGERS, so every dot product is
    an exact integer in float64 no matter the accumulation order — the
    vectorized scan returns bit-identical cosines (and therefore keep
    decisions) to the per-pair dict loop it replaces."""

    def __init__(self):
        self.postings: dict[str, tuple[list, list]] = {}
        self.norms: list[float] = []

    def __len__(self):
        return len(self.norms)

    def add(self, terms: dict[str, int]) -> None:
        vid = len(self.norms)
        for w, v in terms.items():
            p = self.postings.get(w)
            if p is None:
                p = ([], [])
                self.postings[w] = p
            p[0].append(vid)
            p[1].append(float(v))
        self.norms.append(float(np.sqrt(sum(v * v for v in terms.values()))))

    def max_cosine_exceeds(self, terms: dict[str, int], threshold: float) -> bool:
        n = len(self.norms)
        if not n or not terms:
            return False
        na = float(np.sqrt(sum(v * v for v in terms.values())))
        if not na:
            return False
        dots = np.zeros(n, dtype=np.float64)
        for w, v in terms.items():
            p = self.postings.get(w)
            if p is not None:
                # vec ids are unique within a posting list: fancy += safe
                dots[np.asarray(p[0], dtype=np.int64)] += v * np.asarray(p[1])
        with np.errstate(divide="ignore", invalid="ignore"):
            # a cached vector with zero norm yields 0/0 = NaN here and
            # 0.0 in the scalar _cosine — both compare False vs threshold
            sims = dots / (na * np.asarray(self.norms))
        return bool((sims >= threshold).any())


def diversity_filter(ds, id_col: str = "doc_id", text_col: str = "text",
                     threshold: float = 0.8, max_cache: int = 10_000) -> pd.DataFrame:
    """Returns (id, keep) under the sequential first-wins scan.

    TF weighting only (the reference fits TF-IDF incrementally on the
    kept cache; with the cache-reset behavior the engine uses plain TF
    cosine — the order/threshold semantics are identical).

    Memory is bounded: term vectors are built distributed, the Dataset
    is sorted by id, and the driver consumes it one batch at a time
    (``iter_batches``) holding only the current batch plus the
    ``max_cache``-capped kept index — never the whole corpus."""

    def vecs(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy(deep=False)
        out["__terms"] = [_term_counts(t if isinstance(t, str) else "") for t in batch[text_col]]
        return out

    vec_ds = ds.map_batches(vecs, batch_format="pandas").sort(id_col)
    kept = _KeptIndex()
    ids, keeps = [], []
    for batch in vec_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for rid, terms in zip(batch[id_col].to_numpy(), batch["__terms"]):
            ok = not kept.max_cosine_exceeds(terms, threshold)
            ids.append(rid)
            keeps.append(ok)
            if ok and len(kept) < max_cache:
                kept.add(terms)
    return pd.DataFrame({id_col: np.asarray(ids), "keep": np.asarray(keeps, dtype=bool)})


# ---------------------------------------------------------------------------
# phash half (ImageDuplicateFilter, image_diversity_filter.py:36-62)
# ---------------------------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II matrix (scipy.fftpack.dct norm=None
    convention: y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N)))."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return 2.0 * np.cos(np.pi * k * (2 * m + 1) / (2 * n))


_DCT32 = _dct_matrix(32)


def phash_bits(gray: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """Perceptual hash of a 2-D luminance grid — the imagehash.phash
    recipe (grayscale -> 2-D DCT-II -> top-left hash_size^2 lowfreq
    block -> bits = coeff > median), reimplemented in pure numpy. The
    caller supplies the (hash_size*4)^2 grid (PIL resize in production;
    the stub decoder here)."""
    n = gray.shape[0]
    d = _DCT32 if n == 32 else _dct_matrix(n)
    dct = d @ gray.astype(np.float64) @ d.T
    low = dct[:hash_size, :hash_size]
    return (low > np.median(low)).reshape(-1)


def stub_phash(key: str, hash_size: int = 8) -> np.ndarray | None:
    """phash over the deterministic stub decode of an image key; None
    models a missing/unreadable file (ImageDuplicateFilter returns
    (False, None), lines 44-53). Uses the same every-31st-missing
    convention as stages/nsfw.stub_image_meta."""
    from dataflow_mm_ray.stages.multimodal import _stub_decode_image, fake_image_bytes
    from dataflow_mm_ray.stages.nsfw import STUB_MISSING_MOD, _u32

    if key is None or (isinstance(key, float) and np.isnan(key)):
        return None
    key = str(key)
    if _u32(key, "exists") % STUB_MISSING_MOD == 0:
        return None
    size = hash_size * 4
    return phash_bits(_stub_decode_image(fake_image_bytes(key), size, size), hash_size)


def _pack_bits(bits: np.ndarray | None) -> int:
    """64 phash bits -> one int64; -1 encodes a missing image."""
    if bits is None:
        return -1
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def _unpack_bits(v: int, n: int = 64) -> np.ndarray:
    u = v & ((1 << 64) - 1)
    return np.array([(u >> (n - 1 - i)) & 1 for i in range(n)], dtype=bool)


def diversity_filter_full(ds, id_col: str = "doc_id", text_col: str = "text",
                          key_col: str = "image_key", text_thresh: float = 0.8,
                          img_dist_thresh: int = 5, hash_size: int = 8,
                          max_cache: int = 10_000) -> pd.DataFrame:
    """BOTH gates of the reference ImageDiversityFilter
    (image_diversity_filter.py:100-104): keep iff the text is unique
    (TF cosine vs kept texts < text_thresh, with the len(text) < 3
    short-text drop of TextDuplicateFilter:21-22) AND the image is
    unique (min phash Hamming distance vs kept hashes STRICTLY >
    img_dist_thresh, ImageDuplicateFilter:54-62). The two caches update
    INDEPENDENTLY (check_diversity:102-104 calls both filters
    unconditionally), so a text-unique/image-dup row still extends the
    text cache — reproduced exactly.

    Same driver-sequential parity shape as ``diversity_filter`` (the
    kept-set scan is order-dependent by reference semantics): phash +
    term vectors are computed DISTRIBUTED in map_batches; the driver
    holds only the capped caches. Scale path: MinHash/SimHash
    (stages/neardup.py)."""

    def vecs(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy(deep=False)
        texts = [t if isinstance(t, str) else "" for t in batch[text_col]]
        out["__terms"] = [_term_counts(t) for t in texts]
        out["__short"] = [not t or len(t) < 3 for t in texts]
        # pack the hash bits into one int64 (-1 = missing) so the column
        # survives the Arrow block boundary without tensor-extension casts
        out["__phash"] = np.asarray(
            [_pack_bits(stub_phash(k, hash_size)) for k in batch[key_col]],
            dtype=np.int64,
        )
        return out

    vec_ds = ds.map_batches(vecs, batch_format="pandas").sort(id_col)
    kept_text = _KeptIndex()
    # preallocated ring-free buffer: comparisons use the LAST max_cache
    # kept hashes (reference windows [-max_imgs:] but appends unboundedly;
    # the engine caps total appends at max_cache like diversity_filter)
    hash_buf = np.empty((max_cache, hash_size * hash_size), dtype=bool)
    n_hashes = 0
    ids, keeps = [], []
    for batch in vec_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for rid, terms, short, packed in zip(
            batch[id_col].to_numpy(), batch["__terms"],
            batch["__short"], batch["__phash"].to_numpy(),
        ):
            ph = None if packed == -1 else _unpack_bits(int(packed), hash_size * hash_size)
            # text half (TextDuplicateFilter.check_similarity)
            if short:
                text_ok = False
            else:
                text_ok = not kept_text.max_cosine_exceeds(terms, text_thresh)
                if text_ok and len(kept_text) < max_cache:
                    kept_text.add(terms)
            # image half (ImageDuplicateFilter.check_distance)
            if ph is None:
                img_ok = False
            elif n_hashes == 0:
                img_ok = True
                hash_buf[0] = ph
                n_hashes = 1
            else:
                min_dist = int(
                    (hash_buf[:n_hashes] != ph[None, :]).sum(axis=1).min()
                )
                img_ok = min_dist > img_dist_thresh
                if img_ok and n_hashes < max_cache:
                    hash_buf[n_hashes] = ph
                    n_hashes += 1
            ids.append(rid)
            keeps.append(text_ok and img_ok)
    return pd.DataFrame({id_col: np.asarray(ids), "keep": np.asarray(keeps, dtype=bool)})


def image_duplicate_filter(ds, id_col: str = "doc_id",
                           key_col: str = "image_key",
                           dist_thresh: int = 5, hash_size: int = 8,
                           max_cache: int = 10_000) -> pd.DataFrame:
    """Standalone ``ImageDuplicateFilter`` — the image gate alone, which
    the reference registers as its own operator
    (image_diversity_filter.py:43-62): keep iff the image decodes AND
    its min phash Hamming distance vs every previously-KEPT image is
    STRICTLY > ``dist_thresh``; the first decodable image is always
    kept. ``min_dist`` reproduces the reference return value: NaN for
    missing/undecodable images AND for the first kept one (both return
    ``None`` there), the computed distance otherwise — emitted as
    float64-with-NaN per the repo's nullable-numeric rule.

    Same parity shape as ``diversity_filter``/``diversity_filter_full``
    (phash computed distributed in map_batches, order-dependent
    first-wins scan on the driver over packed int64 hashes, kept-cache
    capped at ``max_cache``); scale path: SimHash banding
    (stages/neardup.py).
    """

    def vecs(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy(deep=False)
        out["__phash"] = np.asarray(
            [_pack_bits(stub_phash(k, hash_size)) for k in batch[key_col]],
            dtype=np.int64,
        )
        return out

    vec_ds = ds.map_batches(vecs, batch_format="pandas").sort(id_col)
    nbits = hash_size * hash_size
    hash_buf = np.empty((max_cache, nbits), dtype=bool)
    n_hashes = 0
    ids, keeps, dists = [], [], []
    for batch in vec_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for rid, packed in zip(
            batch[id_col].to_numpy(), batch["__phash"].to_numpy()
        ):
            min_dist = float("nan")
            if packed == -1:
                ok = False
            elif n_hashes == 0:
                ok = True
                hash_buf[0] = _unpack_bits(int(packed), nbits)
                n_hashes = 1
            else:
                ph = _unpack_bits(int(packed), nbits)
                min_dist = float(
                    (hash_buf[:n_hashes] != ph[None, :]).sum(axis=1).min()
                )
                ok = min_dist > dist_thresh
                if ok and n_hashes < max_cache:
                    hash_buf[n_hashes] = ph
                    n_hashes += 1
            ids.append(rid)
            keeps.append(ok)
            dists.append(min_dist)
    return pd.DataFrame({
        id_col: np.asarray(ids),
        "keep": np.asarray(keeps, dtype=bool),
        "min_dist": np.asarray(dists, dtype=np.float64),
    })
