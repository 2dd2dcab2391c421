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
