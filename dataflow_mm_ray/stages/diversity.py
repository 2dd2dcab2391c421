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


def diversity_filter(ds, id_col: str = "doc_id", text_col: str = "text",
                     threshold: float = 0.8, max_cache: int = 10_000) -> pd.DataFrame:
    """Returns (id, keep) under the sequential first-wins scan.

    TF weighting only (the reference fits TF-IDF incrementally on the
    kept cache; with the cache-reset behavior the engine uses plain TF
    cosine — the order/threshold semantics are identical)."""

    def vecs(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy(deep=False)
        out["__terms"] = [_term_counts(t if isinstance(t, str) else "") for t in batch[text_col]]
        return out

    collected = ds.map_batches(vecs, batch_format="pandas").to_pandas()
    collected = collected.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    kept_vecs: list[dict] = []
    keep = np.zeros(len(collected), dtype=bool)
    for i, terms in enumerate(collected["__terms"]):
        ok = True
        for kv in kept_vecs:
            if _cosine(terms, kv) >= threshold:
                ok = False
                break
        keep[i] = ok
        if ok and len(kept_vecs) < max_cache:
            kept_vecs.append(terms)
    return pd.DataFrame({id_col: collected[id_col].to_numpy(), "keep": keep})
