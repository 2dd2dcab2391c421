"""DataTailor collaborative data selection over the embeddings table.

Reference: ``dataflow/operators/core_vision/filter/datatailor_filter.py``
(lines cited per stage). Feature *extraction* there is Qwen2-VL-bound
(GPU, absent in this sandbox); everything from line 169 on is pure
math, reproduced here Ray-Data-first:

- **informativeness** (``:169-215``, paper eq. 2): singular-value
  entropy of the per-sample token-feature matrix. The Qwen2-VL token
  extractor is replaced by a deterministic stand-in (sliding windows
  over the stored embedding vector -> an (n_tokens, w) matrix); the
  SVD-entropy math itself is exact: drop singular values <= 1e-8,
  normalize, ``-sum(p * log(p + 1e-10))``. Runs fully distributed, one
  small SVD per row inside ``map_batches``.
- **clustering** (``:217-239``): the reference uses sklearn
  AgglomerativeClustering(metric=cosine, linkage=average) with
  ``n_clusters = clip(int(n*clustering_threshold), 2, n//2)``. Here a
  deterministic numpy average-linkage agglomerative clustering runs on
  a bounded hash-stratum sample (the IVF-centroid pattern); every row
  is then assigned to its nearest cluster centroid in ``map_batches``.
  (Even when the sample is the full set, nearest-centroid assignment
  is the documented approximation: average-linkage clusters are not
  Voronoi cells of their centroids, so borderline points can move and
  a sample cluster can end up empty — downstream tau/uniqueness use
  the ASSIGNED clusters consistently.)
- **uniqueness** (``:241-287``, eq. 4): within each cluster,
  ``sum_j ||p_j - p_i|| * (inf_j / sum inf)`` — one keyed exchange on
  the cluster label; per-cluster distances via the Gram identity in
  bounded row chunks (``cluster_uniqueness``), so a degenerate giant
  cluster costs O(c^2) compute like the reference but only
  O(chunk * c) memory — never the naive (c, c, d) broadcast.
- **representativeness** (``:289-345``, eqs. 5-6):
  ``tau_c = mean_over_other_clusters(exp(sim(centroid_c, centroid_k)))``
  from per-cluster centroid partial sums (tiny driver combine), times
  the within-cluster informativeness weight.
- **selection** (``:347-370``): each metric is rank-normalized
  (``argsort(argsort(x)) / n`` — reproduced distributed by
  ``percentile.add_global_rank`` with vec_id as the deterministic tie
  rule; the reference's unstable quicksort leaves ties undefined),
  collaborative score ``(1/3)*inf + (2/3)*(uni+rep)/2``, keep the top
  ``max(1, int(n*keep_ratio))`` rows.

Output: (vec_id, informativeness, uniqueness, representativeness,
score, selected) for every row — the reference "only evaluates and
adds metrics" plus the selection mask.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from dataflow_mm_ray.sources.tables import read_table

TOKEN_W = 8
TOKEN_STRIDE = 4


def token_matrix(vec: np.ndarray, w: int = TOKEN_W, stride: int = TOKEN_STRIDE) -> np.ndarray:
    """Deterministic stand-in for the Qwen2-VL per-sample token-feature
    matrix (model-bound): overlapping windows of the embedding."""
    v = np.asarray(vec, dtype=np.float32)
    if len(v) < w:
        return v[None, :]
    starts = range(0, len(v) - w + 1, stride)
    return np.stack([v[s : s + w] for s in starts])


def sve_informativeness(tok: np.ndarray) -> float:
    """Singular-value entropy (datatailor_filter.py:169-215, exact)."""
    if tok.shape[0] < 2:
        return 0.0
    try:
        sv = np.linalg.svd(tok.astype(np.float32), compute_uv=False)
    except np.linalg.LinAlgError:
        return 0.0
    sv = sv[sv > 1e-8]
    if len(sv) == 0:
        return 0.0
    p = sv / sv.sum()
    return float(-np.sum(p * np.log(p + 1e-10)))


def agglomerative_cosine(mat: np.ndarray, n_clusters: int) -> np.ndarray:
    """Deterministic average-linkage agglomerative clustering on cosine
    distance (the sklearn call at datatailor_filter.py:231-237,
    re-implemented in numpy; merge ties break on the smallest cluster
    pair, so labels are reproducible). Labels are renumbered 0..k-1 in
    order of each cluster's smallest member index."""
    n = len(mat)
    if n <= 2 or n_clusters >= n:
        return np.arange(max(n, 0), dtype=np.int64) if n_clusters >= n else np.zeros(n, dtype=np.int64)
    norm = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
    dist = 1.0 - norm @ norm.T
    np.fill_diagonal(dist, np.inf)
    # average linkage over ORIGINAL point distances: d(A,B) =
    # mean_{a in A, b in B} dist(a, b) — maintained via sum matrix.
    # Row-minimum caching makes each merge O(n) amortized (O(n^2)
    # total), with the same deterministic row-major argmin tie-break
    # as a full-matrix scan.
    sums = dist.copy()
    avg = dist.copy()
    sizes = np.ones(n, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    members = [[i] for i in range(n)]
    rmin = avg.min(axis=1)
    rarg = avg.argmin(axis=1)
    for _ in range(n - n_clusters):
        i = int(np.argmin(rmin))
        j = int(rarg[i])
        if i > j:
            i, j = j, i
        # merge j into i
        sums[i, :] += sums[j, :]
        sums[:, i] += sums[:, j]
        sizes[i] += sizes[j]
        active[j] = False
        members[i].extend(members[j])
        members[j] = []
        newrow = sums[i, :] / (sizes[i] * sizes)
        newrow[~active] = np.inf
        newrow[i] = np.inf
        avg[i, :] = newrow
        avg[:, i] = newrow
        avg[j, :] = np.inf
        avg[:, j] = np.inf
        rmin[j] = np.inf
        rmin[i] = newrow.min()
        rarg[i] = int(newrow.argmin())
        # rows whose cached argmin pointed at i or j may have gone
        # stale upward — recompute; rows improved by the new column i
        # update in place (tie -> smaller column index, matching the
        # full-scan order)
        stale = active & ((rarg == i) | (rarg == j))
        stale[i] = False
        for m in np.where(stale)[0]:
            rmin[m] = avg[m].min()
            rarg[m] = int(avg[m].argmin())
        better = active & ((newrow < rmin) | ((newrow == rmin) & (i < rarg)))
        better[i] = False
        idx = np.where(better)[0]
        rmin[idx] = newrow[idx]
        rarg[idx] = i
    labels = np.empty(n, dtype=np.int64)
    order = sorted((min(m), idx) for idx, m in enumerate(members) if m)
    for new_id, (_, idx) in enumerate(order):
        labels[members[idx]] = new_id
    return labels


def _batch_embed(b: pd.DataFrame) -> np.ndarray:
    return np.stack(b["embedding"].to_numpy()).astype(np.float64)


_UNI_CHUNK_BYTES = 64 << 20  # peak distance-block size per task


def cluster_uniqueness(feats: np.ndarray, w: np.ndarray,
                       chunk_bytes: int = _UNI_CHUNK_BYTES) -> np.ndarray:
    """Eq. 4 uniqueness ``uni_i = sum_j ||x_i - x_j|| * w_j`` without the
    (g, g, d) broadcast-subtract intermediate: Euclidean distances via
    the Gram identity ``d^2 = ||x||^2 + ||y||^2 - 2 x.y`` (one matmul),
    computed in row chunks so peak memory is O(chunk * g) — a
    100k-member skewed cluster peaks at ``chunk_bytes`` instead of the
    ~10 TB (g, g, d) array the naive form allocates."""
    g = len(feats)
    if g <= 1:
        return np.zeros(g)
    s = np.einsum("ij,ij->i", feats, feats)
    chunk = max(1, min(g, chunk_bytes // (8 * g)))
    uni = np.empty(g)
    for lo in range(0, g, chunk):
        hi = min(lo + chunk, g)
        d2 = s[lo:hi, None] + s[None, :] - 2.0 * (feats[lo:hi] @ feats.T)
        np.maximum(d2, 0.0, out=d2)
        d = np.sqrt(d2, out=d2)
        d[np.arange(hi - lo), np.arange(lo, hi)] = 0.0  # self-distance
        uni[lo:hi] = d @ w
    return uni


def datatailor_select(sf_dir: str, keep_ratio: float = 0.8,
                      clustering_threshold: float = 0.1,
                      max_train: int = 1024, num_partitions: int = 16, ds=None):
    """The full DataTailor pipeline (see module docstring)."""
    import pyarrow.parquet as pq

    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.stages.percentile import add_global_rank, add_global_ranks

    emb = ds if ds is not None else read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # --- bounded sample -> agglomerative clustering -> centroids ---
    if ds is None:
        n_total = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    else:
        # consumed by three passes (count, sample pick, score_assign) —
        # materialize so a caller-supplied pipeline runs once
        emb = emb.materialize()
        n_total = emb.count()
    m = max(1, -(-n_total // max_train))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        from dataflow_mm_ray.hashing import stable_hash_array

        h = stable_hash_array(b["vec_id"].to_numpy().astype(np.int64))
        return b[(h % np.uint64(m)) == 0]

    sample = emb.map_batches(pick, batch_format="pandas").to_pandas().sort_values("vec_id")
    smat = _batch_embed(sample)
    # reference cluster-count rule (datatailor_filter.py:225-228) on n
    n_clusters = max(2, int(n_total * clustering_threshold))
    n_clusters = min(n_clusters, n_total // 2)
    n_clusters = min(n_clusters, len(sample))
    labels = agglomerative_cosine(smat, n_clusters)
    cents = np.stack([smat[labels == c].mean(axis=0) for c in range(labels.max() + 1)])
    cents_n = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-8)
    cent_ref = ray.put(cents_n)

    # --- distributed: informativeness + cluster assignment ---
    def score_assign(b: pd.DataFrame) -> pd.DataFrame:
        cn = ray.get(cent_ref)
        mat = _batch_embed(b)
        inf = np.fromiter(
            (sve_informativeness(token_matrix(v)) for v in b["embedding"]),
            dtype=np.float64, count=len(b),
        )
        mn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
        cluster = np.argmax(mn @ cn.T, axis=1).astype(np.int64)
        out = b[["vec_id", "embedding"]].copy(deep=False)
        out["informativeness"] = inf
        out["cluster"] = cluster
        return out

    scored = emb.map_batches(score_assign, batch_format="pandas").materialize()

    # --- per-cluster kernel (ONE exchange): each cluster is whole in
    # its partition, so the kernel computes uniqueness AND the cluster
    # summary (centroid of assigned members, informativeness weights)
    # in the same pass; tau_c needs all centroids together, so the
    # kernel emits a tiny per-cluster summary row alongside the
    # per-vector metrics, the driver combines the k summaries, and one
    # stateless map attaches rep = tau_c * w.
    def cluster_kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c, g in part.groupby("cluster", sort=False):
            feats = _batch_embed(g)
            inf = g["informativeness"].to_numpy()
            if inf.sum() > 0:
                w = inf / inf.sum()
            else:
                w = np.ones(len(inf)) / len(inf)
            uni = cluster_uniqueness(feats, w)
            outs.append(
                pd.DataFrame(
                    {"vec_id": g["vec_id"].to_numpy(), "cluster": np.int64(c),
                     "informativeness": inf, "uniqueness": uni, "__w": w,
                     "__cent": None}
                )
            )
            # summary row: centroid of the assigned members
            outs.append(
                pd.DataFrame(
                    {"vec_id": [np.int64(-1)], "cluster": [np.int64(c)],
                     "informativeness": [0.0], "uniqueness": [0.0], "__w": [0.0],
                     "__cent": [feats.mean(axis=0)]}
                )
            )
        if outs:
            return pd.concat(outs, ignore_index=True)
        # empty partition (fewer clusters than P): full output schema,
        # never a vec_id-only block (schema-invariant of partition_map)
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype=np.int64),
             "cluster": pd.Series([], dtype=np.int64),
             "informativeness": pd.Series([], dtype=np.float64),
             "uniqueness": pd.Series([], dtype=np.float64),
             "__w": pd.Series([], dtype=np.float64),
             "__cent": pd.Series([], dtype=object)}
        )

    with_summaries = partition_map(
        scored, "cluster", cluster_kernel, num_partitions=num_partitions
    ).materialize()

    # tiny driver combine: k centroid rows -> tau_c per cluster
    def summaries_only(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["vec_id"] < 0, ["cluster", "__cent"]]

    summ = with_summaries.map_batches(summaries_only, batch_format="pandas").to_pandas()
    # tau over PRESENT clusters only: nearest-centroid reassignment can
    # leave sample clusters empty (average-linkage clusters are not
    # Voronoi cells of their centroids), and an absent cluster must not
    # inject zero-centroid exp(0) terms or inflate the k-1 denominator
    present = np.sort(summ["cluster"].to_numpy(dtype=np.int64)) if len(summ) else np.empty(0, np.int64)
    kp = len(present)
    mcent = np.zeros((kp, smat.shape[1]))
    pos = {int(c): i for i, c in enumerate(present)}
    for _, r in summ.iterrows():
        mcent[pos[int(r["cluster"])]] = r["__cent"]
    mcent = mcent / (np.linalg.norm(mcent, axis=1, keepdims=True) + 1e-8)
    sims = mcent @ mcent.T
    # tau indexed by ORIGINAL cluster id (dense array over max id)
    tau = np.ones(int(present.max()) + 1 if kp else 1)
    if kp > 1:
        for i, c in enumerate(present):
            other = np.delete(sims[i], i)
            tau[int(c)] = np.exp(other).sum() / (kp - 1)
    tau_ref = ray.put(tau)
    single_cluster = kp <= 1

    def attach_rep(b: pd.DataFrame) -> pd.DataFrame:
        tau_v = ray.get(tau_ref)
        b = b.loc[b["vec_id"] >= 0].copy(deep=False)
        if single_cluster:
            rep = np.ones(len(b))
        else:
            rep = tau_v[b["cluster"].to_numpy(dtype=np.int64)] * b["__w"].to_numpy(dtype=np.float64)
        b["representativeness"] = rep
        return b[["vec_id", "informativeness", "uniqueness", "representativeness"]]

    # materialized: add_global_ranks consumes it with three passes
    metrics = with_summaries.map_batches(attach_rep, batch_format="pandas").materialize()

    # --- distributed rank normalization + collaborative selection ---
    # (fused stats/hist passes across the three metrics)
    r3 = add_global_ranks(
        metrics, ["informativeness", "uniqueness", "representativeness"],
        "vec_id", ["__r_inf", "__r_uni", "__r_rep"], num_partitions=num_partitions,
    )

    n = n_total
    n_select = max(1, int(n * keep_ratio))

    def score_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        inf_n = b["__r_inf"].to_numpy(dtype=np.float64) / n
        uni_n = b["__r_uni"].to_numpy(dtype=np.float64) / n
        rep_n = b["__r_rep"].to_numpy(dtype=np.float64) / n
        b["score"] = (1 / 3) * inf_n + (2 / 3) * (uni_n + rep_n) / 2
        return b.drop(columns=["__r_inf", "__r_uni", "__r_rep"])

    with_score = r3.map_batches(score_rows, batch_format="pandas")
    ranked = add_global_rank(with_score, "score", "vec_id", "__r_score",
                             num_partitions=num_partitions)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["selected"] = b["__r_score"].to_numpy() >= (n - n_select)
        return b.drop(columns="__r_score").sort_values("vec_id")

    return ranked.map_batches(finish, batch_format="pandas")
