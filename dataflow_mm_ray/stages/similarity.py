"""Embedding similarity: brute-force cosine top-k (ANN baseline),
KNN-percentile filtering, and embedding near-dup marking.

Scale shape (the part that must survive 100 TB):

- the *query/reference* side is small and broadcast once via
  ``ray.put`` — each map task reads it zero-copy from the object
  store; it is never re-shipped per batch;
- the *data* side streams through ``map_batches`` as Arrow blocks;
  each batch does one float64 matmul (vectorized) and keeps only its
  partial top-k, so the shuffle that follows moves k rows per (query,
  batch), not the full similarity matrix;
- the O(n^2) all-pairs variants (knn filter, near-dup marking) keep
  the *full* reference matrix broadcast — valid to ~10^5 vectors; the
  documented scale path is IVF/LSH bucketing (see stages/neardup.py
  for the LSH machinery), which turns the matmul into per-bucket
  matmuls after one groupby shuffle.

Reference semantics reproduced:
- ``KNNSimilarityFilter`` (knn_similarity_filter.py:112-141,194-196):
  mean cosine similarity to the k nearest neighbors, keep rows strictly
  below the global ``keep_ratio`` percentile (np.percentile linear
  interpolation == DuckDB quantile_cont).
- ``ImageDeduplicateFilter`` (image_deduplication_filter.py:122-197):
  a row is a duplicate iff ANY earlier row (by id order) has cosine
  similarity >= threshold; per-row ``max_similarity`` is recorded.

All similarities are computed in float64 and rounded to 9 dp on both
the Ray and SQL sides (DuckDB's float32 ``list_cosine_similarity`` is
avoided by casting to DOUBLE[] in the oracles).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from dataflow_mm_ray.sources.tables import read_table

SIM_ROUND = 9
# similarity batches are deliberately small: each batch does a dense
# (batch x n_ref) float64 matmul in a single-threaded worker, so
# parallelism comes from many concurrent map tasks, not BLAS threads.
SIM_BATCH = 256


def _round9(x):
    """np.round(x, 9) without its per-call overhead (same semantics:
    scale, rint, unscale)."""
    return np.rint(x * 1e9) / 1e9


def _normalized_matrix(sf_dir: str, filters=None) -> tuple[np.ndarray, np.ndarray]:
    """Load embeddings as a (vec_ids, unit-norm float64 matrix) pair.

    Driver-side materialization of the broadcast side only — at scale
    this is the small reference set / centroid table, not the stream;
    pass ``filters`` (pyarrow row filters) to prune to the broadcast
    rows at the read.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"], filters=filters
    )
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    col = t["embedding"].combine_chunks()
    dim = len(col[0])
    # zero-copy flatten of the list<float> column, then one reshape —
    # never a python list per row
    m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(col), dim)[order]
    ids = ids[order]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, m / norms


def _batch_matrix(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, m / norms


def _final_topk(part: pd.DataFrame, k: int) -> pd.DataFrame:
    """The shared top-k reducer: (sim desc, vec_id asc) tie-break +
    head(k) per query — the determinism contract pinned by the
    ivf-at-full-probe == brute-force pytest, kept in ONE place."""
    part = part.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
    return part.groupby("query_id", sort=False, group_keys=False).head(k)


def brute_force_topk(sf_dir: str, k: int = 10, n_queries: int = 5):
    """For each query vector (vec_id < n_queries): top-k most similar
    other vectors by cosine. Returns query_id, vec_id, sim."""
    # only the (small) query rows are read driver-side — row-filtered
    # at the parquet read, never the full table
    q_ids, q_mat = _normalized_matrix(sf_dir, filters=[("vec_id", "<", n_queries)])
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qm = ray.get(q_ref)
        ids, m = _batch_matrix(batch)
        sims = _round9(m @ qm.T)  # (batch, nq)
        out_q, out_v, out_s = [], [], []
        for c in range(sims.shape[1]):
            col = sims[:, c].copy()
            col[ids == qi[c]] = -np.inf  # exclude self
            take = min(k, len(col))
            # partial top-k with (sim desc, vec_id asc) tie-break
            idx = np.lexsort((ids, -col))[:take]
            idx = idx[np.isfinite(col[idx])]
            out_q.append(np.full(len(idx), qi[c], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(col[idx])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "sim": np.concatenate(out_s),
            }
        )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pandas", batch_size=SIM_BATCH)

    from dataflow_mm_ray.partition import partition_map

    return partition_map(
        partials, "query_id", lambda p: _final_topk(p, k), num_partitions=8
    )


def knn_percentile_filter(sf_dir: str, k: int = 10, keep_ratio: float = 0.6):
    """KNNSimilarityFilter semantics: keep vectors whose top-k
    similarity mass is strictly below the keep_ratio percentile.

    The score is the SUM of the top-k nano-similarities as an exact
    int64 (``sum_knn_sim_e9``): sims are rounded to 9 dp on both
    engines, converted to integers exactly, and summed exactly — no
    float rounding-mode hazard can flip the oracle hash (a mean of
    9dp-rounded values lands on half-ulp boundaries ~1/10 of the time,
    where numpy's half-even and DuckDB's half-away disagree).
    Returns vec_id, sum_knn_sim_e9 for kept rows."""
    all_ids, all_mat = _normalized_matrix(sf_dir)
    ref = ray.put((all_ids, all_mat))

    def knn_sum(batch: pd.DataFrame) -> pd.DataFrame:
        ai, am = ray.get(ref)
        ids, m = _batch_matrix(batch)
        sims = m @ am.T
        sims[ids[:, None] == ai[None, :]] = -np.inf  # exclude self
        take = min(k, sims.shape[1] - 1)
        # top-k on raw sims; a rounded tie at the boundary swaps equal
        # values, so the integer sum is unchanged either way
        part = -np.partition(-sims, take - 1, axis=1)[:, :take]
        nano = np.rint(part * 1e9).astype(np.int64)
        return pd.DataFrame({"vec_id": ids, "sum_knn_sim_e9": nano.sum(axis=1)})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # materialize the (vec_id, score) table once — the quantile passes
    # re-consume it, and recomputing the matmul per pass would be worse;
    # blocks stay distributed in the object store.
    scored = ds.map_batches(knn_sum, batch_format="pandas", batch_size=SIM_BATCH).materialize()
    from dataflow_mm_ray.stages.percentile import exact_quantile

    thr = exact_quantile(scored, "sum_knn_sim_e9", keep_ratio)
    # distributed filter; output stays a Dataset (never driver pandas)
    return scored.map_batches(
        lambda b, thr=thr: b[b["sum_knn_sim_e9"] < thr], batch_format="pandas"
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.4):
    """ImageDeduplicateFilter semantics over the embedding table:
    mark vec j duplicate iff any i<j has cos(i,j) >= threshold; record
    per-row max similarity. Returns vec_id, max_similarity, keep."""
    all_ids, all_mat = _normalized_matrix(sf_dir)
    ref = ray.put((all_ids, all_mat))

    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        ai, am = ray.get(ref)
        ids, m = _batch_matrix(batch)
        sims = _round9(m @ am.T)
        self_mask = ids[:, None] == ai[None, :]
        sims_ns = np.where(self_mask, -np.inf, sims)
        max_sim = sims_ns.max(axis=1)
        earlier = ai[None, :] < ids[:, None]
        dup = ((sims_ns >= threshold) & earlier).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "max_similarity": _round9(max_sim),
                "keep": ~dup,
            }
        )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(mark, batch_format="pandas", batch_size=SIM_BATCH)


# ---------------------------------------------------------------------------
# IVF — the ANN scale path
# ---------------------------------------------------------------------------

def training_sample(sf_dir: str, max_train: int = 100_000) -> np.ndarray:
    """Deterministic bounded sample of the embedding table for centroid
    training: rows whose stable vec_id hash lands in a 1/m stratum
    (m = ceil(n / max_train)), filtered DISTRIBUTED in map_batches and
    collected only after the bound is known. Never the full matrix."""
    import pyarrow.parquet as pq

    from dataflow_mm_ray.hashing import stable_hash_array

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    m = max(1, -(-n // max_train))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash_array(b["vec_id"].to_numpy().astype(np.int64))
        return b[(h % np.uint64(m)) == 0]

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sampled = ds.map_batches(pick, batch_format="pandas").to_pandas()
    _, mat = _batch_matrix(sampled)
    return mat


def ivf_centroids(mat: np.ndarray, n_clusters: int = 16, iters: int = 5, seed: int = 11) -> np.ndarray:
    """Seeded spherical k-means over unit vectors (cosine == dot).
    Deterministic: fixed init sample, fixed iteration count. Trained on
    the bounded ``training_sample``; the centroid table is the
    broadcast side."""
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
             n_clusters: int = 16, nprobe: int = 4):
    """IVF-bucketed cosine top-k: vectors are assigned to their nearest
    centroid in map_batches; each query only scores vectors whose
    cluster is among its ``nprobe`` closest centroids. With
    nprobe == n_clusters this is exactly brute_force_topk
    (pytest-pinned); smaller nprobe trades recall for a 1/nprobe scan.

    Scale shape: the shuffle-free filter happens per batch against the
    broadcast centroid table — the full-matrix matmul shrinks to the
    probed fraction; a keyed variant (groupby cluster) co-locates
    buckets when the probe sets are dense."""
    cent = ivf_centroids(training_sample(sf_dir), n_clusters=n_clusters)
    q_ids, q_mat = _normalized_matrix(sf_dir, filters=[("vec_id", "<", n_queries)])
    # probe set per query: top-nprobe centroids
    probes = np.argsort(-(q_mat @ cent.T), axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((q_ids, q_mat, cent, probes))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qm, ct, pr = ray.get(ref)
        ids, m = _batch_matrix(batch)
        assign = np.argmax(m @ ct.T, axis=1)  # vector -> cluster
        sims = _round9(m @ qm.T)
        out_q, out_v, out_s = [], [], []
        for c in range(len(qi)):
            in_probe = np.isin(assign, pr[c])
            col = np.where(in_probe, sims[:, c], -np.inf)
            col[ids == qi[c]] = -np.inf
            take = min(k, len(col))
            idx = np.lexsort((ids, -col))[:take]
            idx = idx[np.isfinite(col[idx])]
            out_q.append(np.full(len(idx), qi[c], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(col[idx])
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q), "vec_id": np.concatenate(out_v),
             "sim": np.concatenate(out_s)}
        )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial, batch_format="pandas", batch_size=SIM_BATCH)

    from dataflow_mm_ray.partition import partition_map

    return partition_map(
        partials, "query_id", lambda p: _final_topk(p, k), num_partitions=8
    )


def ivf_knn_percentile(sf_dir: str, k: int = 10, keep_ratio: float = 0.6,
                       n_clusters: int = 16, nprobe: int | None = None,
                       query_chunk: int = 1024):
    """Bucketed twin of ``knn_percentile_filter`` with the SAME output
    contract (vec_id, sum_knn_sim_e9 of kept rows) but no full-matrix
    broadcast — the 100-TB shape for KNNSimilarityFilter
    (knn_similarity_filter.py:112-141).

    Shape: centroids are trained on the bounded ``training_sample`` and
    broadcast; each vector emits one row per probed cluster (its
    ``nprobe`` nearest centroids, nearest-first so the row for its OWN
    cluster doubles as the membership row); ONE keyed exchange on
    ``cluster`` co-locates each bucket, where a chunked matmul takes the
    per-bucket top-k; a second keyed exchange on ``vec_id`` merges the
    per-bucket partials into the global top-k sum; the global threshold
    comes from the existing distributed ``exact_quantile``. Memory per
    task is O(bucket x dim + query_chunk x bucket), never O(n x d).

    With ``nprobe == n_clusters`` every bucket sees every vector, so the
    result is pytest-pinned bit-equal to ``knn_percentile_filter``;
    smaller nprobe trades KNN recall for a 1/nprobe candidate scan. The
    data expansion through the first exchange is nprobe x — the price of
    bucketing, paid in shuffle bytes instead of per-node matrix memory.
    """
    if nprobe is None:
        nprobe = max(1, n_clusters // 4)
    cent = ivf_centroids(training_sample(sf_dir), n_clusters=n_clusters)
    nprobe = min(nprobe, len(cent))
    cent_ref = ray.put(cent)

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        ct = ray.get(cent_ref)
        ids, m = _batch_matrix(batch)
        # nearest-first probe list; column 0 is the assignment cluster
        probes = np.argsort(-(m @ ct.T), axis=1, kind="stable")[:, :nprobe]
        n, d = m.shape
        return pd.DataFrame(
            {
                "cluster": probes.reshape(-1),
                "vec_id": np.repeat(ids, nprobe),
                "is_member": np.tile(
                    np.arange(nprobe) == 0, n
                ),
                "embedding": list(np.repeat(m, nprobe, axis=0)),
            }
        )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    expanded = ds.map_batches(expand, batch_format="pandas", batch_size=SIM_BATCH)

    def bucket_topk(part: pd.DataFrame) -> pd.DataFrame:
        # all probe rows of every cluster hashed here; process clusters
        # one at a time, queries in chunks, so peak memory is bounded
        out = []
        for _, grp in part.groupby("cluster", sort=False):
            mem = grp[grp["is_member"].to_numpy()]
            if not len(mem):
                continue
            mem_ids = mem["vec_id"].to_numpy(dtype=np.int64)
            mem_m = np.stack(mem["embedding"].to_numpy())
            q_ids = grp["vec_id"].to_numpy(dtype=np.int64)
            q_rows = grp["embedding"].to_numpy()  # object array, no densify
            for lo in range(0, len(q_ids), query_chunk):
                qi = q_ids[lo:lo + query_chunk]
                # densify ONE chunk at a time — stacking the whole
                # bucket up front would allocate O(bucket x dim) for the
                # queries too, breaking the documented memory bound on
                # skewed clusters
                sims = np.stack(q_rows[lo:lo + query_chunk]) @ mem_m.T
                sims[qi[:, None] == mem_ids[None, :]] = -np.inf  # self
                take = min(k, sims.shape[1])
                idx = np.argpartition(-sims, take - 1, axis=1)[:, :take] \
                    if take < sims.shape[1] else np.tile(np.arange(sims.shape[1]), (len(qi), 1))
                top = np.take_along_axis(sims, idx, axis=1)
                finite = np.isfinite(top)
                out.append(pd.DataFrame({
                    "vec_id": np.repeat(qi, take)[finite.reshape(-1)],
                    "sim": top.reshape(-1)[finite.reshape(-1)],
                }))
        if not out:
            return pd.DataFrame({"vec_id": np.array([], dtype=np.int64),
                                 "sim": np.array([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    from dataflow_mm_ray.partition import partition_map

    partials = partition_map(expanded, "cluster", bucket_topk)

    def merge_topk(part: pd.DataFrame) -> pd.DataFrame:
        # global top-k per vec_id over the per-bucket partials (raw
        # float sims, same tie-insensitivity argument as knn_sum: equal
        # raw values give equal nano contributions)
        part = part.sort_values(["vec_id", "sim"], ascending=[True, False],
                                kind="mergesort")
        top = part.groupby("vec_id", sort=False).head(k)
        nano = np.rint(top["sim"].to_numpy() * 1e9).astype(np.int64)
        agg = pd.DataFrame({"vec_id": top["vec_id"].to_numpy(), "nano": nano}) \
            .groupby("vec_id", sort=False, as_index=False)["nano"].sum()
        return agg.rename(columns={"nano": "sum_knn_sim_e9"})

    scored = partition_map(partials, "vec_id", merge_topk).materialize()
    from dataflow_mm_ray.stages.percentile import exact_quantile

    thr = exact_quantile(scored, "sum_knn_sim_e9", keep_ratio)
    return scored.map_batches(
        lambda b, thr=thr: b[b["sum_knn_sim_e9"] < thr], batch_format="pandas"
    )
