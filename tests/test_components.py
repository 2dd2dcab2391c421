"""Connected-components duplicate clustering (stages/components.py)."""
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_TINY


def _uf_components(n_nodes_or_ids, edges):
    """Pure-python union-find reference: node -> min id of component."""
    ids = list(n_nodes_or_ids)
    parent = {v: v for v in ids}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in ids}


def _run_cc(ray_session, edges, num_partitions=5):
    import ray.data as rd

    from dataflow_mm_ray.stages.components import connected_components

    df = pd.DataFrame({"lo": [a for a, _ in edges], "hi": [b for _, b in edges]},
                      dtype=np.int64)
    out = connected_components(rd.from_pandas(df), num_partitions=num_partitions)
    return out.to_pandas().sort_values("node").reset_index(drop=True)


def test_cc_chain_converges_logarithmically(ray_session):
    # a 200-node path graph: plain min-propagation needs 200 rounds;
    # pointer jumping must land it within the 64-round budget
    edges = [(i, i + 1) for i in range(200)]
    out = _run_cc(ray_session, edges)
    assert (out["comp"] == 0).all()
    assert len(out) == 201


def test_cc_matches_union_find_on_random_graphs(ray_session):
    rng = np.random.RandomState(11)
    for trial in range(3):
        n = 120
        # sparse random graph over sparse ids (non-contiguous, large)
        ids = np.unique(rng.randint(0, 10**12, size=2 * n).astype(np.int64))[:n]
        m = 90 + trial * 30
        ai = rng.randint(0, n, size=m)
        bi = rng.randint(0, n, size=m)
        keep = ai != bi
        edges = list(zip(ids[ai[keep]].tolist(), ids[bi[keep]].tolist()))
        out = _run_cc(ray_session, edges)
        touched = sorted({a for a, _ in edges} | {b for _, b in edges})
        want = _uf_components(touched, edges)
        got = dict(zip(out["node"].tolist(), out["comp"].tolist()))
        assert got == want


def test_cc_partition_invariance(ray_session):
    rng = np.random.RandomState(3)
    edges = [(int(rng.randint(0, 60)), int(rng.randint(0, 60))) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    a = _run_cc(ray_session, edges, num_partitions=2)
    b = _run_cc(ray_session, edges, num_partitions=13)
    pd.testing.assert_frame_equal(a, b)


def test_dup_clusters_matches_oracle(ray_session, oracle):
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import assert_matches_oracle

    q = registry()["dup_clusters"]
    got = assert_matches_oracle(q.fn(SF_TINY), oracle, q.sql)
    # sanity: first-wins dedup and clustering agree on who is a duplicate:
    # keep == False iff some earlier doc shares the cluster, i.e. doc_id
    # != cluster_id exactly when the doc has an earlier near-dup partner
    keep = registry()["ngram_jaccard_dedup"]
    from dataflow_mm_ray.testing import to_pandas

    kd = to_pandas(keep.fn(SF_TINY)).set_index("doc_id")["keep"]
    merged = got.set_index("doc_id")
    dup_by_cluster = merged.index.to_numpy() != merged["cluster_id"].to_numpy()
    assert (dup_by_cluster == ~kd.loc[merged.index].to_numpy()).all()


def test_dup_clusters_partition_invariance(ray_session):
    from dataflow_mm_ray.stages.components import ngram_dup_clusters
    from dataflow_mm_ray.testing import to_pandas

    a = to_pandas(ngram_dup_clusters(SF_TINY, num_partitions=3)).sort_values(
        "doc_id").reset_index(drop=True)
    b = to_pandas(ngram_dup_clusters(SF_TINY, num_partitions=16)).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dup_clusters_exact_group_expansion(ray_session):
    """Exact duplicates (identical text) collapse to one representative
    in the engine but must land in the SAME cluster with the full
    member count — including transitive merges through a near-dup
    bridge between two exact groups."""
    import ray.data as rd

    from dataflow_mm_ray.stages.components import ngram_dup_clusters
    from dataflow_mm_ray.testing import to_pandas

    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"  # high word-3-gram overlap
    far = "one completely different unrelated document text here now"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(7, dtype=np.int64),
            "text": [base, base, near, near, far, "", ""],
        }
    )
    out = to_pandas(
        ngram_dup_clusters("", ds=rd.from_pandas(docs), num_partitions=4)
    ).sort_values("doc_id").reset_index(drop=True)
    # 0,1 exact group; 2,3 exact group; base~near bridges them -> one
    # cluster of 4 rooted at 0
    assert out.loc[[0, 1, 2, 3], "cluster_id"].tolist() == [0, 0, 0, 0]
    assert out.loc[[0, 1, 2, 3], "cluster_size"].tolist() == [4, 4, 4, 4]
    # far doc: singleton
    assert out.loc[4, "cluster_id"] == 4 and out.loc[4, "cluster_size"] == 1
    # identical EMPTY docs never cluster (no shingles, no evidence)
    assert out.loc[5, "cluster_id"] == 5 and out.loc[5, "cluster_size"] == 1
    assert out.loc[6, "cluster_id"] == 6 and out.loc[6, "cluster_size"] == 1


def test_cc_nonconvergence_guard(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.components import connected_components

    df = pd.DataFrame({"lo": [0, 1], "hi": [1, 2]}, dtype=np.int64)
    with pytest.raises(RuntimeError):
        connected_components(rd.from_pandas(df), num_partitions=2, max_rounds=0)


def test_dup_cluster_canonical_matches_oracle(ray_session, oracle):
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import assert_matches_oracle

    q = registry()["dup_cluster_canonical"]
    got = assert_matches_oracle(q.fn(SF_TINY), oracle, q.sql)
    # exactly one keeper per cluster, and it is a longest member
    g = got.groupby("cluster_id")["keep"].sum()
    assert (g == 1).all()
    assert got["keep"].sum() == got["cluster_id"].nunique()


def test_minhash_dup_clusters_refine_exact(ray_session):
    """Every MinHash-LSH cluster must be CONTAINED in an exact n-gram
    Jaccard cluster at the same threshold (edges are Jaccard-verified
    over the same shingle sets, so LSH can only split, never merge),
    restricted to non-empty docs (the two operators' documented
    empty-text conventions differ). Also partition-invariant."""
    import pyarrow.parquet as pq

    from dataflow_mm_ray.stages.components import minhash_dup_clusters, ngram_dup_clusters
    from dataflow_mm_ray.testing import to_pandas

    mh = to_pandas(minhash_dup_clusters(SF_TINY, threshold=0.7, num_partitions=5))
    ex = to_pandas(ngram_dup_clusters(SF_TINY, threshold=0.7, num_partitions=5))
    docs = pq.read_table(SF_TINY + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    nonempty = set(docs.loc[docs["text"].fillna("").str.strip() != "", "doc_id"])
    mh = mh[mh["doc_id"].isin(nonempty)]
    m = mh.merge(ex[["doc_id", "cluster_id"]], on="doc_id", suffixes=("_mh", "_ex"))
    # containment: all members of one mh cluster share one exact cluster
    g = m.groupby("cluster_id_mh")["cluster_id_ex"].nunique()
    assert (g == 1).all()
    # at tiny scale LSH recall is 1 here: the clusterings agree exactly
    assert (m["cluster_id_mh"] == m["cluster_id_ex"]).all()

    b = to_pandas(minhash_dup_clusters(SF_TINY, threshold=0.7, num_partitions=16))
    a = to_pandas(minhash_dup_clusters(SF_TINY, threshold=0.7, num_partitions=3))
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
