"""DataTailor score math pinned against a direct transcription of the
paper equations (datatailor_filter.py:169-373), plus end-to-end
selection properties."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.stages.datatailor import (
    agglomerative_cosine,
    sve_informativeness,
    token_matrix,
)


def test_sve_informativeness_matches_reference_math():
    rng = np.random.RandomState(0)
    tok = rng.normal(size=(12, 8)).astype(np.float32)
    # reference loop (datatailor_filter.py:186-210) transcribed
    _, sv, _ = np.linalg.svd(tok.astype(np.float32), full_matrices=False)
    sv = sv[sv > 1e-8]
    p = sv / sv.sum()
    want = -np.sum(p * np.log(p + 1e-10))
    assert sve_informativeness(tok) == pytest.approx(want, rel=0, abs=0)
    # rank-1 matrix -> single singular value -> entropy ~ 0
    one = np.outer(np.ones(6), np.arange(1, 9)).astype(np.float32)
    assert sve_informativeness(one) < 1e-5
    # < 2 tokens -> 0 (reference :191-193)
    assert sve_informativeness(np.ones((1, 8), dtype=np.float32)) == 0.0


def test_token_matrix_shape():
    t = token_matrix(np.arange(64, dtype=np.float32))
    assert t.shape == ((64 - 8) // 4 + 1, 8)
    assert token_matrix(np.arange(4, dtype=np.float32)).shape == (1, 4)


def test_agglomerative_recovers_separated_clusters():
    rng = np.random.RandomState(1)
    a = rng.normal(loc=[10, 0, 0], scale=0.1, size=(10, 3))
    b = rng.normal(loc=[0, 10, 0], scale=0.1, size=(10, 3))
    c = rng.normal(loc=[0, 0, 10], scale=0.1, size=(10, 3))
    mat = np.vstack([a, b, c])
    labels = agglomerative_cosine(mat, 3)
    # each true group maps to exactly one label
    assert len({tuple(labels[i * 10 : (i + 1) * 10]) for i in range(3)}) == 3
    for i in range(3):
        assert len(set(labels[i * 10 : (i + 1) * 10])) == 1
    # deterministic
    assert (agglomerative_cosine(mat, 3) == labels).all()


def test_agglomerative_average_linkage_merge_order():
    # three points on a line (cosine dist): the two closest merge first
    mat = np.array([[1.0, 0.0], [0.99, 0.14], [0.0, 1.0]])
    labels = agglomerative_cosine(mat, 2)
    assert labels[0] == labels[1] != labels[2]


def test_datatailor_select_end_to_end(ray_session):
    from tests.conftest import SF_TINY

    from dataflow_mm_ray.stages.datatailor import datatailor_select

    out = datatailor_select(SF_TINY, keep_ratio=0.8).to_pandas().sort_values("vec_id")
    n = len(out)
    assert n == 500
    assert int(out["selected"].sum()) == max(1, int(n * 0.8))
    # metrics present and finite
    for c in ("informativeness", "uniqueness", "representativeness", "score"):
        assert np.isfinite(out[c]).all()
    # selection == top rows by (score, vec_id) ordering
    order = out.sort_values(["score", "vec_id"]).reset_index(drop=True)
    n_sel = int(out["selected"].sum())
    assert set(order.iloc[len(order) - n_sel :]["vec_id"]) == set(
        out.loc[out["selected"], "vec_id"]
    )
    # deterministic across runs
    again = datatailor_select(SF_TINY, keep_ratio=0.8).to_pandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), again.reset_index(drop=True))


def test_uniqueness_representativeness_formulas(ray_session):
    """Pin the per-cluster math against a direct transcription of eqs.
    4-6 on a tiny fixture run through the full pipeline with one
    stratum (sample == full set -> exact agglomerative labels)."""
    import ray.data as rd

    from dataflow_mm_ray.stages.datatailor import datatailor_select

    rng = np.random.RandomState(7)
    n, d = 40, 16
    mat = rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": [mat[i] for i in range(n)]})
    out = (
        datatailor_select("", keep_ratio=0.5, ds=rd.from_pandas(df))
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )

    # transcription of the reference math
    from dataflow_mm_ray.stages.datatailor import agglomerative_cosine as agg
    from dataflow_mm_ray.stages.datatailor import sve_informativeness as sve
    from dataflow_mm_ray.stages.datatailor import token_matrix as tm

    inf = np.array([sve(tm(mat[i])) for i in range(n)])
    n_clusters = min(max(2, int(n * 0.1)), n // 2)
    labels = agg(mat, n_clusters)
    # centroid assignment step maps every row to its nearest sample-
    # clustering centroid; with sample == full set that is labels itself
    cents = np.stack([mat[labels == c].mean(axis=0) for c in range(labels.max() + 1)])
    cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-8)
    mn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
    assign = np.argmax(mn @ cn.T, axis=1)

    uni = np.zeros(n)
    rep = np.zeros(n)
    mcent = np.stack(
        [mat[assign == c].mean(axis=0) if (assign == c).any() else np.zeros(d)
         for c in range(assign.max() + 1)]
    )
    mcent = mcent / (np.linalg.norm(mcent, axis=1, keepdims=True) + 1e-8)
    sims = mcent @ mcent.T
    k = len(mcent)
    for c in range(k):
        idx = np.where(assign == c)[0]
        if len(idx) == 0:
            continue
        w = inf[idx] / inf[idx].sum() if inf[idx].sum() > 0 else np.ones(len(idx)) / len(idx)
        if len(idx) > 1:
            feats = mat[idx]
            dm = np.linalg.norm(feats[:, None, :] - feats[None, :, :], axis=2)
            np.fill_diagonal(dm, 0.0)
            uni[idx] = dm @ w
        other = np.delete(sims[c], c)
        tau = np.exp(other).sum() / (k - 1)
        rep[idx] = tau * w

    np.testing.assert_allclose(out["informativeness"].to_numpy(), inf, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out["uniqueness"].to_numpy(), uni, rtol=0, atol=1e-9)
    np.testing.assert_allclose(out["representativeness"].to_numpy(), rep, rtol=0, atol=1e-12)


def test_cluster_uniqueness_matches_naive_broadcast():
    """Gram-identity chunked kernel == the naive (g, g, d)
    broadcast-subtract form (the pre-fix implementation)."""
    from dataflow_mm_ray.stages.datatailor import cluster_uniqueness

    rng = np.random.default_rng(11)
    for g, d in [(1, 8), (2, 8), (37, 16), (300, 64)]:
        feats = rng.normal(size=(g, d))
        w = rng.random(g)
        w = w / w.sum()
        got = cluster_uniqueness(feats, w, chunk_bytes=1 << 12)  # force many chunks
        if g <= 1:
            naive = np.zeros(g)
        else:
            dist = np.linalg.norm(feats[:, None, :] - feats[None, :, :], axis=2)
            np.fill_diagonal(dist, 0.0)
            naive = dist @ w
        np.testing.assert_allclose(got, naive, rtol=0, atol=1e-9)


def test_cluster_uniqueness_giant_cluster_bounded_memory():
    """A 30k-member, 128-dim cluster: the naive broadcast would allocate
    a (30k, 30k, 128) float64 array (~900 TB); the chunked Gram kernel
    peaks at chunk_bytes. Verify a row sample against brute force."""
    from dataflow_mm_ray.stages.datatailor import cluster_uniqueness

    rng = np.random.default_rng(5)
    g, d = 30_000, 128
    feats = rng.normal(size=(g, d)).astype(np.float64)
    w = np.full(g, 1.0 / g)
    uni = cluster_uniqueness(feats, w, chunk_bytes=16 << 20)
    assert uni.shape == (g,) and np.isfinite(uni).all()
    for i in (0, 123, g - 1):
        brute = (np.linalg.norm(feats - feats[i], axis=1) * w).sum()
        np.testing.assert_allclose(uni[i], brute, rtol=0, atol=1e-9)


def test_datatailor_select_skewed_half_cluster(ray_session):
    """VERDICT r3 item 2: one cluster holding ~50% of the vectors at 10x
    the tiny sf must complete without a worker OOM and with correct
    uniqueness on the hot cluster."""
    import ray as _ray

    from dataflow_mm_ray.stages.datatailor import datatailor_select

    rng = np.random.default_rng(3)
    n, d = 5_000, 32
    hot = rng.normal(loc=0.0, scale=0.01, size=(n // 2, d)) + np.eye(d)[0] * 10
    rest = rng.normal(size=(n - n // 2, d))
    mat = np.vstack([hot, rest])
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(mat)})
    ds = _ray.data.from_pandas(df)
    out = datatailor_select(None, keep_ratio=0.5, ds=ds).to_pandas()
    assert len(out) == n
    assert int(out["selected"].sum()) == n // 2
    assert np.isfinite(out["uniqueness"]).all()
