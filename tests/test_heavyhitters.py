"""Heavy hitters: MG truncation invariants, the superset guarantee
under arbitrary batching, and batching/partition invariance of the
final exact output."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.stages.heavyhitters import mg_truncate


def test_mg_truncate_invariants():
    rng = np.random.default_rng(3)
    for _ in range(50):
        n_items = int(rng.integers(1, 200))
        counts = rng.integers(1, 1000, size=n_items).astype(np.int64)
        items = np.array([f"t{i}" for i in range(n_items)], dtype=object)
        k = int(rng.integers(1, 50))
        it, ct = mg_truncate(items, counts, k)
        assert len(it) <= k
        assert (ct > 0).all()
        if n_items > k:
            pivot = np.sort(counts)[::-1][k]
            # the MG error bound is PER ITEM: each item's undercount is
            # at most the pivot, and (k+1)*pivot <= total weight
            assert (k + 1) * pivot <= counts.sum()
            retained = dict(zip(it, ct))
            for t, c in zip(items, counts):
                under = c - retained.get(t, 0)
                assert 0 <= under <= pivot
        else:
            assert len(it) == n_items


def _zipf_stream(rng, n, n_items=500, a=1.3):
    vals = rng.zipf(a, size=n)
    vals = np.minimum(vals, n_items)
    return np.array([f"w{v}" for v in vals], dtype=object)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("num,den,k", [(1, 100, 199), (1, 50, 120), (3, 100, 80)])
def test_guarantee_under_arbitrary_batching(seed, num, den, k):
    """Simulate pass 1 with random batch splits: the candidate set must
    contain every true heavy hitter, and the exact cut must equal the
    plain value_counts answer — for ANY batching."""
    rng = np.random.default_rng(seed)
    stream = _zipf_stream(rng, 20_000)
    n = len(stream)
    truth = pd.Series(stream).value_counts()
    want = set(truth[truth * den > n * num].index)

    # random batching
    cuts = np.sort(rng.choice(np.arange(1, n), size=rng.integers(3, 40), replace=False))
    batches = np.split(stream, cuts)
    lower: dict[str, int] = {}
    for b in batches:
        if not len(b):
            continue
        items, counts = np.unique(b, return_counts=True)
        it, ct = mg_truncate(items.astype(object), counts.astype(np.int64), k)
        for t, c in zip(it, ct):
            lower[t] = lower.get(t, 0) + int(c)
    cand = {t for t, c in lower.items()
            if c * den * (k + 1) > n * (num * (k + 1) - den)}
    assert want <= cand, f"superset guarantee violated: {want - cand}"
    # constant bound on the candidate blow-up
    assert len(cand) <= den * (k + 1) / (num * (k + 1) - den) + 1
    # pass 2: exact verify over candidates reproduces the truth
    got = {t for t in cand if truth.get(t, 0) * den > n * num}
    assert got == want


def test_query_invariance_and_values(ray_session):
    import ray

    from dataflow_mm_ray.stages.heavyhitters import heavy_hitters, whitespace_tokens

    rng = np.random.default_rng(9)
    stream = _zipf_stream(rng, 30_000, n_items=800, a=1.2)
    # pack tokens into documents of random lengths
    cuts = np.sort(rng.choice(np.arange(1, len(stream)), size=999, replace=False))
    texts = [" ".join(x) for x in np.split(stream, cuts)]
    df = pd.DataFrame({"text": texts})
    n = len(stream)
    truth = pd.Series(stream).value_counts()
    want = (truth[truth * 400 > n * 1]
            .rename_axis("token").reset_index(name="cnt")
            .sort_values("token").reset_index(drop=True))
    want["cnt"] = want["cnt"].astype(np.int64)
    assert len(want) > 3  # the fixture must exercise a non-trivial cut

    outs = []
    for nblocks, nparts in ((4, 3), (17, 11)):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = heavy_hitters(ds, whitespace_tokens, 1, 400, k=500,
                            num_partitions=nparts).to_pandas()
        outs.append(out.sort_values("token").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    pd.testing.assert_frame_equal(outs[0], want, check_exact=True)


def test_edge_cases(ray_session):
    import ray

    from dataflow_mm_ray.stages.heavyhitters import heavy_hitters, whitespace_tokens

    # empty / null-text input -> empty result, stable schema
    ds = ray.data.from_pandas(pd.DataFrame({"text": [None, "", None]}))
    out = heavy_hitters(ds, whitespace_tokens, 1, 10).to_pandas()
    assert len(out) == 0  # (a 0-row from_pandas Dataset drops the schema)
    # phi too high -> empty
    ds2 = ray.data.from_pandas(pd.DataFrame({"text": ["a b c d e f g h"] * 4}))
    out2 = heavy_hitters(ds2, whitespace_tokens, 9, 10).to_pandas()
    assert len(out2) == 0
    # bad phi
    with pytest.raises(ValueError):
        heavy_hitters(ds2, whitespace_tokens, 10, 10)
    # k below the guarantee threshold
    with pytest.raises(ValueError):
        heavy_hitters(ds2, whitespace_tokens, 1, 100, k=50)
