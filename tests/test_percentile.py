"""Distributed exact quantile == np.percentile / DuckDB quantile_cont."""
import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("q", [0.0, 0.3, 0.5, 0.6, 0.7, 0.9999, 1.0])
def test_exact_quantile_matches_numpy(ray_session, q):
    import ray.data as rd

    from dataflow_mm_ray.stages.percentile import exact_quantile

    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.normal(100, 30, 5000), rng.choice([1.0, 2.0, 3.0], 500), [np.pi] * 7]
    )
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    got = exact_quantile(ds, "v", q, n_buckets=16, small_cutoff=64)
    want = float(np.quantile(vals, q))
    assert got == want  # bit-exact


def test_exact_quantile_integer_scores(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.percentile import exact_quantile

    vals = np.arange(0, 1001, dtype=np.int64) * 7
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    assert exact_quantile(ds, "v", 0.6) == float(np.quantile(vals, 0.6))


def test_exact_quantile_all_equal(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.percentile import exact_quantile

    ds = rd.from_pandas(pd.DataFrame({"v": np.full(100, 42.5)}))
    assert exact_quantile(ds, "v", 0.37) == 42.5
