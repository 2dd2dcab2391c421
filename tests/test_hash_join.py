"""Partitioned hash join: inner/left semantics vs pandas merge,
partition-count invariance, disjoint keys."""
import numpy as np
import pandas as pd
import pytest


def _sides():
    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.randint(0, 50, 300), "lv": np.arange(300)})
    right = pd.DataFrame({"k": rng.randint(25, 75, 200), "rv": np.arange(200) * 10})
    return left, right


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas(ray_session, how):
    import ray.data as rd

    from dataflow_mm_ray.partition import hash_join

    left, right = _sides()
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", how=how,
                    num_partitions=8).to_pandas()
    want = left.merge(right, on="k", how=how, sort=False)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_hash_join_partition_invariance_and_disjoint(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.partition import hash_join

    left, right = _sides()
    a = _canon(hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                         num_partitions=3).to_pandas())
    b = _canon(hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                         num_partitions=32).to_pandas())
    pd.testing.assert_frame_equal(a, b)

    disjoint = pd.DataFrame({"k": [1000, 1001], "rv": [1, 2]})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(disjoint), "k").to_pandas()
    assert len(out) == 0
