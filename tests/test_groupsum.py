"""group_sum must be a drop-in for pandas groupby().sum() up to row order."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.groupsum import group_sum, group_sum_df


def _ref(df, keys, vals):
    return (
        df.groupby(keys, as_index=False, sort=False)[vals]
        .sum()
        .sort_values(keys, ignore_index=True)
    )


def _got(df, keys, vals):
    out = group_sum_df(df, keys, vals)
    return out.sort_values(keys, ignore_index=True)


@pytest.mark.parametrize("n,nconv", [(0, 1), (1, 1), (1000, 7), (20000, 2000), (5000, 5000)])
def test_matches_pandas(n, nconv):
    rng = np.random.default_rng(42)
    df = pd.DataFrame(
        {
            "conv_id": np.array([f"c{i}" for i in rng.integers(0, nconv, n)]),
            "w": rng.integers(0, 50, n) * 3_600_000_000,
            "a": rng.integers(-100, 100, n).astype(np.int64),
            "b": rng.integers(0, 10, n).astype(np.int64),
        }
    )
    got = _got(df, ["conv_id", "w"], ["a", "b"])
    ref = _ref(df, ["conv_id", "w"], ["a", "b"])
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_single_key_and_dtypes():
    df = pd.DataFrame({"k": np.array([3, 1, 3, 1, 2], dtype=np.int64),
                       "v": np.array([1, 2, 3, 4, 5], dtype=np.int64)})
    got = _got(df, ["k"], ["v"])
    assert got["v"].dtype == np.int64
    assert got["k"].dtype == np.int64
    pd.testing.assert_frame_equal(got, _ref(df, ["k"], ["v"]), check_exact=True)


def test_huge_values_stay_exact():
    # per-column |sum| above 2**52 forces the unbuffered int64 path
    big = np.int64(2**53 + 1)
    df = pd.DataFrame({"k": ["a", "a", "b"], "v": np.array([big, 1, big], dtype=np.int64)})
    got = _got(df, ["k"], ["v"])
    assert got.loc[got["k"] == "a", "v"].iloc[0] == big + 1  # would round to big in f64
    assert got.loc[got["k"] == "b", "v"].iloc[0] == big


def test_float_values_pass_through():
    df = pd.DataFrame({"k": ["a", "b", "a"], "v": np.array([0.5, 1.5, 2.0])})
    got = _got(df, ["k"], ["v"])
    assert got["v"].dtype == np.float64
    assert got["v"].tolist() == [2.5, 1.5]


def test_deterministic_order():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"k1": np.array([f"c{i}" for i in rng.integers(0, 50, 500)]),
         "k2": rng.integers(0, 20, 500), "v": np.ones(500, dtype=np.int64)}
    )
    a = group_sum_df(df, ["k1", "k2"], ["v"])
    b = group_sum_df(df, ["k1", "k2"], ["v"])
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_empty_input_schema():
    out = group_sum(
        {"k": np.array([], dtype=object)}, {"v": np.array([], dtype=np.int64)}
    )
    assert list(out.columns) == ["k", "v"]
    assert out["v"].dtype == np.int64 and len(out) == 0
