"""Salted repartition: results identical to unsalted groupby; hot keys
actually spread across sub-partitions; salting is replay-stable."""
import numpy as np
import pandas as pd

from dataflow_mm_ray.hashing import partition_ids
from dataflow_mm_ray.salting import add_salt, salted_aggregate


def _skewed_df(n_hot=5000, n_cold=2000):
    rng = np.random.RandomState(3)
    hot = pd.DataFrame(
        {"conv_id": "conv-hot", "turn_idx": np.arange(n_hot), "chars": rng.randint(1, 100, n_hot)}
    )
    cold = pd.DataFrame(
        {
            "conv_id": [f"conv-{i % 97:04d}" for i in range(n_cold)],
            "turn_idx": np.arange(n_cold),
            "chars": rng.randint(1, 100, n_cold),
        }
    )
    return pd.concat([hot, cold], ignore_index=True)


def test_salt_spreads_hot_key_and_is_stable():
    df = _skewed_df()
    salted = add_salt(df, "conv_id", frozenset(["conv-hot"]), "turn_idx", 8)
    hot_parts = salted.loc[salted["conv_id"] == "conv-hot", "__salted"].unique()
    assert len(hot_parts) == 8  # spread across all salts
    assert (salted.loc[salted["conv_id"] != "conv-hot", "__salt"] == 0).all()  # cold: no salt
    # a cold key's rows all share one partition key (never split)
    per_key = salted[salted["conv_id"] != "conv-hot"].groupby("conv_id")["__salted"].nunique()
    assert (per_key == 1).all()
    again = add_salt(df, "conv_id", frozenset(["conv-hot"]), "turn_idx", 8)
    assert (salted["__salted"] == again["__salted"]).all()  # replay-stable
    # salted sub-keys land in different hash partitions
    pids = set(partition_ids(np.asarray(hot_parts), 64))
    assert len(pids) > 1


def test_salted_aggregate_key_with_delimiter_chars(ray_session):
    """Keys containing '#' (or any delimiter) must group correctly —
    the salt is carried as a separate int column, never round-tripped
    through a delimited string."""
    import ray.data as rd

    df = pd.DataFrame(
        {
            "conv_id": ["a#1", "a#1", "a#1#2", "plain"] * 50,
            "turn_idx": np.arange(200),
            "chars": np.ones(200, dtype=np.int64),
        }
    )
    out = salted_aggregate(
        rd.from_pandas(df),
        "conv_id",
        {"n": ("turn_idx", "count"), "s": ("chars", "sum")},
        hot_keys=["a#1"],
        salt_from="turn_idx",
        n_salts=4,
        num_partitions=8,
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = (
        df.groupby("conv_id", as_index=False)
        .agg(n=("turn_idx", "size"), s=("chars", "sum"))
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["conv_id", "n", "s"]], want, check_dtype=False)


def test_salted_aggregate_matches_unsalted(ray_session):
    import ray.data as rd

    df = _skewed_df()
    out = salted_aggregate(
        rd.from_pandas(df),
        "conv_id",
        {"n_turns": ("turn_idx", "count"), "sum_chars": ("chars", "sum"),
         "max_chars": ("chars", "max")},
        hot_keys=["conv-hot"],
        salt_from="turn_idx",
        n_salts=8,
        num_partitions=16,
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = (
        df.groupby("conv_id", as_index=False)
        .agg(n_turns=("turn_idx", "size"), sum_chars=("chars", "sum"), max_chars=("chars", "max"))
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["conv_id", "n_turns", "sum_chars", "max_chars"]], want, check_dtype=False
    )
