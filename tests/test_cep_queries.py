"""Every registered query with an oracle must match DuckDB row-for-row
at sf0.001 (the driver repeats this at sf0.01)."""
import pytest

from tests.conftest import SF_TINY


def _registry():
    from dataflow_mm_ray.queries import registry

    return registry()


@pytest.mark.parametrize("name", sorted(_registry()))
def test_query_matches_oracle(name, ray_session, oracle):
    from dataflow_mm_ray.testing import assert_matches_oracle, canon, to_pandas

    q = _registry()[name]
    if q.sql is None:
        got = to_pandas(q.fn(SF_TINY))
        assert len(got) >= 0  # rows-only smoke; semantics tested elsewhere
        return
    assert_matches_oracle(q.fn(SF_TINY), oracle, q.sql)


def test_fast_derivation_matches_full_derivation():
    """_events_to_turns_fast must equal _events_to_turns row-for-row on
    every column except text -> text_len (len(text), 0 for NULL),
    including NULL event_type/props and 7+-digit user ids."""
    import numpy as np
    import pandas as pd

    from dataflow_mm_ray.sources.transcripts import (
        _events_to_turns,
        _events_to_turns_fast,
    )

    rng = np.random.RandomState(9)
    n = 500
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**9, n), unit="s"),
            "user_id": rng.choice([3, 77, 999999, 1000000, 12345678], n).astype(np.int64),
            "event_type": rng.choice(["click", "view", None], n),
            "props": rng.choice(['{"a":1}', "", None], n),
        }
    )
    full = _events_to_turns(ev.copy()).reset_index(drop=True)
    fast = _events_to_turns_fast(ev.copy()).reset_index(drop=True)
    for col in ("conv_id", "turn_idx", "role", "tool", "ts"):
        pd.testing.assert_series_equal(full[col], fast[col], check_names=False)
    want_len = full["text"].str.len().fillna(0).astype(np.int64)
    pd.testing.assert_series_equal(
        want_len, fast["text_len"].astype(np.int64), check_names=False
    )
    # empty input keeps the schema
    assert list(_events_to_turns_fast(ev.iloc[:0]).columns) == [
        "conv_id", "turn_idx", "role", "text_len", "tool", "ts",
    ]
