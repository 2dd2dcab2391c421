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
