"""HyperLogLog distinct-count sketch (stages/sketch.py)."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.stages.sketch import HLL_P, hll_estimate, hll_merge, hll_partial

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("n", [0, 1, 50, 5_000, 200_000])
def test_estimate_within_error_bound(n):
    vals = np.array([f"v{i}" for i in range(n)], dtype=object)
    est = hll_estimate(hll_partial(vals))
    if n == 0:
        assert est == 0
    else:
        rel = abs(est - n) / n
        assert rel < 0.05, (n, est)  # 1.04/sqrt(2^14) ~ 0.8%; 5% ceiling


def test_merge_equals_union_and_is_order_free():
    a = np.array([f"a{i}" for i in range(3000)], dtype=object)
    b = np.array([f"b{i}" for i in range(2000)], dtype=object)
    both = np.concatenate([a, b])
    ra, rb = hll_partial(a), hll_partial(b)
    m1 = hll_merge(ra, rb)
    m2 = hll_merge(rb, ra)
    np.testing.assert_array_equal(m1, m2)
    assert hll_estimate(m1) == hll_estimate(hll_partial(both))
    # idempotent: re-applying a partial never changes the state
    np.testing.assert_array_equal(hll_merge(m1, ra), m1)


def test_duplicates_do_not_inflate():
    vals = np.array(["x", "y", "z"] * 10_000, dtype=object)
    assert hll_estimate(hll_partial(vals)) == 3


def test_query_tracks_exact_twin(ray_session):
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import to_pandas

    reg = registry()
    exact = to_pandas(reg["distinct_props_exact"].fn(SF)).set_index("event_type")["n_distinct"]
    approx = to_pandas(reg["approx_distinct_props"].fn(SF)).set_index("event_type")["approx_distinct"]
    assert set(exact.index) == set(approx.index)
    for et in exact.index:
        n, e = int(exact[et]), int(approx[et])
        assert abs(e - n) / max(n, 1) < 0.05, (et, n, e)
    # determinism at a different parallelism
    approx2 = to_pandas(reg["approx_distinct_props"].fn(SF)).set_index("event_type")["approx_distinct"]
    assert approx.sort_index().tolist() == approx2.sort_index().tolist()
