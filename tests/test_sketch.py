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


def test_windowed_sketch_tracks_exact(ray_session):
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import to_pandas

    reg = registry()
    exact = to_pandas(reg["window_distinct_convs_exact"].fn(SF))
    exact["window_start_us"] = exact["window_start"].astype("datetime64[us]").astype("int64")
    exact = exact.set_index("window_start_us")["n_convs"]
    approx = to_pandas(reg["window_distinct_convs"].fn(SF)).set_index("window_start_us")[
        "approx_distinct_convs"
    ]
    assert set(exact.index) == set(approx.index)
    # p=12 -> ~1.6% stderr; these windows hold <= 15 convs, where HLL
    # linear counting is essentially exact
    for w in exact.index:
        assert abs(int(approx[w]) - int(exact[w])) <= max(1, int(0.05 * exact[w]))


def test_windowed_sketch_stream_equals_batch(ray_session, tmp_path):
    """The streamed wdistinct output at infinite lateness equals the
    batch HLL twin bit-for-bit (max-merge is order/partition-free and
    the estimate is deterministic)."""
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts
    from dataflow_mm_ray.testing import to_pandas

    tp = prepare_transcripts(SF, str(tmp_path / "t"), n_epochs=3)
    eng = StreamingEngine(tp, str(tmp_path / "o"), n_epochs=3, n_shards=3,
                          lateness_s=10**9)
    eng.run()
    got = eng.results()["wdistinct"].sort_values("window_start_us").reset_index(drop=True)
    want = (
        to_pandas(registry()["window_distinct_convs"].fn(SF))
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)


def test_hll_md5_sql_matches_engine_at_any_p():
    """The SQL builder must track the engine precision exactly — at
    p=12 two values can share a 12-bit register while splitting at
    p=14 (the sf0.01 regression), so the estimate is p-sensitive."""
    import duckdb
    import numpy as np
    import pandas as pd

    from dataflow_mm_ray.functions.hll_sql import hll_md5_estimate_sql
    from dataflow_mm_ray.stages.sketch import (
        _ranks,
        hll_estimate_sqlexact,
        md5_hash64,
    )

    vals = np.array([f"conv-{i:06d}" for i in range(300)], dtype=object)
    groups = np.array([f"g{i % 7}" for i in range(300)], dtype=object)
    con = duckdb.connect()
    df = pd.DataFrame({"g": groups, "v": vals})
    con.register("pairs", df)
    for p in (10, 12, 14):
        want = {}
        for g in sorted(set(groups)):
            regs = np.zeros(1 << p, dtype=np.uint8)
            idx, rank = _ranks(md5_hash64(vals[groups == g]), p)
            np.maximum.at(regs, idx, rank.astype(np.uint8))
            want[g] = hll_estimate_sqlexact(regs)
        sql = "WITH " + hll_md5_estimate_sql(
            "SELECT DISTINCT g, v FROM pairs", "g", "grp", "est", p=p
        )
        got = dict(con.execute(sql).fetchall())
        assert got == want, (p, got, want)
