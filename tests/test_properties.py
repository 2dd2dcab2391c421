"""Property-based invariants for the pure kernels (hypothesis, no Ray
session needed — these exercise the per-partition kernels directly)."""
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=60, deadline=None)


def _turns(conv_ids, ts_offsets):
    n = len(ts_offsets)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    for i in range(n):
        c = f"conv-{conv_ids[i] % 3:06d}"
        rows.append((c, 0, "user", "x" * (1 + i % 5), None,
                     base + np.timedelta64(int(ts_offsets[i]), "s")))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df = df.sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
    df["turn_idx"] = df.groupby("conv_id", sort=False).cumcount().astype(np.int32)
    return df


@settings(**SETTINGS)
@given(
    conv_ids=st.lists(st.integers(0, 2), min_size=1, max_size=40),
    offs=st.lists(st.integers(0, 50_000), min_size=1, max_size=40),
)
def test_tumbling_partition_of_rows(conv_ids, offs):
    """Every turn lands in exactly one tumbling window: per-conv window
    counts sum to the turn count; sum_chars is conserved."""
    from dataflow_mm_ray.stages.windows import tumbling_window_kernel

    n = min(len(conv_ids), len(offs))
    df = _turns(conv_ids[:n], offs[:n])
    out = tumbling_window_kernel(df, 3600)
    assert out["n_turns"].sum() == len(df)
    assert out["sum_chars"].sum() == df["text"].str.len().sum()
    # windows are aligned to the width
    us = out["window_start"].astype("datetime64[us]").astype(np.int64)
    assert (us % (3600 * 1_000_000) == 0).all()


@settings(**SETTINGS)
@given(
    conv_ids=st.lists(st.integers(0, 2), min_size=1, max_size=40),
    offs=st.lists(st.integers(0, 200_000), min_size=1, max_size=40),
    gap_s=st.integers(1, 7200),
)
def test_sessions_partition_and_gap_invariant(conv_ids, offs, gap_s):
    """Sessions partition a conversation's turns; consecutive sessions
    of one conv are separated by more than gap_s; within-session span
    fits duration_us."""
    from dataflow_mm_ray.stages.windows import session_window_kernel

    n = min(len(conv_ids), len(offs))
    df = _turns(conv_ids[:n], offs[:n])
    out = session_window_kernel(df, gap_s)
    assert out["n_turns"].sum() == len(df)
    for conv, g in out.groupby("conv_id"):
        g = g.sort_values("session_id")
        starts = g["session_start"].astype("datetime64[us]").astype(np.int64).to_numpy()
        ends = g["session_end"].astype("datetime64[us]").astype(np.int64).to_numpy()
        assert (ends >= starts).all()
        assert (g["duration_us"].to_numpy() == ends - starts).all()
        if len(g) > 1:
            assert (starts[1:] - ends[:-1] > gap_s * 1_000_000).all()
        # 0-based contiguous session ids
        assert list(g["session_id"]) == list(range(len(g)))


@settings(**SETTINGS)
@given(
    segs=st.lists(
        st.tuples(st.integers(0, 10**7), st.integers(-1000, 10**7)),
        min_size=0, max_size=30,
    ),
    sr=st.integers(0, 5000),
    er=st.integers(0, 5000),
    mn=st.integers(0, 20000),
    mx=st.integers(1, 50000),
)
def test_trim_split_chunk_invariants(segs, sr, er, mn, mx):
    """Chunks stay inside their trimmed segment, never exceed max (when
    max >= min), and each is >= min except the reference's zero-length
    exact-multiple boundary case."""
    from dataflow_mm_ray.stages.scenes import trim_split_kernel

    mx_eff = max(mn, mx)
    seg = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(segs))],
            "session_id": np.arange(len(segs), dtype=np.int32),
            "start_us": np.asarray([s for s, _ in segs], dtype=np.int64),
            "end_us": np.asarray([s + d for s, d in segs], dtype=np.int64),
        }
    )
    out = trim_split_kernel(seg, sr, er, mn, mx)
    for _, r in out.iterrows():
        i = int(r["session_id"])
        s, d = segs[i]
        ns, ne = s + sr, s + d - er
        assert ns <= r["chunk_start_us"] <= r["chunk_end_us"] <= ne
        length = r["chunk_end_us"] - r["chunk_start_us"]
        assert length <= mx_eff
        assert length >= mn or (length == 0 and mn == 0)


@settings(**SETTINGS)
@given(vals=st.lists(st.floats(-1e9, 1e9, allow_nan=False), min_size=1, max_size=200),
       q=st.floats(0, 1))
def test_lerp_quantile_formula(vals, q):
    """The _kth_value + _lerp composition over a plain sorted array
    must equal np.quantile (the distributed version is pinned
    elsewhere; this fuzzes the pure arithmetic)."""
    import math

    from dataflow_mm_ray.stages.percentile import _lerp

    v = np.sort(np.asarray(vals, dtype=np.float64))
    h = q * (len(v) - 1)
    k0 = int(math.floor(h))
    frac = h - k0
    v0 = float(v[k0])
    v1 = float(v[min(k0 + 1, len(v) - 1)]) if frac else v0
    got = v0 if frac == 0.0 else _lerp(v0, v1, frac)
    assert got == float(np.quantile(v, q))


@settings(**SETTINGS)
@given(texts=st.lists(st.text(alphabet="ab c", max_size=20), min_size=1, max_size=30))
def test_simhash_popcount_consistency(texts):
    """Vectorized popcount == python bit_count; simhash deterministic."""
    from dataflow_mm_ray.stages.neardup import _popcount64, hamming64, simhash64

    sigs = np.asarray([simhash64(t) for t in texts], dtype=np.uint64)
    pc = _popcount64(sigs[:, None] ^ sigs[None, :])
    for i in range(len(sigs)):
        for j in range(len(sigs)):
            assert pc[i, j] == hamming64(sigs[i], sigs[j])
