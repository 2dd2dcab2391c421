"""Scene trim/split math pinned against a transcription of the
reference loop (video_scene_filter.py:155-203)."""
import numpy as np
import pandas as pd


def _ref_trim_split(pairs, sr, er, mn, mx):
    """Direct transcription of _trim_and_split_scenes (reference loop)."""
    out = []
    total_remove = max(0, sr) + max(0, er)
    mn = max(0, mn)
    mx = max(mn, mx)
    for s, e in pairs:
        if e <= s:
            continue
        duration = e - s
        if duration < total_remove:
            continue
        ns, ne = s + sr, e - er
        if ne <= ns:
            continue
        nd = ne - ns
        if nd <= mx:
            if nd >= mn:
                out.append((ns, ne))
            continue
        cur = ns
        while cur + mx <= ne:
            out.append((cur, cur + mx))
            cur += mx
        if ne - cur >= mn:
            out.append((cur, ne))
    return out


def test_trim_split_kernel_matches_reference_loop():
    from dataflow_mm_ray.stages.scenes import trim_split_kernel

    rng = np.random.RandomState(11)
    n = 500
    s = rng.randint(0, 10**9, n).astype(np.int64)
    e = s + rng.randint(-100, 10**7, n).astype(np.int64)
    seg = pd.DataFrame(
        {"conv_id": [f"c{i % 7}" for i in range(n)], "session_id": np.arange(n) % 5,
         "start_us": s, "end_us": e}
    )
    for sr, er, mn, mx in [
        (1000, 2000, 5000, 100_000),
        (0, 0, 0, 70_000),        # min=0: zero-length remainder boundary rule
        (500_000, 500_000, 10_000, 1_000_000),
        (0, 0, 100_000, 100_000),  # min == max
    ]:
        got = trim_split_kernel(seg, sr, er, mn, mx)
        want = []
        for i in range(n):
            for cs, ce in _ref_trim_split([(int(s[i]), int(e[i]))], sr, er, mn, mx):
                want.append((seg["conv_id"].iloc[i], int(seg["session_id"].iloc[i]), cs, ce))
        got_t = list(
            zip(got["conv_id"], got["session_id"].astype(int),
                got["chunk_start_us"].astype(int), got["chunk_end_us"].astype(int))
        )
        assert got_t == want, (sr, er, mn, mx)
