"""Committed-stream compaction (streaming/compact.py):

1. compaction rewrites many small epoch files into few large ones while
   read_committed returns the BYTE-IDENTICAL frame (same rows, same
   order) and read_committed_ds the same canon rows;
2. the exactly-once protocol survives: re-running the engine over a
   compacted out_dir is a no-op; kill -> compact -> resume equals an
   uninterrupted run (epoch manifests are never touched);
3. incremental: compacting, appending more epochs, compacting again
   yields ordered segments and still-identical reads; an immediate
   second compaction is a no-op;
4. a crashed attempt (staged files, pointer never swapped) is invisible
   to readers and swept by the next successful run.
"""
import json
import os

import pandas as pd
import pytest

from tests.conftest import SF_TINY

WIDTH_S = 3600
GAP_S = 1800
INF = 10**9
CHECK_STREAMS = ("windows", "sliding", "sessions", "joins", "asof", "cep",
                 "alerts", "upserts", "wdedup")


@pytest.fixture(scope="module")
def transcripts_path(ray_session, tmp_path_factory):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    p = tmp_path_factory.mktemp("compactstream") / "transcripts"
    return prepare_transcripts(SF_TINY, str(p))


def _run(transcripts_path, out_dir, stop_after=None, lateness_s=INF):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    eng = StreamingEngine(
        transcripts_path, str(out_dir),
        n_epochs=5, n_shards=3,
        width_s=WIDTH_S, gap_s=GAP_S, lateness_s=lateness_s,
    )
    eng.run(stop_after=stop_after)
    return eng


def _nfiles(eng):
    return {s: len(eng.sink.committed_files(s)) for s in CHECK_STREAMS}


def test_compaction_preserves_rows_order_and_shrinks_files(
    ray_session, transcripts_path, tmp_path
):
    from dataflow_mm_ray.streaming.compact import compact_all

    eng = _run(transcripts_path, tmp_path / "c1")
    before = {s: eng.sink.read_committed(s) for s in CHECK_STREAMS}
    nf_before = _nfiles(eng)

    summary = compact_all(str(tmp_path / "c1"))
    assert any(v.get("compacted") for v in summary.values())

    nf_after = _nfiles(eng)
    for s in CHECK_STREAMS:
        # byte-identical frame: same rows in the same order
        pd.testing.assert_frame_equal(eng.sink.read_committed(s), before[s])
        if nf_before[s] > 1:
            assert nf_after[s] < nf_before[s], s
    # the lazy Dataset reader sees the same rows
    for s in ("windows", "joins"):
        ds = eng.sink.read_committed_ds(s)
        got = ds.to_pandas().sort_values(list(before[s].columns),
                                         kind="mergesort").reset_index(drop=True)
        want = before[s].sort_values(list(before[s].columns),
                                     kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
    # second compaction right away: nothing uncovered
    again = compact_all(str(tmp_path / "c1"))
    assert not any(v.get("compacted") for v in again.values())


def test_engine_rerun_over_compacted_outdir_is_noop(
    ray_session, transcripts_path, tmp_path
):
    from dataflow_mm_ray.streaming.compact import compact_all

    eng = _run(transcripts_path, tmp_path / "c2")
    before = {s: eng.sink.read_committed(s) for s in CHECK_STREAMS}
    compact_all(str(tmp_path / "c2"))

    rerun = _run(transcripts_path, tmp_path / "c2")
    for s in CHECK_STREAMS:
        pd.testing.assert_frame_equal(rerun.sink.read_committed(s), before[s])


def test_kill_compact_resume_equals_uninterrupted(
    ray_session, transcripts_path, tmp_path
):
    """Compaction between a crash and its resume must not change the
    final committed output (epoch manifests drive replay, and they are
    untouched)."""
    from dataflow_mm_ray.streaming.compact import compact_all

    full = _run(transcripts_path, tmp_path / "full")
    want = {s: full.sink.read_committed(s) for s in CHECK_STREAMS}

    _run(transcripts_path, tmp_path / "killed", stop_after=1)
    compact_all(str(tmp_path / "killed"))
    resumed = _run(transcripts_path, tmp_path / "killed")
    for s in CHECK_STREAMS:
        got = resumed.sink.read_committed(s)
        # rows identical; order may interleave segment vs epoch files
        cols = list(want[s].columns)
        pd.testing.assert_frame_equal(
            got.sort_values(cols, kind="mergesort").reset_index(drop=True),
            want[s].sort_values(cols, kind="mergesort").reset_index(drop=True),
        )


def test_incremental_segments_and_multiple_parts(
    ray_session, transcripts_path, tmp_path
):
    from dataflow_mm_ray.streaming.compact import compact_stream, read_compaction

    # finite lateness so windows CLOSE (and commit files) during early
    # epochs, not just at the end-of-stream flush
    out = tmp_path / "c3"
    _run(transcripts_path, out, stop_after=1, lateness_s=3600)  # epochs 0..1
    r1 = compact_stream(str(out), "windows", target_rows=50)
    assert r1["compacted"] and r1["output_files"] >= 2  # tiny target -> parts

    eng = _run(transcripts_path, out, lateness_s=3600)  # appends epochs 2..4
    r2 = compact_stream(str(out), "windows", target_rows=50)
    assert r2["compacted"] and r2["gen"] == r1["gen"] + 1

    comp = read_compaction(str(out), "windows")
    upto = [seg["upto_epoch"] for seg in comp["segments"]]
    assert upto == sorted(upto) and len(upto) == 2

    # full-stream read equals a never-compacted run over the same input
    fresh = _run(transcripts_path, tmp_path / "c3fresh", lateness_s=3600)
    pd.testing.assert_frame_equal(
        eng.sink.read_committed("windows"), fresh.sink.read_committed("windows")
    )


def test_one_oversized_epoch_splits_into_parts(
    ray_session, transcripts_path, tmp_path
):
    """Under lateness=inf every window commits in the FINAL epoch; the
    grouping must split that one epoch's files across outputs at
    ~target_rows (file granularity), not emit one giant file/task."""
    from dataflow_mm_ray.streaming.compact import compact_stream

    out = tmp_path / "c5"
    eng = _run(transcripts_path, out)  # lateness=INF
    before = eng.sink.read_committed("windows")
    r = compact_stream(str(out), "windows", target_rows=max(1, len(before) // 3))
    assert r["compacted"] and r["output_files"] >= 2
    pd.testing.assert_frame_equal(eng.sink.read_committed("windows"), before)


def test_crashed_attempt_invisible_and_swept(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.compact import compact_stream

    out = tmp_path / "c4"
    eng = _run(transcripts_path, out)
    before = eng.sink.read_committed("windows")

    # simulate a compaction attempt that staged files but crashed before
    # the pointer swap
    stray = out / "staging" / "windows" / "compact-gen7"
    os.makedirs(stray)
    with open(stray / "part-00000.parquet", "wb") as f:
        f.write(b"not a parquet file")

    pd.testing.assert_frame_equal(eng.sink.read_committed("windows"), before)

    r = compact_stream(str(out), "windows")
    assert r["compacted"]
    assert not stray.exists()  # swept
    pd.testing.assert_frame_equal(eng.sink.read_committed("windows"), before)
