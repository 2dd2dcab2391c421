"""Lambda-repair invariant (streaming/reprocess.py):

1. at ANY lateness, on-time windows (+) late corrections == the batch
   window aggregates over the full input, bit-for-bit;
2. the repair is incremental (consumes only new late epochs) and
   exactly-once (re-running is a byte-level no-op);
3. with nothing late the correction streams commit empty.
"""
import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_TINY

WIDTH_S = 3600
GAP_S = 1800
SLIDE_WIDTH_S = 7200
SLIDE_S = 3600
BIG_LATENESS = 10**9


@pytest.fixture(scope="module")
def transcripts_path(ray_session, tmp_path_factory):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    p = tmp_path_factory.mktemp("repair") / "transcripts"
    return prepare_transcripts(SF_TINY, str(p))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run_engine(transcripts_path, out_dir, lateness_s, stop_after=None):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    eng = StreamingEngine(
        transcripts_path, str(out_dir), n_epochs=5, n_shards=3,
        width_s=WIDTH_S, gap_s=GAP_S, lateness_s=lateness_s,
        slide_width_s=SLIDE_WIDTH_S, slide_s=SLIDE_S,
    )
    eng.run(stop_after=stop_after)
    return eng


def _batch_windows():
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.windows import tumbling_window_agg

    b = tumbling_window_agg(transcripts_from_events(SF_TINY), width_s=WIDTH_S).to_pandas()
    b["window_start_us"] = (
        b.pop("window_start").astype("datetime64[us]").astype(np.int64)
    )
    return b


def _batch_sliding():
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.windows import sliding_window_agg

    b = sliding_window_agg(
        transcripts_from_events(SF_TINY), width_s=SLIDE_WIDTH_S, slide_s=SLIDE_S
    ).to_pandas()
    b["window_start_us"] = (
        b.pop("window_start").astype("datetime64[us]").astype(np.int64)
    )
    return b


def _batch_sessions():
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.windows import session_window_agg

    b = session_window_agg(transcripts_from_events(SF_TINY), gap_s=GAP_S).to_pandas()
    b["start_us"] = b.pop("session_start").astype("datetime64[us]").astype(np.int64)
    b["end_us"] = b.pop("session_end").astype("datetime64[us]").astype(np.int64)
    return b


def _assert_matches(got: pd.DataFrame, want: pd.DataFrame):
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


def test_repair_restores_batch_equivalence(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.reprocess import (
        repair, repaired_sliding, repaired_windows)

    out = tmp_path / "out"
    eng = _run_engine(transcripts_path, out, lateness_s=0)
    res = eng.results()
    assert len(res["late"]) > 0  # zero lateness must quarantine plenty
    # on-time alone is NOT the batch answer...
    assert res["windows"]["n_turns"].sum() < _batch_windows()["n_turns"].sum()

    stats = repair(str(out))
    assert stats["windows_fix"] > 0 and stats["sliding_fix"] > 0
    # ...but on-time (+) corrections is, bit-for-bit
    _assert_matches(repaired_windows(str(out)).to_pandas(), _batch_windows())
    _assert_matches(repaired_sliding(str(out)).to_pandas(), _batch_sliding())

    # non-additive repair: sessions by keyed recomputation of the
    # conversations the quarantine touched
    from dataflow_mm_ray.streaming.reprocess import (
        repair_sessions, repaired_sessions)

    s = repair_sessions(str(out), transcripts_path)
    assert not s["skipped"] and s["affected_convs"] > 0 and s["sessions_fix"] > 0
    _assert_matches(repaired_sessions(str(out)).to_pandas(), _batch_sessions())
    # second pass over the same late horizon: no-op
    s2 = repair_sessions(str(out), transcripts_path)
    assert s2["skipped"] and s2["epoch"] == s["epoch"]


def test_repair_incremental_and_exactly_once(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.reprocess import (
        repair, repair_sessions, repaired_sessions, repaired_windows)

    out = tmp_path / "out"
    _run_engine(transcripts_path, out, lateness_s=0, stop_after=1)
    s1 = repair(str(out))
    assert s1["epochs"] == [0, 1]
    sf1 = repair_sessions(str(out), transcripts_path)
    assert sf1["epoch"] == 1

    # resume to completion; a second repair consumes ONLY the new epochs
    _run_engine(transcripts_path, out, lateness_s=0)
    s2 = repair(str(out))
    assert s2["epochs"] == [2, 3, 4]
    _assert_matches(repaired_windows(str(out)).to_pandas(), _batch_windows())
    # a later sessions pass SUPERSEDES the epoch-1 pass (readers resolve
    # only the latest manifest) and restores the batch answer
    sf2 = repair_sessions(str(out), transcripts_path)
    assert sf2["epoch"] == 4 and not sf2["skipped"]
    _assert_matches(repaired_sessions(str(out)).to_pandas(), _batch_sessions())

    # third repair: nothing to do, manifests byte-identical
    def manifests():
        d = os.path.join(out, "manifests", "windows_fix")
        return {n: open(os.path.join(d, n)).read() for n in sorted(os.listdir(d))}

    before = manifests()
    s3 = repair(str(out))
    assert s3["epochs"] == [] and s3["windows_fix"] == 0
    assert manifests() == before


def test_repair_noop_when_nothing_late(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.reprocess import repair, repaired_windows

    out = tmp_path / "out"
    eng = _run_engine(transcripts_path, out, lateness_s=BIG_LATENESS)
    stats = repair(str(out))
    assert stats["windows_fix"] == 0 and stats["sliding_fix"] == 0
    # every late epoch (all empty) got an (empty) fix manifest
    for e in range(5):
        with open(os.path.join(out, "manifests", "windows_fix",
                               f"epoch-{e}.json")) as f:
            assert json.load(f)["rows"] == 0
    _assert_matches(repaired_windows(str(out)).to_pandas(), _batch_windows())
    # the merged view degenerates to the windows stream itself
    got = repaired_windows(str(out)).to_pandas()
    assert got["n_turns"].sum() == eng.results()["windows"]["n_turns"].sum()

    # sessions: empty fix pass, merged view degenerates to the stream
    from dataflow_mm_ray.streaming.reprocess import (
        repair_sessions, repaired_sessions)

    s = repair_sessions(str(out), transcripts_path)
    assert s["sessions_fix"] == 0 and s["affected_convs"] == 0
    _assert_matches(repaired_sessions(str(out)).to_pandas(), _batch_sessions())
