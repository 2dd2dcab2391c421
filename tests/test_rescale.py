"""Checkpoint rescaling (streaming/rescale.py): a checkpoint taken at
N state shards, rewritten for M shards, resumes to committed output
identical to an uninterrupted run — the N-node -> 4N-node cluster
migration of the north rule, stateful and exactly-once.
"""
import pandas as pd
import pytest

from tests.conftest import SF_TINY

WIDTH_S = 3600
GAP_S = 1800


@pytest.fixture(scope="module")
def transcripts_path(ray_session, tmp_path_factory):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    p = tmp_path_factory.mktemp("rescale") / "transcripts"
    return prepare_transcripts(SF_TINY, str(p))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _engine(transcripts_path, out_dir, n_shards, processors=None, lateness_s=3600):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    return StreamingEngine(
        transcripts_path,
        str(out_dir),
        n_epochs=5,
        n_shards=n_shards,
        width_s=WIDTH_S,
        gap_s=GAP_S,
        lateness_s=lateness_s,
        processors=processors,
    )


def _procs():
    from dataflow_mm_ray.streaming.processor import (
        ConvSpan, GlobalDedupFirst, IncidentIntervalCount, SimhashNearDupFirst,
        WindowRoleCounts)

    # one of each route_key kind: content hash (dk1), global window key,
    # conv_id, band-bucket id (bb, with per-bucket winner state that
    # must land on the new owner shard) — the four split rules rescale
    # must preserve; rjoin adds mixed-kind rows (interval sources +
    # probes) that must stay co-routed on conv_id through the split
    return [GlobalDedupFirst(), WindowRoleCounts(width_s=WIDTH_S), ConvSpan(),
            SimhashNearDupFirst(), IncidentIntervalCount()]


@pytest.mark.parametrize("old_n,new_n", [(2, 5), (3, 1)])
def test_rescale_resume_identical_output(ray_session, transcripts_path,
                                         tmp_path, old_n, new_n):
    from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

    full = _engine(transcripts_path, tmp_path / "full", 3)
    full.run()
    want = {k: _canon(v) for k, v in full.results().items()}

    out = tmp_path / "rescaled"
    eng1 = _engine(transcripts_path, out, old_n)
    eng1.run(stop_after=1)  # killed after epoch 1 with live carried state
    assert any(v for v in ray_stats(eng1)), "mid-stream state must be non-trivial"
    meta = rescale_checkpoint(str(out), new_n)
    assert meta["config"]["n_shards"] == new_n
    eng2 = _engine(transcripts_path, out, new_n)  # resumes on M shards
    eng2.run()
    got = {k: _canon(v) for k, v in eng2.results().items()}
    for k in want:
        pd.testing.assert_frame_equal(got[k], want[k], check_dtype=False)


def ray_stats(eng) -> list:
    import ray

    stats = ray.get([sh.stats.remote() for sh in eng.shards])
    return [v for st in stats for v in st.values() if isinstance(v, int) and v]


def test_rescale_with_processors(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

    full = _engine(transcripts_path, tmp_path / "full", 4, processors=_procs())
    full.run()
    want = {k: _canon(v) for k, v in full.results().items()}
    assert {"gdedup", "wroles", "convspan", "sdup", "rjoin"} <= set(want)
    assert (len(want["gdedup"]) and len(want["wroles"])
            and len(want["convspan"]) and len(want["sdup"])
            and len(want["rjoin"]))

    out = tmp_path / "rescaled"
    eng1 = _engine(transcripts_path, out, 2, processors=_procs())
    eng1.run(stop_after=0)
    rescale_checkpoint(str(out), 6, processors=_procs())
    eng2 = _engine(transcripts_path, out, 6, processors=_procs())
    eng2.run()
    got = {k: _canon(v) for k, v in eng2.results().items()}
    for k in want:
        pd.testing.assert_frame_equal(got[k], want[k], check_dtype=False)


def test_rescale_processor_mismatch_raises(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

    out = tmp_path / "out"
    eng = _engine(transcripts_path, out, 2, processors=_procs())
    eng.run(stop_after=0)
    with pytest.raises(ValueError, match="processors"):
        rescale_checkpoint(str(out), 4)  # run had plugins, call has none


def test_resume_wrong_shards_without_rescale_still_raises(
        ray_session, transcripts_path, tmp_path):
    out = tmp_path / "out"
    eng = _engine(transcripts_path, out, 2)
    eng.run(stop_after=0)
    with pytest.raises(ValueError, match="n_shards"):
        _engine(transcripts_path, out, 4)  # no rescale -> guarded


def test_rescale_without_checkpoint_raises(tmp_path):
    import os

    from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

    os.makedirs(tmp_path / "checkpoints")
    with pytest.raises(FileNotFoundError):
        rescale_checkpoint(str(tmp_path), 4)
