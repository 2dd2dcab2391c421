"""Pluggable stateful-processor API (streaming/processor.py):

1. the shipped processors' streamed output is frame-equal to their
   batch twins (the SQL-oracled `window_role_counts` / `conv_span`
   queries) over the applied (non-late) rows, at both lateness regimes;
2. processor streams inherit exactly-once: rerun is a no-op, kill-and-
   resume reproduces an uninterrupted run byte-for-byte (plugin state
   rides the checkpoint snapshots);
3. resuming with a different processor list raises (config guard);
4. a custom user processor (defined in-test) runs end-to-end.
"""
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_TINY

WIDTH_S = 3600
GAP_S = 1800
BIG_LATENESS = 10**9


@pytest.fixture(scope="module")
def transcripts_path(ray_session, tmp_path_factory):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    p = tmp_path_factory.mktemp("procstream") / "transcripts"
    return prepare_transcripts(SF_TINY, str(p))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _procs():
    from dataflow_mm_ray.streaming.processor import ConvSpan, WindowRoleCounts

    return [WindowRoleCounts(width_s=WIDTH_S), ConvSpan()]


def _run(transcripts_path, out_dir, lateness_s, stop_after=None, processors=None):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    eng = StreamingEngine(
        transcripts_path,
        str(out_dir),
        n_epochs=5,
        n_shards=3,
        width_s=WIDTH_S,
        gap_s=GAP_S,
        lateness_s=lateness_s,
        processors=_procs() if processors is None else processors,
    )
    eng.run(stop_after=stop_after)
    return eng


def _applied_transcripts(res) -> pd.DataFrame:
    """Batch transcript table minus the rows the stream quarantined."""
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(SF_TINY).to_pandas()
    late = res["late"]
    if len(late):
        lk = set(zip(late["conv_id"], late["turn_idx"].astype(int)))
        t = t[[(c, int(i)) not in lk for c, i in zip(t["conv_id"], t["turn_idx"])]]
    return t


def _batch_wroles(t: pd.DataFrame) -> pd.DataFrame:
    us = t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    w = (us // (WIDTH_S * 10**6)) * (WIDTH_S * 10**6)
    return (
        pd.DataFrame({"window_start_us": w, "role": t["role"].to_numpy()})
        .groupby(["window_start_us", "role"], sort=False)
        .size()
        .rename("n_turns")
        .reset_index()
    )


def _batch_convspan(t: pd.DataFrame) -> pd.DataFrame:
    us = t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    agg = (
        pd.DataFrame({"conv_id": t["conv_id"].to_numpy(), "us": us})
        .groupby("conv_id", sort=False)
        .agg(first_ts_us=("us", "min"), last_ts_us=("us", "max"), n_turns=("us", "size"))
        .reset_index()
    )
    agg["span_us"] = agg["last_ts_us"] - agg["first_ts_us"]
    return agg


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_processor_streams_match_batch(ray_session, transcripts_path, tmp_path, lateness_s):
    eng = _run(transcripts_path, tmp_path / f"p{lateness_s}", lateness_s)
    res = eng.results()
    t = _applied_transcripts(res)

    want_w = _batch_wroles(t)
    got_w = res["wroles"]
    assert len(got_w) > 0
    pd.testing.assert_frame_equal(
        _canon(got_w[want_w.columns.tolist()]), _canon(want_w), check_dtype=False
    )

    want_c = _batch_convspan(t)
    got_c = res["convspan"]
    assert len(got_c) == len(want_c) > 0
    pd.testing.assert_frame_equal(
        _canon(got_c[want_c.columns.tolist()]), _canon(want_c), check_dtype=False
    )


def test_processor_streams_match_sql_twin_queries(ray_session, transcripts_path, tmp_path):
    """With nothing late, the streamed emissions equal the registered
    (SQL-oracled) batch queries — closing the loop streamed == batch
    == SQL."""
    from dataflow_mm_ray.queries import registry

    eng = _run(transcripts_path, tmp_path / "psql", BIG_LATENESS)
    res = eng.results()
    assert len(res["late"]) == 0

    batch_w = registry()["window_role_counts"].fn(SF_TINY).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(res["wroles"][batch_w.columns.tolist()]), _canon(batch_w), check_dtype=False
    )
    batch_c = registry()["conv_span"].fn(SF_TINY).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(res["convspan"][batch_c.columns.tolist()]), _canon(batch_c), check_dtype=False
    )


def test_processor_rerun_is_noop_and_resume_matches(ray_session, transcripts_path, tmp_path):
    full = _run(transcripts_path, tmp_path / "full", BIG_LATENESS).results()

    # kill after epoch 1, then resume: byte-identical committed streams
    _run(transcripts_path, tmp_path / "killed", BIG_LATENESS, stop_after=1)
    resumed = _run(transcripts_path, tmp_path / "killed", BIG_LATENESS).results()
    for s in ("wroles", "convspan"):
        pd.testing.assert_frame_equal(_canon(resumed[s]), _canon(full[s]))

    # re-running the COMPLETED stream changes nothing
    rerun = _run(transcripts_path, tmp_path / "killed", BIG_LATENESS).results()
    for s in ("wroles", "convspan"):
        pd.testing.assert_frame_equal(_canon(rerun[s]), _canon(full[s]))


def test_resume_with_changed_processors_raises(ray_session, transcripts_path, tmp_path):
    _run(transcripts_path, tmp_path / "cfg", BIG_LATENESS, stop_after=0)
    with pytest.raises(ValueError, match="processors"):
        _run(transcripts_path, tmp_path / "cfg", BIG_LATENESS, processors=[])


def test_name_collision_rejected(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.processor import WindowRoleCounts

    bad = WindowRoleCounts(width_s=WIDTH_S)
    bad.name = "windows"  # collides with a built-in stream
    with pytest.raises(ValueError, match="distinct"):
        _run(transcripts_path, tmp_path / "bad", BIG_LATENESS, processors=[bad])


def _batch_gdedup(t: pd.DataFrame) -> pd.DataFrame:
    """Hash-level transcription of the GlobalDedupFirst semantics over
    a transcript frame: min (ts_us, conv_id, turn_idx) per content-key
    hash pair (the same 2x64-bit hashes engine._extract ships)."""
    key = (
        t["text"].fillna("").str.replace(r" #\d+ ", " ", regex=True)
        .to_numpy(dtype=object)
    )
    d = pd.DataFrame(
        {
            "dk1": pd.util.hash_array(key, categorize=False).view(np.int64),
            "dk2": pd.util.hash_array(
                key, hash_key="graft-dedup-salt", categorize=False
            ).view(np.int64),
            "conv_id": t["conv_id"].to_numpy(),
            "turn_idx": t["turn_idx"].to_numpy(dtype=np.int32),
            "ts_us": t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
        }
    )
    return (
        d.sort_values(["dk1", "dk2", "ts_us", "conv_id", "turn_idx"], kind="mergesort")
        .drop_duplicates(["dk1", "dk2"], keep="first")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_global_dedup_stream_matches_batch(
    ray_session, transcripts_path, tmp_path, lateness_s
):
    """GlobalDedupFirst == the batch event-time-first dedup over applied
    rows, at both lateness regimes; each key emits exactly once."""
    from dataflow_mm_ray.streaming.processor import GlobalDedupFirst

    eng = _run(
        transcripts_path, tmp_path / f"gd{lateness_s}", lateness_s,
        processors=[GlobalDedupFirst()],
    )
    res = eng.results()
    got = res["gdedup"]
    assert len(got) > 0
    assert not got.duplicated(["dk1", "dk2"]).any()
    want = _batch_gdedup(_applied_transcripts(res))
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


def test_global_dedup_matches_sql_twin_query(ray_session, transcripts_path, tmp_path):
    """With nothing late, the streamed winners equal the SQL-oracled
    `dedup_first_event_time` batch query (matched on the winning
    (conv_id, turn_idx) rows — the stream ships hashes, not text)."""
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.streaming.processor import GlobalDedupFirst

    eng = _run(transcripts_path, tmp_path / "gdsql", BIG_LATENESS,
               processors=[GlobalDedupFirst()])
    res = eng.results()
    assert len(res["late"]) == 0

    batch = registry()["dedup_first_event_time"].fn(SF_TINY).to_pandas()
    got = res["gdedup"]
    assert len(got) == len(batch)
    want_keys = set(zip(batch["conv_id"], batch["turn_idx"].astype(int)))
    got_keys = set(zip(got["conv_id"], got["turn_idx"].astype(int)))
    assert got_keys == want_keys


def test_global_dedup_resume_matches(ray_session, transcripts_path, tmp_path):
    """Tombstone state rides the checkpoint: kill-and-resume emits the
    same winners once each, byte-identical to an uninterrupted run."""
    from dataflow_mm_ray.streaming.processor import GlobalDedupFirst

    full = _run(transcripts_path, tmp_path / "gdfull", 3600,
                processors=[GlobalDedupFirst()]).results()
    _run(transcripts_path, tmp_path / "gdkill", 3600,
         processors=[GlobalDedupFirst()], stop_after=2)
    resumed = _run(transcripts_path, tmp_path / "gdkill", 3600,
                   processors=[GlobalDedupFirst()]).results()
    pd.testing.assert_frame_equal(_canon(resumed["gdedup"]), _canon(full["gdedup"]))


def test_global_dedup_random_epoch_splits():
    """Drive the GlobalDedupFirst merge/on_watermark contract directly
    across 12 randomized trials: arbitrary epoch assignment, arbitrary
    batch splits within an epoch (extract is a per-batch combiner),
    engine-style late quarantine (lateness 0 -> wm = max ts seen).
    Invariants: every key emits exactly once, mid-stream emissions are
    final (union == batch winner over applied rows), regardless of the
    split."""
    from dataflow_mm_ray.streaming.processor import GlobalDedupFirst

    US = 10**6
    for trial in range(12):
        rng = np.random.default_rng(100 + trial)
        n = int(rng.integers(50, 400))
        keys = rng.integers(0, 40, size=n)  # ~10x duplication
        rows = pd.DataFrame(
            {
                "dk1": keys.astype(np.int64),
                "dk2": (keys * 7 + 1).astype(np.int64),
                "conv_id": np.array(
                    [f"c{int(x):03d}" for x in rng.integers(0, 20, size=n)],
                    dtype=object,
                ),
                "turn_idx": rng.integers(0, 1000, size=n).astype(np.int32),
                "ts_us": rng.integers(0, 10_000, size=n).astype(np.int64) * US,
            }
        )
        epoch_of = rng.integers(0, 5, size=n)

        proc = GlobalDedupFirst()
        state = proc.init_state()
        wm = -(1 << 62)
        emitted, applied_parts = [], []
        for e in range(5):
            arrive = rows[epoch_of == e]
            arrive = arrive[arrive["ts_us"].to_numpy() >= wm]  # late quarantine
            applied_parts.append(arrive)
            if len(arrive):
                for idx in np.array_split(
                    np.arange(len(arrive)), int(rng.integers(1, 4))
                ):
                    if len(idx):
                        state = proc.merge(state, proc.extract(arrive.iloc[idx]))
                wm = max(wm, int(arrive["ts_us"].max()))
            em, state = proc.on_watermark(state, wm, flush=(e == 4))
            emitted.append(em)
        got = pd.concat(emitted, ignore_index=True)
        assert not got.duplicated(["dk1", "dk2"]).any(), trial

        applied = pd.concat(applied_parts, ignore_index=True)
        want = (
            applied.sort_values(
                ["dk1", "dk2", "ts_us", "conv_id", "turn_idx"], kind="mergesort"
            )
            .drop_duplicates(["dk1", "dk2"])
            .reset_index(drop=True)[list(got.columns)]
        )
        pd.testing.assert_frame_equal(
            _canon(got), _canon(want), check_dtype=False
        ), trial


def test_custom_processor_end_to_end(ray_session, transcripts_path, tmp_path):
    """A user-defined processor (per-tool invocation totals, flush
    emission) — defined INSIDE the test so cloudpickle ships it by
    value to the shard actors, proving third-party classes work."""
    from dataflow_mm_ray.streaming.processor import StatefulProcessor

    class ToolTotals(StatefulProcessor):
        name = "tooltotals"
        route_key = "tool"

        def extract(self, rows):
            inv = rows[(rows["role"].to_numpy() == "assistant")
                       & rows["tool"].notna().to_numpy()]
            return (
                pd.DataFrame({"tool": inv["tool"].to_numpy(),
                              "n": np.ones(len(inv), dtype=np.int64)})
                .groupby("tool", sort=False).sum().reset_index()
            )

        def init_state(self):
            return pd.DataFrame({"tool": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})

        def merge(self, state, rows):
            both = pd.concat([state, rows], ignore_index=True) if len(state) else rows
            return both.groupby("tool", sort=False).sum().reset_index()

        def on_watermark(self, state, wm_us, flush):
            if not flush:
                return self.init_state(), state
            return (state.sort_values("tool", kind="mergesort").reset_index(drop=True),
                    self.init_state())

    eng = _run(transcripts_path, tmp_path / "custom", BIG_LATENESS,
               processors=[ToolTotals()])
    res = eng.results()
    t = _applied_transcripts(res)
    want = (
        t[(t["role"] == "assistant") & t["tool"].notna()]
        .groupby("tool", sort=False).size().rename("n").reset_index()
    )
    pd.testing.assert_frame_equal(
        _canon(res["tooltotals"][["tool", "n"]]), _canon(want), check_dtype=False
    )


def _batch_sdup(t: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Pandas transcription of the SimhashNearDupFirst semantics: per
    (band, bucket), edges from every turn to the bucket's event-time-
    first turn when full-64-bit hamming <= k."""
    from dataflow_mm_ray.stages.neardup import _popcount64, simhash64

    key = (
        t["text"].fillna("").str.replace(r" #\d+ ", " ", regex=True)
        .to_numpy(dtype=object)
    )
    uniq, inv = np.unique(key, return_inverse=True)
    sigs = np.asarray([simhash64(x) for x in uniq], dtype=np.uint64)[inv]
    conv = t["conv_id"].to_numpy()
    turn = t["turn_idx"].to_numpy(dtype=np.int32)
    ts = t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    rows = []
    for band in range(4):
        slice_ = ((sigs >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
        rows.append(pd.DataFrame({
            "bb": (np.int64(band) << np.int64(16)) | slice_,
            "sh64": sigs.view(np.int64), "conv_id": conv,
            "turn_idx": turn, "ts_us": ts,
        }))
    d = pd.concat(rows, ignore_index=True).sort_values(
        ["bb", "ts_us", "conv_id", "turn_idx"], kind="mergesort")
    out = []
    for bb, g in d.groupby("bb", sort=False):
        w = g.iloc[0]
        losers = g.iloc[1:]
        if not len(losers):
            continue
        w_sig = np.array([w["sh64"]], dtype=np.int64).view(np.uint64)[0]
        ham = _popcount64(
            losers["sh64"].to_numpy(dtype=np.int64).view(np.uint64) ^ w_sig
        )
        keep = ham <= max_hamming
        c = losers[keep]
        if not len(c):
            continue
        out.append(pd.DataFrame({
            "band": np.full(len(c), int(bb) >> 16, dtype=np.int32),
            "bucket": np.full(len(c), int(bb) & 0xFFFF, dtype=np.int64),
            "winner_conv_id": np.full(len(c), w["conv_id"], dtype=object),
            "winner_turn_idx": np.full(len(c), w["turn_idx"], dtype=np.int32),
            "winner_ts_us": np.full(len(c), w["ts_us"], dtype=np.int64),
            "conv_id": c["conv_id"].to_numpy(),
            "turn_idx": c["turn_idx"].to_numpy(dtype=np.int32),
            "ts_us": c["ts_us"].to_numpy(dtype=np.int64),
            "hamming": ham[keep].astype(np.int64),
        }))
    if not out:
        return pd.DataFrame()
    return pd.concat(out, ignore_index=True)


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_simhash_neardup_stream_matches_batch(
    ray_session, transcripts_path, tmp_path, lateness_s
):
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst

    eng = _run(transcripts_path, tmp_path / f"sd{lateness_s}", lateness_s,
               processors=[SimhashNearDupFirst()])
    res = eng.results()
    t = _applied_transcripts(res)
    want = _batch_sdup(t)
    got = res["sdup"]
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


def test_simhash_neardup_stream_matches_distributed_query(
    ray_session, transcripts_path, tmp_path
):
    """streamed == the registered distributed batch twin (one keyed
    exchange) with nothing late — closing streamed == batch kernel ==
    pandas transcription."""
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst

    eng = _run(transcripts_path, tmp_path / "sdq", BIG_LATENESS,
               processors=[SimhashNearDupFirst()])
    res = eng.results()
    assert len(res["late"]) == 0
    batch = registry()["simhash_neardup_first_siphash"].fn(SF_TINY).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(res["sdup"][batch.columns.tolist()]), _canon(batch),
        check_dtype=False,
    )


def test_simhash_neardup_kill_resume(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst

    full = _run(transcripts_path, tmp_path / "sdfull", 3600,
                processors=[SimhashNearDupFirst()]).results()
    _run(transcripts_path, tmp_path / "sdkill", 3600, stop_after=2,
         processors=[SimhashNearDupFirst()])
    resumed = _run(transcripts_path, tmp_path / "sdkill", 3600,
                   processors=[SimhashNearDupFirst()]).results()
    pd.testing.assert_frame_equal(_canon(resumed["sdup"]), _canon(full["sdup"]))


# --- streamed interval join (rjoin) ----------------------------------------


def _batch_rjoin(t: pd.DataFrame, width_s: int = 1800) -> pd.DataFrame:
    """Independent transcription: per-conversation searchsorted over
    sorted interval starts (a different algorithm from both the stream's
    and the batch kernel's boundary sweep)."""
    w_us = width_s * 10**6
    ts = t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    err = t["text"].str.startswith("error ").fillna(False).to_numpy(dtype=bool)
    d = pd.DataFrame({
        "conv_id": t["conv_id"].to_numpy(),
        "turn_idx": t["turn_idx"].to_numpy(dtype=np.int32),
        "ts_us": ts, "err": err,
    })
    out = []
    for conv, g in d.groupby("conv_id", sort=False):
        starts = np.sort(g.loc[g["err"], "ts_us"].to_numpy(dtype=np.int64))
        p = g["ts_us"].to_numpy(dtype=np.int64)
        counts = (np.searchsorted(starts, p, side="right")
                  - np.searchsorted(starts + w_us, p, side="right"))
        out.append(pd.DataFrame({
            "conv_id": g["conv_id"].to_numpy(),
            "turn_idx": g["turn_idx"].to_numpy(dtype=np.int32),
            "n_open_incidents": counts.astype(np.int64),
        }))
    return pd.concat(out, ignore_index=True)


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_interval_join_stream_matches_batch(
    ray_session, transcripts_path, tmp_path, lateness_s
):
    from dataflow_mm_ray.streaming.processor import IncidentIntervalCount

    eng = _run(transcripts_path, tmp_path / f"rj{lateness_s}", lateness_s,
               processors=[IncidentIntervalCount()])
    res = eng.results()
    t = _applied_transcripts(res)
    want = _batch_rjoin(t)
    got = res["rjoin"]
    assert len(got) == len(want) > 0
    assert got["n_open_incidents"].max() > 0
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


def test_interval_join_stream_matches_sql_twin_query(
    ray_session, transcripts_path, tmp_path
):
    """streamed == the registered range_join_incidents batch twin (the
    boundary-sweep kernel, itself SQL-oracled) with nothing late —
    closing streamed == batch kernel == SQL."""
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.streaming.processor import IncidentIntervalCount

    eng = _run(transcripts_path, tmp_path / "rjq", BIG_LATENESS,
               processors=[IncidentIntervalCount()])
    res = eng.results()
    assert len(res["late"]) == 0
    batch = registry()["range_join_incidents"].fn(SF_TINY).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(res["rjoin"][batch.columns.tolist()]), _canon(batch),
        check_dtype=False,
    )


def test_interval_join_kill_resume(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.processor import IncidentIntervalCount

    full = _run(transcripts_path, tmp_path / "rjfull", 3600,
                processors=[IncidentIntervalCount()]).results()
    _run(transcripts_path, tmp_path / "rjkill", 3600, stop_after=2,
         processors=[IncidentIntervalCount()])
    resumed = _run(transcripts_path, tmp_path / "rjkill", 3600,
                   processors=[IncidentIntervalCount()]).results()
    pd.testing.assert_frame_equal(_canon(resumed["rjoin"]), _canon(full["rjoin"]))


def test_interval_join_random_epoch_splits():
    """Drive the IncidentIntervalCount merge/on_watermark contract
    directly across 12 randomized trials: arbitrary epoch assignment,
    arbitrary batch splits within an epoch, engine-style late
    quarantine (lateness 0 -> wm = max ts seen), small width with many
    exact boundary ties (probe at interval start and at interval end).
    Invariants: every applied turn emits exactly once with the count an
    offline sweep over the applied rows computes, regardless of split."""
    from dataflow_mm_ray.streaming.processor import IncidentIntervalCount

    US = 10**6
    WIDTH_S_RJ = 10
    for trial in range(12):
        rng = np.random.default_rng(300 + trial)
        n = int(rng.integers(60, 400))
        rows = pd.DataFrame(
            {
                "conv_id": np.array(
                    [f"c{int(x):03d}" for x in rng.integers(0, 8, size=n)],
                    dtype=object,
                ),
                "turn_idx": np.arange(n, dtype=np.int32),
                "ts_us": rng.integers(0, 50, size=n).astype(np.int64) * US,
                "is_error": rng.random(size=n) < 0.3,
            }
        )
        epoch_of = rng.integers(0, 5, size=n)

        proc = IncidentIntervalCount(width_s=WIDTH_S_RJ)
        state = proc.init_state()
        wm = -(1 << 62)
        emitted, applied_parts = [], []
        for e in range(5):
            arrive = rows[epoch_of == e]
            arrive = arrive[arrive["ts_us"].to_numpy() >= wm]  # late quarantine
            applied_parts.append(arrive)
            if len(arrive):
                for idx in np.array_split(
                    np.arange(len(arrive)), int(rng.integers(1, 4))
                ):
                    if len(idx):
                        state = proc.merge(state, proc.extract(arrive.iloc[idx]))
                wm = max(wm, int(arrive["ts_us"].max()))
            em, state = proc.on_watermark(state, wm, flush=(e == 4))
            emitted.append(em)
        assert not len(state)
        got = pd.concat(emitted, ignore_index=True)
        assert not got.duplicated(["conv_id", "turn_idx"]).any(), trial

        applied = pd.concat(applied_parts, ignore_index=True)
        assert len(got) == len(applied), trial
        w_us = WIDTH_S_RJ * US
        want_parts = []
        for conv, g in applied.groupby("conv_id", sort=False):
            starts = np.sort(
                g.loc[g["is_error"], "ts_us"].to_numpy(dtype=np.int64)
            )
            p = g["ts_us"].to_numpy(dtype=np.int64)
            counts = (np.searchsorted(starts, p, side="right")
                      - np.searchsorted(starts + w_us, p, side="right"))
            want_parts.append(pd.DataFrame({
                "conv_id": g["conv_id"].to_numpy(),
                "turn_idx": g["turn_idx"].to_numpy(dtype=np.int32),
                "n_open_incidents": counts.astype(np.int64),
            }))
        want = pd.concat(want_parts, ignore_index=True)
        pd.testing.assert_frame_equal(
            _canon(got), _canon(want[list(got.columns)]), check_dtype=False
        ), trial
