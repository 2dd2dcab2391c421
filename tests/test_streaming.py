"""Streaming engine invariants:

1. with lateness >= data span (no late rows), the streamed, watermarked,
   epoch-committed output equals the batch oracle queries row-for-row;
2. re-running a completed stream is a no-op (exactly-once);
3. kill-and-resume mid-stream reproduces byte-identical committed output;
4. with lateness=0 the late quarantine is non-empty and deterministic,
   and committed + quarantined accounting is exact.
"""
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_TINY

WIDTH_S = 3600
GAP_S = 1800
BIG_LATENESS = 10**9  # >> 30-day data span -> nothing is ever late


@pytest.fixture(scope="module")
def transcripts_path(ray_session, tmp_path_factory):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    p = tmp_path_factory.mktemp("stream") / "transcripts"
    return prepare_transcripts(SF_TINY, str(p))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run_engine(transcripts_path, out_dir, lateness_s, stop_after=None, n_epochs=5):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    eng = StreamingEngine(
        transcripts_path,
        str(out_dir),
        n_epochs=n_epochs,
        n_shards=3,
        width_s=WIDTH_S,
        gap_s=GAP_S,
        lateness_s=lateness_s,
    )
    eng.run(stop_after=stop_after)
    return eng


def test_stream_matches_batch_when_nothing_late(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.join import tool_response_join
    from dataflow_mm_ray.stages.windows import session_window_agg, tumbling_window_agg

    eng = _run_engine(transcripts_path, tmp_path / "out", BIG_LATENESS)
    res = eng.results()
    assert len(res["late"]) == 0

    t = transcripts_from_events(SF_TINY)
    batch_win = tumbling_window_agg(t, width_s=WIDTH_S).to_pandas()
    batch_win["window_start_us"] = batch_win.pop("window_start").astype("datetime64[us]").astype(np.int64)
    got_win = res["windows"]
    pd.testing.assert_frame_equal(
        _canon(got_win[batch_win.columns.tolist()]), _canon(batch_win), check_dtype=False
    )

    t2 = transcripts_from_events(SF_TINY)
    batch_sess = session_window_agg(t2, gap_s=GAP_S).to_pandas()
    batch_sess["start_us"] = batch_sess.pop("session_start").astype("datetime64[us]").astype(np.int64)
    batch_sess["end_us"] = batch_sess.pop("session_end").astype("datetime64[us]").astype(np.int64)
    got_sess = res["sessions"]
    pd.testing.assert_frame_equal(
        _canon(got_sess[batch_sess.columns.tolist()]), _canon(batch_sess), check_dtype=False
    )

    from dataflow_mm_ray.stages.windows import sliding_window_agg

    t_s = transcripts_from_events(SF_TINY)
    batch_slide = sliding_window_agg(t_s, width_s=7200, slide_s=3600).to_pandas()
    batch_slide["window_start_us"] = (
        batch_slide.pop("window_start").astype("datetime64[us]").astype(np.int64)
    )
    got_slide = res["sliding"]
    pd.testing.assert_frame_equal(
        _canon(got_slide[batch_slide.columns.tolist()]), _canon(batch_slide), check_dtype=False
    )

    t3 = transcripts_from_events(SF_TINY)
    batch_join = tool_response_join(t3).to_pandas()
    got_join = res["joins"].copy()
    got_join["response_idx"] = got_join["response_idx"].astype("Float64")
    got_join["latency_us"] = got_join["latency_us"].astype("Float64")
    batch_join["response_idx"] = batch_join["response_idx"].astype("Float64")
    batch_join["latency_us"] = batch_join["latency_us"].astype("Float64")
    pd.testing.assert_frame_equal(
        _canon(got_join[batch_join.columns.tolist()]), _canon(batch_join), check_dtype=False
    )


def test_rerun_is_noop_exactly_once(ray_session, transcripts_path, tmp_path):
    out = tmp_path / "out"
    eng1 = _run_engine(transcripts_path, out, BIG_LATENESS)
    r1 = {k: _canon(v) for k, v in eng1.results().items()}
    # second engine over the same sink dir: resumes at the end, commits nothing new
    eng2 = _run_engine(transcripts_path, out, BIG_LATENESS)
    r2 = {k: _canon(v) for k, v in eng2.results().items()}
    for k in r1:
        pd.testing.assert_frame_equal(r1[k], r2[k])


def test_committed_rows_manifest_count_matches_readback(
    ray_session, transcripts_path, tmp_path
):
    """committed_rows (manifest-only, the scale summary path) is exact:
    equal to the full readback length for every stream."""
    from dataflow_mm_ray.streaming.sink import EpochSink

    eng = _run_engine(transcripts_path, tmp_path / "cr", 3600)
    res = eng.results()
    sink = EpochSink(str(tmp_path / "cr"), eng.stream_names)
    for s in eng.stream_names:
        assert sink.committed_rows(s) == len(res[s]), s


def test_kill_and_resume_identical_output(ray_session, transcripts_path, tmp_path):
    full = _run_engine(transcripts_path, tmp_path / "full", 3600)
    want = {k: _canon(v) for k, v in full.results().items()}

    out = tmp_path / "resumed"
    _run_engine(transcripts_path, out, 3600, stop_after=1)  # killed after epoch 1
    eng = _run_engine(transcripts_path, out, 3600)  # fresh engine resumes
    got = {k: _canon(v) for k, v in eng.results().items()}
    for k in want:
        pd.testing.assert_frame_equal(got[k], want[k], check_dtype=False)


def test_late_quarantine_accounting(ray_session, transcripts_path, tmp_path):
    import pyarrow.parquet as pq

    eng = _run_engine(transcripts_path, tmp_path / "out", 0)
    res = eng.results()
    n_input = pq.read_table(transcripts_path).num_rows
    n_late = len(res["late"])
    assert n_late > 0  # hash-shuffled arrival with zero lateness must quarantine
    # every non-late turn is in exactly one committed window
    assert res["windows"]["n_turns"].sum() + n_late == n_input
    # deterministic: same run again in a fresh dir
    eng2 = _run_engine(transcripts_path, tmp_path / "out2", 0)
    res2 = eng2.results()
    for k in res:
        pd.testing.assert_frame_equal(_canon(res[k]), _canon(res2[k]), check_dtype=False)


def test_state_shard_apply_idempotent(ray_session):
    """A retried map task re-issues its applies with the same
    content-derived apply_id — the shard must drop the replay so window
    sums don't double-count (exactly-once under intra-epoch retry)."""
    import numpy as np
    import pandas as pd
    import ray

    from dataflow_mm_ray.state.store import StateShard

    sh = StateShard.remote(0, 3600, 1800, 7200)
    partials = pd.DataFrame(
        {"conv_id": ["c1"], "window_start_us": [np.int64(0)], "n_turns": [np.int64(2)],
         "n_user_turns": [np.int64(1)], "n_tool_calls": [np.int64(0)],
         "sum_chars": [np.int64(10)]}
    )
    aid = (0, 0, 12345, 1)
    ray.get(sh.apply.remote(partials, None, None, None, apply_id=aid))
    ray.get(sh.apply.remote(partials, None, None, None, apply_id=aid))  # retry replay
    out = ray.get(sh.finalize.remote(wm_us=1 << 60, flush=True))
    win = out["windows"]
    assert len(win) == 1
    assert int(win["n_turns"].iloc[0]) == 2  # not 4
    # after finalize the epoch's ids are cleared: a NEW epoch may reuse
    # content (it won't in practice, ids embed the epoch) and applies land
    ray.get(sh.apply.remote(partials, None, None, None, apply_id=aid))
    out2 = ray.get(sh.finalize.remote(wm_us=1 << 60, flush=True))
    assert int(out2["windows"]["n_turns"].iloc[0]) == 2


def test_watermark_tie_tool_turn_not_gced(ray_session):
    """A tool response at ts == watermark is NOT settled (late means
    ts < wm): it must survive GC and serve an invocation arriving at
    the same timestamp in a later epoch."""
    import numpy as np
    import pandas as pd
    import ray

    from dataflow_mm_ray.state.store import StateShard

    US = 1_000_000
    sh = StateShard.remote(0, 3600, 1800, 7200)
    T = 1_000_000 * US
    # epoch 1: only the tool response, at exactly what will become wm
    tool_ev = pd.DataFrame(
        {"conv_id": ["c"], "kind": ["tool"], "turn_idx": [np.int32(2)],
         "tool": [None], "ts_us": [np.int64(T)]}
    )
    ray.get(sh.apply.remote(None, None, tool_ev, None, apply_id=(1, 0, 1, 1)))
    out1 = ray.get(sh.finalize.remote(wm_us=T, flush=False))
    assert len(out1["joins"]) == 0  # nothing emitted, nothing lost
    # epoch 2: the invocation arrives at the same ts (not late: ts == wm)
    inv_ev = pd.DataFrame(
        {"conv_id": ["c"], "kind": ["inv"], "turn_idx": [np.int32(1)],
         "tool": ["tool_x"], "ts_us": [np.int64(T)]}
    )
    ray.get(sh.apply.remote(None, None, inv_ev, None, apply_id=(2, 0, 1, 2)))
    out2 = ray.get(sh.finalize.remote(wm_us=T + US, flush=True))
    j = out2["joins"]
    assert len(j) == 1
    assert j["response_idx"].iloc[0] == 2.0  # matched, not NaN


def test_apply_id_distinguishes_conversations(ray_session):
    """Two same-epoch blocks whose rows tie on (ts, turn_idx) but
    belong to DIFFERENT conversations must both apply (the digest folds
    the conv hash — neither is a 'replay' of the other)."""
    import numpy as np
    import pandas as pd
    import ray

    from dataflow_mm_ray.hashing import stable_hash_array
    from dataflow_mm_ray.state.store import StateShard

    def digest(conv, ts, idx):
        ch = stable_hash_array(np.asarray([conv], dtype=object))
        t = np.asarray([ts], dtype=np.int64).view(np.uint64)
        ti = np.asarray([idx], dtype=np.int64).view(np.uint64)
        x = ch ^ (t * np.uint64(0x9E3779B97F4A7C15)) ^ (ti + np.uint64(0x94D049BB133111EB))
        x ^= x >> np.uint64(30); x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27); x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return (0, 0, 1, int(np.bitwise_xor.reduce(x)))

    id_a = digest("conv-a", 123, 0)
    id_b = digest("conv-b", 123, 0)
    assert id_a != id_b

    sh = StateShard.remote(0, 3600, 1800, 7200)
    for conv, aid in (("conv-a", id_a), ("conv-b", id_b)):
        partials = pd.DataFrame(
            {"conv_id": [conv], "window_start_us": [np.int64(0)],
             "n_turns": [np.int64(1)], "n_user_turns": [np.int64(1)],
             "n_tool_calls": [np.int64(0)], "sum_chars": [np.int64(5)]}
        )
        ray.get(sh.apply.remote(partials, None, None, None, apply_id=aid))
    out = ray.get(sh.finalize.remote(wm_us=1 << 60, flush=True))
    assert len(out["windows"]) == 2  # both conversations applied


def _batch_asof_expect(sf_dir):
    """Pandas twin of the streamed as-of enrichment: latest strictly-
    prior click turn per (conv, turn_idx order)."""
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(sf_dir).to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    )
    conv = t["conv_id"].to_numpy()
    n = len(t)
    starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
    grp_start = np.repeat(starts, np.diff(np.r_[starts, n]))
    pos = np.arange(n, dtype=np.int64)
    is_click = t["text"].str.startswith("click ").to_numpy()
    run = np.maximum.accumulate(np.where(is_click, pos, np.int64(-1)))
    prior = np.empty(n, dtype=np.int64)
    prior[0] = -1
    prior[1:] = run[:-1]
    valid = prior >= grp_start
    safe = np.maximum(prior, 0)
    idx = t["turn_idx"].to_numpy(dtype=np.int64)
    ts_us = t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": idx.astype(np.int32),
            "prior_click_turn_idx": np.where(valid, idx[safe].astype(np.float64), np.nan),
            "prior_click_ts_us": np.where(valid, ts_us[safe].astype(np.float64), np.nan),
        }
    )


def test_asof_stream_matches_batch(ray_session, transcripts_path, tmp_path):
    eng = _run_engine(transcripts_path, tmp_path / "out", BIG_LATENESS)
    got = eng.results()["asof"]
    want = _batch_asof_expect(SF_TINY)
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


def test_asof_staged_watermarks_deterministic(ray_session, transcripts_path, tmp_path):
    """With finite lateness the enrichment is computed over non-late
    turns only, emitted as watermarks advance — deterministic, and
    every non-late turn is enriched exactly once."""
    import pyarrow.parquet as pq

    eng = _run_engine(transcripts_path, tmp_path / "a", 3600)
    res = eng.results()
    n_input = pq.read_table(transcripts_path).num_rows
    assert len(res["asof"]) + len(res["late"]) == n_input
    assert res["asof"]["turn_idx"].ge(0).all()
    eng2 = _run_engine(transcripts_path, tmp_path / "b", 3600)
    pd.testing.assert_frame_equal(
        _canon(res["asof"]), _canon(eng2.results()["asof"]), check_dtype=False
    )


def test_resume_config_mismatch_raises(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    out = tmp_path / "out"
    _run_engine(transcripts_path, out, 3600, stop_after=1)
    with pytest.raises(ValueError, match="resume config mismatch"):
        StreamingEngine(
            str(transcripts_path), str(out), n_epochs=5, n_shards=3,
            width_s=WIDTH_S, gap_s=GAP_S + 1, lateness_s=3600,
        )


def test_prepare_epoch_mismatch_raises(ray_session, transcripts_path):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    with pytest.raises(ValueError, match="already prepared"):
        prepare_transcripts(SF_TINY, str(transcripts_path), n_epochs=7)
    # arrival-mode mismatch on an already-prepared dir is just as fatal
    # (the epoch layout encodes the mode)
    with pytest.raises(ValueError, match="already prepared"):
        prepare_transcripts(SF_TINY, str(transcripts_path), n_epochs=5,
                            arrival="by_ts")


def test_by_ts_arrival_kill_resume_identical(ray_session, tmp_path):
    """Kill-and-resume in the production arrival mode (the 100M-turn
    drill of BASELINE.md at unit scale): a run killed mid-stream and
    resumed by a fresh engine commits exactly what an uninterrupted run
    commits."""
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    bypath = prepare_transcripts(SF_TINY, str(tmp_path / "by_ts"),
                                 arrival="by_ts")
    want = _run_engine(bypath, tmp_path / "full", 3600).results()
    out = tmp_path / "resumed"
    _run_engine(bypath, out, 3600, stop_after=1)
    got = _run_engine(bypath, out, 3600).results()
    for k in want:
        pd.testing.assert_frame_equal(_canon(got[k]), _canon(want[k]),
                                      check_dtype=False)


def test_by_ts_arrival_bounded_state_matches_hash_arrival(
    ray_session, transcripts_path, tmp_path
):
    """The production arrival shape: event-time-ordered epochs + a
    FINITE lateness quarantine nothing (epoch k+1 rows all sit at or
    above every earlier watermark), emit progressively (bounded state —
    windows commit before the flush epoch), and settle to EXACTLY the
    content of the adversarial hash-arrival lateness-∞ run for every
    arrival-invariant stream (upserts' revision rows are per-epoch by
    construction; their is_final materialization is compared instead)."""
    from dataflow_mm_ray.streaming.engine import prepare_transcripts
    from dataflow_mm_ray.streaming.sink import EpochSink

    bypath = prepare_transcripts(SF_TINY, str(tmp_path / "by_ts"),
                                 arrival="by_ts")
    out = tmp_path / "byts-out"
    eng = _run_engine(bypath, out, 3600)
    got = eng.results()
    assert len(got["late"]) == 0

    # progressive settlement: some window closed before the flush epoch
    sink = EpochSink(str(out), ["windows"])
    pre_flush = [e for e in sink.committed_epochs("windows") if e < 4]
    assert sum(
        __import__("json").load(open(sink._manifest_path("windows", e)))["rows"]
        for e in pre_flush
    ) > 0

    want = _run_engine(transcripts_path, tmp_path / "hash-out",
                       BIG_LATENESS).results()
    assert len(want["late"]) == 0
    for stream in want:
        if stream in ("late", "upserts"):
            continue
        pd.testing.assert_frame_equal(
            _canon(got[stream]), _canon(want[stream]), check_dtype=False
        )
    for ups, base in ((got["upserts"], got["windows"]),
                      (want["upserts"], want["windows"])):
        finals = ups[ups["is_final"]].drop(columns=["revision", "is_final"])
        pd.testing.assert_frame_equal(
            _canon(finals), _canon(base), check_dtype=False
        )


def test_checkpoints_pruned(ray_session, transcripts_path, tmp_path):
    import os

    eng = _run_engine(transcripts_path, tmp_path / "out", BIG_LATENESS)
    names = os.listdir(eng.checkpoint_dir)
    epochs = sorted({int(n.split("-")[1].removesuffix(".json")) for n in names if n.startswith("ckpt-")})
    # only the latest checkpoint (plus one safety epoch) survives
    assert epochs == [3, 4]
    assert not any(n.startswith("state-0") or n.startswith("state-1") for n in names)


def test_counter_key_collision_safe(ray_session, tmp_path):
    """A real conversation literally named '__counter__' must flow
    through the late stream untouched (counters ride a marker column,
    not a magic key)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_mm_ray.streaming.engine import StreamingEngine

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    t = pd.DataFrame(
        {
            "conv_id": ["__counter__", "__counter__", "conv-x"],
            "turn_idx": np.array([0, 1, 0], dtype=np.int32),
            "role": ["user", "assistant", "user"],
            "text": ["early", "late arrival", "other"],
            "tool": [None, None, None],
            "ts": pd.to_datetime([10**15, 1, 10**15], unit="us"),
        }
    )
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), tdir / "t.parquet")
    eng = StreamingEngine(str(tdir), str(tmp_path / "out"), n_epochs=2, n_shards=2,
                          width_s=WIDTH_S, gap_s=GAP_S, lateness_s=0)
    eng.run()
    res = eng.results()
    n_late = len(res["late"])
    applied = res["windows"]["n_turns"].sum()
    assert n_late + applied == 3  # nothing swallowed by counter filtering
    if n_late:
        assert set(res["late"]["conv_id"]).issubset({"__counter__", "conv-x"})


def _batch_cep_chain(turns_df: pd.DataFrame) -> pd.DataFrame:
    """Batch skip_past chain over a pandas transcript frame, mapped to
    the streamed emission schema (int64 ts columns)."""
    from dataflow_mm_ray.stages.cep import tool_chain_kernel

    t = turns_df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    out = tool_chain_kernel(t, "skip_past")
    out["ts_start_us"] = out.pop("ts_start").astype("datetime64[us]").astype(np.int64)
    out["ts_end_us"] = out.pop("ts_end").astype("datetime64[us]").astype(np.int64)
    return out


def test_cep_stream_matches_batch_when_nothing_late(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    eng = _run_engine(transcripts_path, tmp_path / "out", BIG_LATENESS)
    got = eng.results()["cep"]
    assert len(got) > 0
    want = _batch_cep_chain(transcripts_from_events(SF_TINY).to_pandas())
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


@pytest.mark.parametrize("lateness_s", [0, 3600])
def test_cep_stream_matches_batch_over_applied_rows(ray_session, transcripts_path, tmp_path, lateness_s):
    # with a tight watermark the quarantined rows never reach the
    # automaton: committed cep == batch kernel over the non-late subset
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    eng = _run_engine(transcripts_path, tmp_path / f"out{lateness_s}", lateness_s)
    res = eng.results()
    late = res["late"]
    assert len(late) > 0
    t = transcripts_from_events(SF_TINY).to_pandas()
    late_keys = set(zip(late["conv_id"], late["turn_idx"].astype(int)))
    applied = t[[
        (c, int(i)) not in late_keys for c, i in zip(t["conv_id"], t["turn_idx"])
    ]]
    want = _batch_cep_chain(applied)
    got = res["cep"]
    if not len(got):  # a stream with zero committed files has no columns
        assert len(want) == 0
        return
    assert len(want) > 0  # 3600s lateness must leave some chains
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


def test_cep_state_bounded_by_within_window(ray_session, transcripts_path, tmp_path):
    # pending CEP rows after each non-flush finalize are only unstable
    # rows or rows from the first undecided candidate on — i.e. the
    # within window, never the whole history
    import ray as _ray

    from dataflow_mm_ray.streaming.engine import StreamingEngine

    eng = StreamingEngine(
        transcripts_path, str(tmp_path / "out"), n_epochs=5, n_shards=3,
        width_s=WIDTH_S, gap_s=GAP_S, lateness_s=0,
    )
    eng.run(stop_after=2)  # three epochs, no flush yet
    stats = _ray.get([sh.stats.remote() for sh in eng.shards])
    # the invariant: pending counts stay far below the total
    # invoke/response rows seen (half the stream) — pruning works
    import pyarrow.parquet as pq

    total = pq.read_table(transcripts_path).num_rows
    assert sum(s["pending_cep"] for s in stats) < total / 2


def _batch_alerts(turns_df: pd.DataFrame) -> pd.DataFrame:
    """Batch '!' kernel over a pandas transcript frame, mapped to the
    streamed alerts schema."""
    from dataflow_mm_ray.stages.cep import (
        ALERT_DEADLINE_S,
        TOOL_ROUNDTRIP_STEPS,
        match_pattern_kernel,
    )

    t = turns_df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    steps = (TOOL_ROUNDTRIP_STEPS[0],
             (TOOL_ROUNDTRIP_STEPS[1][0], TOOL_ROUNDTRIP_STEPS[1][1], "!"))
    out = match_pattern_kernel(t, steps, within_us=ALERT_DEADLINE_S * 10**6,
                               policy="all", carry=("tool",))
    return pd.DataFrame({
        "conv_id": out["conv_id"],
        "alert_seq": out["match_seq"].astype(np.int64),
        "invoke_turn_idx": out["invoke_turn_idx"].astype(np.int64),
        "tool": out["tool"],
        "ts_invoke_us": out["ts_start"].astype("datetime64[us]").astype(np.int64),
    })


@pytest.mark.parametrize("lateness_s", [10**9, 3600])
def test_alerts_stream_matches_batch(ray_session, transcripts_path, tmp_path, lateness_s):
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    eng = _run_engine(transcripts_path, tmp_path / f"out{lateness_s}", lateness_s)
    res = eng.results()
    t = transcripts_from_events(SF_TINY).to_pandas()
    late = res["late"]
    if len(late):
        lk = set(zip(late["conv_id"], late["turn_idx"].astype(int)))
        t = t[[(c, int(i)) not in lk for c, i in zip(t["conv_id"], t["turn_idx"])]]
    want = _batch_alerts(t)
    got = res["alerts"]
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )
    # deadline carried correctly
    d = got["deadline_us"] - got["ts_invoke_us"]
    assert (d == eng.alert_deadline_s * 10**6).all()


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_upsert_stream_materializes_to_windows(ray_session, transcripts_path, tmp_path,
                                               lateness_s):
    """Update-mode changelog invariants: per-key revisions are
    contiguous from 1; exactly one is_final row per key; the is_final
    rows reproduce the append-mode ``windows`` stream exactly; and the
    max-revision row per key IS the final row (so a consumer
    materializing latest-state-per-key lands on the closed aggregate)."""
    keyc = ["conv_id", "window_start_us"]
    eng = _run_engine(transcripts_path, tmp_path / f"up{lateness_s}", lateness_s)
    res = eng.results()
    up = res["upserts"]
    win = res["windows"]
    assert len(up) >= len(win) > 0

    g = up.sort_values(keyc + ["revision"]).groupby(keyc)["revision"]
    assert (g.min() == 1).all()
    assert g.apply(
        lambda s: (s.to_numpy() == np.arange(1, len(s) + 1)).all()
    ).all()

    finals = up[up["is_final"]]
    assert (finals.groupby(keyc).size() == 1).all()
    pd.testing.assert_frame_equal(
        _canon(finals[win.columns.tolist()]), _canon(win), check_dtype=False
    )

    latest = up.loc[up.groupby(keyc)["revision"].idxmax()]
    assert latest["is_final"].all()

    # the stream genuinely revises: with 5 arrival epochs some window
    # must have been updated across epochs before closing
    assert (up["revision"] > 1).any()


def _batch_wtopk(t: pd.DataFrame, width_s: int) -> pd.DataFrame:
    from dataflow_mm_ray.stages.stats import TOP_TOOLS_K, window_topk_cut

    inv = t[(t["role"] == "assistant") & t["tool"].notna()]
    us = inv["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    width_us = width_s * 10**6
    counts = (
        pd.DataFrame({"window_start_us": (us // width_us) * width_us,
                      "tool": inv["tool"].to_numpy()})
        .groupby(["window_start_us", "tool"], as_index=False).size()
        .rename(columns={"size": "n_invocations"})
    )
    return window_topk_cut(counts, TOP_TOOLS_K)


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_wtopk_stream_matches_batch(ray_session, transcripts_path, tmp_path, lateness_s):
    """Streamed windowed top-k tools == the batch kernel over the
    applied (non-late) rows: per-shard exact (window, tool) partials,
    cross-shard sum at window close, shared rank cut."""
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    eng = _run_engine(transcripts_path, tmp_path / f"wt{lateness_s}", lateness_s)
    res = eng.results()
    t = transcripts_from_events(SF_TINY).to_pandas()
    late = res["late"]
    if len(late):
        lk = set(zip(late["conv_id"], late["turn_idx"].astype(int)))
        t = t[[(c, int(i)) not in lk for c, i in zip(t["conv_id"], t["turn_idx"])]]
    want = _batch_wtopk(t, WIDTH_S)
    got = res["wtopk"]
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )
    # every committed window emits at most k rows with contiguous ranks
    g = got.sort_values(["window_start_us", "rank"]).groupby("window_start_us")["rank"]
    assert g.apply(lambda s: (s.to_numpy() == np.arange(1, len(s) + 1)).all()).all()


def _batch_wlat(t: pd.DataFrame, width_s: int) -> pd.DataFrame:
    """Exact per-response-window latency order stats from a pandas
    transcript frame (the wlat stream's ground truth)."""
    from dataflow_mm_ray.stages.join import _join_partition

    part = t.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    j = _join_partition(part, with_response_ts=True)
    lat = j["latency_us"].to_numpy()
    m = np.isfinite(lat)
    rts = j["ts_response_us"].to_numpy()[m].astype(np.int64)
    width_us = width_s * 10**6
    df = pd.DataFrame({"w": (rts // width_us) * width_us, "lat": lat[m].astype(np.int64)})
    rows = []
    for w, g in df.groupby("w", sort=True):
        v = np.sort(g["lat"].to_numpy())
        n = len(v)
        rows.append((int(w), n,
                     int(v[max(1, int(np.ceil(0.5 * n))) - 1]),
                     int(v[max(1, int(np.ceil(0.95 * n))) - 1])))
    return pd.DataFrame(rows, columns=["window_start_us", "n_matched",
                                       "exact_p50_us", "exact_p95_us"])


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_wlat_stream_bounds_and_counts(ray_session, transcripts_path, tmp_path, lateness_s):
    """Streamed windowed-latency histograms: per-window match counts are
    EXACT vs the batch join over applied rows; approx percentiles obey
    the documented nearest-rank bound exact <= approx <= exact*2^(1/4)+1."""
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    eng = _run_engine(transcripts_path, tmp_path / f"wl{lateness_s}", lateness_s)
    res = eng.results()
    t = transcripts_from_events(SF_TINY).to_pandas()
    late = res["late"]
    if len(late):
        lk = set(zip(late["conv_id"], late["turn_idx"].astype(int)))
        t = t[[(c, int(i)) not in lk for c, i in zip(t["conv_id"], t["turn_idx"])]]
    want = _batch_wlat(t, WIDTH_S)
    got = res["wlat"].sort_values("window_start_us").reset_index(drop=True)
    assert len(want) > 0
    merged = want.merge(got, on="window_start_us", how="outer", indicator=True)
    assert (merged["_merge"] == "both").all()
    pd.testing.assert_series_equal(
        merged["n_matched_x"].astype(np.int64), merged["n_matched_y"].astype(np.int64),
        check_names=False,
    )
    for q in ("p50", "p95"):
        exact = merged[f"exact_{q}_us"].to_numpy(dtype=np.float64)
        approx = merged[f"approx_{q}_us"].to_numpy(dtype=np.float64)
        assert (exact <= approx).all()
        assert (approx <= exact * 2 ** 0.25 + 1).all()


def _batch_wdedup(t: pd.DataFrame, width_s: int) -> pd.DataFrame:
    from dataflow_mm_ray.stages.dedup import _EVENT_ID_RE

    ts_us = t["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    width_us = width_s * 10**6
    df = pd.DataFrame(
        {"window_start_us": (ts_us // width_us) * width_us,
         "k": t["text"].str.replace(_EVENT_ID_RE, " ", regex=True).to_numpy(),
         "conv_id": t["conv_id"].to_numpy(),
         "turn_idx": t["turn_idx"].to_numpy(dtype=np.int64),
         "ts_us": ts_us}
    ).sort_values(["ts_us", "conv_id", "turn_idx"], kind="mergesort")
    counts = df.groupby(["window_start_us", "k"], sort=False).size()
    win = df.drop_duplicates(subset=["window_start_us", "k"], keep="first")
    return pd.DataFrame(
        {"window_start_us": win["window_start_us"].to_numpy(dtype=np.int64),
         "conv_id": win["conv_id"].to_numpy(),
         "turn_idx": win["turn_idx"].to_numpy(dtype=np.int64),
         "ts_us": win["ts_us"].to_numpy(dtype=np.int64),
         "n_copies": counts.loc[
             pd.MultiIndex.from_frame(win[["window_start_us", "k"]])
         ].to_numpy(dtype=np.int64)}
    )


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600])
def test_wdedup_stream_matches_batch(ray_session, transcripts_path, tmp_path, lateness_s):
    """Streamed windowed exact dedup == the batch first-per-(window,
    key) kernel over applied rows: key-hash-routed shard state, winner
    min over (ts, conv_id, turn_idx), summed copy counts."""
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    eng = _run_engine(transcripts_path, tmp_path / f"wd{lateness_s}", lateness_s)
    res = eng.results()
    t = transcripts_from_events(SF_TINY).to_pandas()
    late = res["late"]
    if len(late):
        lk = set(zip(late["conv_id"], late["turn_idx"].astype(int)))
        t = t[[(c, int(i)) not in lk for c, i in zip(t["conv_id"], t["turn_idx"])]]
    want = _batch_wdedup(t, WIDTH_S)
    got = res["wdedup"].copy()
    got["turn_idx"] = got["turn_idx"].astype(np.int64)
    assert len(want) > 0
    if lateness_s == BIG_LATENESS:
        assert (want["n_copies"] > 1).any()  # real in-window duplication exercised
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want), check_dtype=False
    )


# --- r5: ts-bounds robustness + arrival-regime pinning ---------------------


def test_ts_bounds_footer_stats_match_scan(ray_session):
    """The footer-statistics bounds must equal the exact column min/max
    (the by_ts epoch boundaries depend on them bit-for-bit)."""
    import duckdb

    from dataflow_mm_ray.streaming.engine import _ts_bounds_us

    lo, hi = _ts_bounds_us(SF_TINY)
    want_lo, want_hi = duckdb.execute(
        "SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM read_parquet(?)",
        [f"{SF_TINY}/events.parquet"],
    ).fetchone()
    assert (lo, hi) == (want_lo, want_hi)


def test_ts_bounds_empty_events_raises(tmp_path):
    """Empty events table -> loud ValueError, not NaT int64-min epoch
    bounds (r4 ADVICE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_mm_ray.streaming.engine import _ts_bounds_us

    d = tmp_path / "emptysf"
    d.mkdir()
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    pq.write_table(schema.empty_table(), str(d / "events.parquet"))
    with pytest.raises(ValueError, match="empty"):
        _ts_bounds_us(str(d))


def test_ts_bounds_multifile_directory(ray_session, tmp_path):
    """A directory-of-parquet events table (the cluster shape) works and
    gives the union bounds across files."""
    import duckdb
    import pyarrow.parquet as pq

    from dataflow_mm_ray.streaming.engine import _ts_bounds_us

    d = tmp_path / "multisf"
    (d / "events.parquet").mkdir(parents=True)
    t = pq.read_table(f"{SF_TINY}/events.parquet")
    half = len(t) // 2
    pq.write_table(t.slice(0, half), str(d / "events.parquet" / "part-0.parquet"))
    pq.write_table(t.slice(half), str(d / "events.parquet" / "part-1.parquet"))
    lo, hi = _ts_bounds_us(str(d))
    want_lo, want_hi = duckdb.execute(
        "SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM read_parquet(?)",
        [f"{SF_TINY}/events.parquet"],
    ).fetchone()
    assert (lo, hi) == (want_lo, want_hi)


def test_resume_rejects_arrival_regime_mix(ray_session, tmp_path):
    """A checkpointed out_dir must refuse to resume against an input
    prepared with the OTHER arrival mode but the same n_epochs — the
    epoch layouts differ, so rows would drop/double-process (r4
    ADVICE)."""
    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts

    h = prepare_transcripts(SF_TINY, str(tmp_path / "hash"), n_epochs=4)
    b = prepare_transcripts(
        SF_TINY, str(tmp_path / "byts"), n_epochs=4, arrival="by_ts"
    )
    out = tmp_path / "out"
    eng = StreamingEngine(h, str(out), n_epochs=4, n_shards=2,
                          width_s=WIDTH_S, gap_s=GAP_S, lateness_s=BIG_LATENESS)
    eng.run(stop_after=2)  # leaves a checkpoint behind
    with pytest.raises(ValueError, match="arrival"):
        StreamingEngine(b, str(out), n_epochs=4, n_shards=2,
                        width_s=WIDTH_S, gap_s=GAP_S, lateness_s=BIG_LATENESS)


# --- r5: Arrow state snapshots ---------------------------------------------


def test_state_snapshot_roundtrip_and_layout_guard(tmp_path):
    """Arrow snapshot roundtrip preserves every state class bit-for-bit
    (frames incl. int32/bool plugin columns, seq dicts, register
    bytes); legacy pickle files and foreign layout versions are refused
    loudly."""
    import pickle

    import pyarrow.parquet as pq

    from dataflow_mm_ray.state.store import (
        _ShardState, read_state_snapshot, write_state_snapshot)

    st = _ShardState(3600, 1800, 7200)
    st.windows = pd.DataFrame({
        "conv_id": ["conv-a", "conv-a", "conv-b"],
        "window_start_us": np.array([0, 3600_000000, 0], dtype=np.int64),
        "n_turns": np.array([3, 1, 2], dtype=np.int64),
        "n_user_turns": np.array([1, 0, 1], dtype=np.int64),
        "n_tool_calls": np.array([1, 1, 0], dtype=np.int64),
        "sum_chars": np.array([30, 10, 20], dtype=np.int64),
    })
    st.session_seq = {"conv-a": 4, "conv-b": 1}
    st.asof_last = {"conv-a": (7, 123456)}
    st.dcount = {0: bytes(np.zeros(16, dtype=np.uint8))}
    st.wlat = {3600_000000: np.arange(4, dtype=np.int64).tobytes()}
    st.proc_state["sdup"] = pd.DataFrame({
        "bb": np.array([65536], dtype=np.int64),
        "sh64": np.array([-5], dtype=np.int64),
        "conv_id": ["conv-a"],
        "turn_idx": np.array([2], dtype=np.int32),
        "ts_us": np.array([99], dtype=np.int64),
        "is_winner": np.array([True]),
    })
    p = str(tmp_path / "snap.parquet")
    write_state_snapshot(st, p)
    back = read_state_snapshot(p, 3600, 1800, 7200)
    pd.testing.assert_frame_equal(back.windows, st.windows)
    pd.testing.assert_frame_equal(back.proc_state["sdup"], st.proc_state["sdup"])
    assert back.proc_state["sdup"]["turn_idx"].dtype == np.int32
    assert back.proc_state["sdup"]["is_winner"].dtype == bool
    assert back.session_seq == st.session_seq
    assert back.asof_last == st.asof_last
    assert back.dcount == st.dcount and back.wlat == st.wlat
    # untouched state classes restore to canonical empties
    assert len(back.dedup) == 0 and len(back.sessions) == 0
    assert back.win_chunks == []

    legacy = str(tmp_path / "legacy.pkl")
    with open(legacy, "wb") as f:
        pickle.dump(st, f)
    with pytest.raises(ValueError, match="not an Arrow state snapshot"):
        read_state_snapshot(legacy, 3600, 1800, 7200)

    t = pq.read_table(p).replace_schema_metadata(
        {b"dataflow_mm_ray_state_layout": b"999"})
    pq.write_table(t, str(tmp_path / "v999.parquet"))
    with pytest.raises(ValueError, match="layout"):
        read_state_snapshot(str(tmp_path / "v999.parquet"), 3600, 1800, 7200)


def test_state_snapshot_refuses_staged_chunks(tmp_path):
    from dataflow_mm_ray.state.store import _ShardState, write_state_snapshot

    st = _ShardState(3600, 1800, 7200)
    st.win_chunks.append(pd.DataFrame({"conv_id": ["x"]}))
    with pytest.raises(RuntimeError, match="staged chunks"):
        write_state_snapshot(st, str(tmp_path / "bad.parquet"))


# --- r5: state spill (bounded-memory adversarial drill) --------------------


@pytest.mark.parametrize("lateness_s", [BIG_LATENESS, 3600, 0])
def test_spill_is_content_transparent(ray_session, transcripts_path, tmp_path,
                                      lateness_s):
    """spill_mb=0 (every finalize pages all event-buffer state to disk,
    flush runs bucket-by-bucket) must commit streams identical to the
    never-spilled run at every lateness regime — spilling is an
    execution detail, not a semantics knob."""
    from dataflow_mm_ray.streaming.engine import StreamingEngine
    from dataflow_mm_ray.streaming.processor import (
        GlobalDedupFirst, SimhashNearDupFirst)

    def run(out, **kw):
        eng = StreamingEngine(
            transcripts_path, str(out), n_epochs=5, n_shards=3,
            width_s=WIDTH_S, gap_s=GAP_S, lateness_s=lateness_s,
            processors=[SimhashNearDupFirst(), GlobalDedupFirst()], **kw)
        eng.run()
        return eng.results()

    a = run(tmp_path / "nospill")
    b = run(tmp_path / "spill", spill_mb=0)
    assert set(a) == set(b)
    for stream in a:
        pd.testing.assert_frame_equal(
            _canon(a[stream]), _canon(b[stream]), check_dtype=False)


def test_spill_kill_resume_and_spilled_rescale(ray_session, transcripts_path,
                                               tmp_path):
    """Checkpoints carry the spill-segment list; a killed spilled run
    resumes to output identical to an uninterrupted one — including
    THROUGH a rescale: disk-spilled segments are re-routed to the new
    shard count by the same per-section rules as resident state
    (rescale._resplit_spill_segments), so a big spilled job can resize
    instead of refusing."""
    from dataflow_mm_ray.streaming.engine import StreamingEngine
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst
    from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

    kw = dict(n_epochs=5, width_s=WIDTH_S, gap_s=GAP_S,
              lateness_s=3600, spill_mb=0,
              processors=[SimhashNearDupFirst()])
    full = StreamingEngine(transcripts_path, str(tmp_path / "full"),
                           n_shards=3, **kw)
    full.run()
    fr = full.results()

    # plain kill-resume at the same shard count
    kill = StreamingEngine(transcripts_path, str(tmp_path / "kill"),
                           n_shards=3, **kw)
    kill.run(stop_after=2)
    resumed = StreamingEngine(transcripts_path, str(tmp_path / "kill"),
                              n_shards=3, **kw)
    resumed.run()
    rr = resumed.results()
    for stream in fr:
        pd.testing.assert_frame_equal(
            _canon(fr[stream]), _canon(rr[stream]), check_dtype=False)

    # kill -> RESCALE 3 -> 6 shards with spilled segments -> resume
    kill2 = StreamingEngine(transcripts_path, str(tmp_path / "kill2"),
                            n_shards=3, **kw)
    kill2.run(stop_after=2)
    meta = rescale_checkpoint(str(tmp_path / "kill2"), 6,
                              processors=[SimhashNearDupFirst()])
    assert meta["config"]["n_shards"] == 6
    resumed6 = StreamingEngine(transcripts_path, str(tmp_path / "kill2"),
                               n_shards=6, **kw)
    resumed6.run()
    r6 = resumed6.results()
    for stream in fr:
        pd.testing.assert_frame_equal(
            _canon(fr[stream]), _canon(r6[stream]), check_dtype=False)


def test_spill_seq_continues_after_restart_and_prunes(ray_session, tmp_path):
    """(r5 review) A recreated shard (crash -> actor restart) must
    continue the spill-segment filename sequence past every file
    already on disk — restarting at 0 would overwrite a segment a
    restored checkpoint still references (rows silently lost or
    double-processed at flush). And segments nothing references anymore
    are reclaimed after two snapshots (the engine retains the latest
    checkpoint + one prior), so a long spilled run's disk stays
    O(state), not O(n_epochs x state)."""
    import os

    import ray

    from dataflow_mm_ray.state.store import StateShard

    spill = tmp_path / "spill"
    spill.mkdir()
    # a pre-existing segment, as after a crash mid-run — plus one past
    # the 6-digit format width ({:06d} grows; the restart scan must
    # still see it or seq 1000000 would be written twice)
    (spill / "inv-000007.parquet").write_bytes(b"stale")
    (spill / "tool-1000000.parquet").write_bytes(b"stale-wide")

    # the first incarnation spells the dir differently (as a resume
    # with --out ./out vs out would): pruning must compare REAL paths,
    # or every restored live segment reads as unreferenced and dies
    def mk(odd_spelling=False):
        d = (str(tmp_path) + "/./spill") if odd_spelling else str(spill)
        return StateShard.remote(0, 3600, 1800, 7200, spill_dir=d,
                                 spill_threshold_bytes=0)

    def pend(sh, conv, aid):
        inv = pd.DataFrame({"conv_id": [conv], "kind": ["inv"],
                            "turn_idx": [np.int32(1)], "tool": ["t"],
                            "ts_us": [np.int64(10**15)]})
        ray.get(sh.apply.remote(None, None, inv, None, apply_id=aid))

    import re

    def seqs():
        return {n: int(m.group(1)) for n in os.listdir(spill)
                if (m := re.search(r"-(\d{6,})\.parquet$", n))}

    sh = mk(odd_spelling=True)
    pend(sh, "conv-1", (1, 0, 1, 1))
    ray.get(sh.finalize.remote(wm_us=0, flush=False))  # threshold 0 -> spills
    s1 = seqs()
    stale = {"inv-000007.parquet", "tool-1000000.parquet"}
    assert min(v for n, v in s1.items() if n not in stale) > 1000000, s1
    assert (spill / "inv-000007.parquet").read_bytes() == b"stale"  # intact
    ckpt = str(tmp_path / "ckpt.parquet")
    ray.get(sh.snapshot.remote(ckpt))                 # references round-1 files
    ray.kill(sh)

    # crash-restore: the fresh actor scans the dir and continues past
    # max(existing) — NOT back at 0 (the collision that lost/duplicated
    # segment rows)
    sh2 = mk()
    ray.get(sh2.restore.remote(ckpt))
    pend(sh2, "conv-2", (2, 0, 1, 2))
    ray.get(sh2.finalize.remote(wm_us=0, flush=False))
    s2 = seqs()
    new = set(s2) - set(s1)
    assert new and min(s2[n] for n in new) > max(s1.values()), (s1, s2)
    assert set(s1) <= set(s2)                         # nothing overwritten

    # pruning: after >= 3 snapshots the stale unreferenced file goes,
    # live segments stay
    for i in range(3):
        ray.get(sh2.snapshot.remote(str(tmp_path / f"snap-{i}.parquet")))
    names = set(seqs())
    assert "inv-000007.parquet" not in names          # unreferenced: pruned
    assert "tool-1000000.parquet" not in names        # unreferenced: pruned
    assert new <= names                               # live: kept
    # round-1 segments were recorded under the './'-spelled dir by the
    # first incarnation; real-path comparison must have kept them
    assert set(s1) - stale <= names
    # the shard still reads its live segment back intact
    out = ray.get(sh2.finalize.remote(wm_us=1 << 60, flush=True))
    assert set(out["joins"]["conv_id"]) == {"conv-1", "conv-2"}
    ray.kill(sh2)


def test_processor_hash_stable_across_processes_and_sees_bases(ray_session):
    """(r5 review) The plugin code hash must be identical for a
    byte-identical processor across interpreter restarts — an attribute
    holding an object with the default repr ('<X object at 0x..>')
    previously folded a memory address into the hash, refusing every
    valid resume. Conversely an edited USER base-class body must change
    the hash (it changes emission semantics like an edited leaf)."""
    from dataflow_mm_ray.streaming.engine import _processor_code_hash
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst

    class Helper:
        pass  # default repr embeds id()

    a = SimhashNearDupFirst()
    b = SimhashNearDupFirst()
    a.helper, b.helper = Helper(), Helper()  # distinct addresses
    assert _processor_code_hash(a) == _processor_code_hash(b)

    class Base(SimhashNearDupFirst):
        def helper_rule(self):
            return 1

    class Leaf(Base):
        pass

    class Base2(SimhashNearDupFirst):
        def helper_rule(self):
            return 2  # edited inherited body

    class Leaf2(Base2):
        pass

    Leaf2.__name__ = Leaf.__name__  # same leaf name, edited base
    assert _processor_code_hash(Leaf()) != _processor_code_hash(Leaf2())

    # the BUILT-IN processors' own bodies must be in the hash (only the
    # abstract StatefulProcessor contract is excluded): two built-ins
    # forced to identical instance config must still hash differently
    from dataflow_mm_ray.streaming.processor import GlobalDedupFirst

    x, y = SimhashNearDupFirst(), GlobalDedupFirst()
    y.__dict__ = dict(x.__dict__)  # identical cfg -> only CODE differs
    assert _processor_code_hash(x) != _processor_code_hash(y)

    # a function-valued config attr is hashed by its SOURCE, not its
    # (masked) address repr: a swapped body refuses resume, an
    # identical one resumes
    def rule_v1(s):
        return s + 1

    def rule_v2(s):
        return s + 2

    f1, f2, f3 = (SimhashNearDupFirst() for _ in range(3))
    f1.rule, f2.rule, f3.rule = rule_v1, rule_v2, rule_v1
    assert _processor_code_hash(f1) != _processor_code_hash(f2)
    assert _processor_code_hash(f1) == _processor_code_hash(f3)


# --- r5: plugin code hashes + by_ts bounded-state pin ----------------------


def test_resume_rejects_edited_processor(ray_session, transcripts_path, tmp_path):
    """A checkpointed run must refuse to resume when a processor's CODE
    or constructor config silently changed (same name, same list) —
    replayed epochs would mix emission semantics."""
    from dataflow_mm_ray.streaming.engine import StreamingEngine
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst

    kw = dict(n_epochs=5, n_shards=2, width_s=WIDTH_S, gap_s=GAP_S,
              lateness_s=3600)
    out = tmp_path / "out"
    eng = StreamingEngine(transcripts_path, str(out), **kw,
                          processors=[SimhashNearDupFirst(max_hamming=3)])
    eng.run(stop_after=2)
    # changed constructor config, same processor name
    with pytest.raises(ValueError, match="processor_code"):
        StreamingEngine(transcripts_path, str(out), **kw,
                        processors=[SimhashNearDupFirst(max_hamming=2)])
    # edited body, same name + config
    class Edited(SimhashNearDupFirst):
        def on_watermark(self, state, wm_us, flush):
            return super().on_watermark(state, wm_us, flush)  # changed source

    with pytest.raises(ValueError, match="processor_code"):
        StreamingEngine(transcripts_path, str(out), **kw,
                        processors=[Edited(max_hamming=3)])
    # unchanged processor resumes and completes
    resumed = StreamingEngine(transcripts_path, str(out), **kw,
                              processors=[SimhashNearDupFirst(max_hamming=3)])
    resumed.run()
    assert len(resumed.results()["sdup"]) > 0


def _peak_pending_rows(eng) -> int:
    keys = ("pending_inv", "pending_tool", "pending_asof", "pending_cep",
            "pending_alerts", "open_windows", "open_sliding", "open_sessions")
    peak = 0
    for m in eng.metrics():
        tot = sum(s[k] for s in m["shard_state"] for k in keys)
        tot += sum(sum(s.get("open_proc_rows", {}).values())
                   for s in m["shard_state"])
        peak = max(peak, tot)
    return peak


def test_by_ts_state_bounded_by_disorder_horizon(ray_session, tmp_path):
    """The production claim (BASELINE.md): in by_ts arrival mode, peak
    shard state scales with the lateness (disorder) horizon, not the
    stream length. Pin it: a small-lateness run's peak pending rows
    must be a small fraction of the stream and far below the
    hold-everything lateness's peak."""
    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts

    t = prepare_transcripts(SF_TINY, str(tmp_path / "tr"), n_epochs=8,
                            arrival="by_ts")

    def peak(lateness_s, tag):
        eng = StreamingEngine(t, str(tmp_path / tag), n_epochs=8, n_shards=2,
                              width_s=WIDTH_S, gap_s=GAP_S,
                              lateness_s=lateness_s)
        eng.run()
        n_rows = sum(m["applied_rows"] for m in eng.metrics())
        return _peak_pending_rows(eng), n_rows

    small, n = peak(3600, "small")          # 1h horizon
    huge, n2 = peak(10**9, "huge")          # hold everything to flush
    assert n == n2 and n > 0
    # hold-everything peaks at ~the whole stream; the bounded-horizon
    # run must stay well under both (measured ~8x under at sf0.001)
    assert huge >= n  # every applied row (+ window rows) held at peak
    assert small <= huge / 3
    assert small <= n / 2


def test_spill_equivalence_randomized(ray_session, tmp_path):
    """Randomized harness over engine geometry: for random (epochs,
    shards, width, gap, lateness, spill threshold, bucket count,
    processor subset), the spilled run must commit streams identical to
    the never-spilled run. Exercises the read-back margin logic (ts /
    gap / width settle keys) far beyond the three fixed regimes."""
    import random

    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts
    from dataflow_mm_ray.streaming.processor import (
        GlobalDedupFirst, IncidentIntervalCount, SimhashNearDupFirst)

    rng = random.Random(20260820)
    prepared: dict[int, str] = {}
    for trial in range(5):
        n_epochs = rng.choice([3, 5, 7])
        if n_epochs not in prepared:
            prepared[n_epochs] = prepare_transcripts(
                SF_TINY, str(tmp_path / f"tr{n_epochs}"), n_epochs=n_epochs)
        cfg = dict(
            n_epochs=n_epochs,
            n_shards=rng.choice([2, 3]),
            width_s=rng.choice([1800, 3600, 7200]),
            gap_s=rng.choice([900, 1800]),
            lateness_s=rng.choice([0, 1800, 7200, 86400, BIG_LATENESS]),
        )
        procs = rng.sample(
            [SimhashNearDupFirst, GlobalDedupFirst, IncidentIntervalCount],
            k=rng.randint(0, 2))
        spill = dict(spill_mb=rng.choice([0, 1]),
                     spill_buckets=rng.choice([2, 4, 16]))
        a = StreamingEngine(prepared[n_epochs], str(tmp_path / f"a{trial}"),
                            processors=[p() for p in procs], **cfg)
        a.run()
        b = StreamingEngine(prepared[n_epochs], str(tmp_path / f"b{trial}"),
                            processors=[p() for p in procs], **cfg, **spill)
        b.run()
        ra, rb = a.results(), b.results()
        assert set(ra) == set(rb), (trial, cfg)
        for stream in ra:
            pd.testing.assert_frame_equal(
                _canon(ra[stream]), _canon(rb[stream]), check_dtype=False,
                obj=f"trial {trial} {cfg} {spill} stream {stream}")

        # third leg: kill a spilled twin mid-run, RESCALE to a random
        # shard count (disk-spilled segments re-route), resume at the
        # new count — still identical to the never-spilled run
        from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

        c1 = StreamingEngine(prepared[n_epochs], str(tmp_path / f"c{trial}"),
                             processors=[p() for p in procs], **cfg, **spill)
        c1.run(stop_after=rng.randrange(max(1, n_epochs - 1)))
        new_shards = rng.choice([1, 2, 4, 5])
        rescale_checkpoint(str(tmp_path / f"c{trial}"), new_shards,
                           processors=[p() for p in procs])
        cfg2 = {**cfg, "n_shards": new_shards}
        c2 = StreamingEngine(prepared[n_epochs], str(tmp_path / f"c{trial}"),
                             processors=[p() for p in procs], **cfg2, **spill)
        c2.run()
        rc = c2.results()
        for stream in ra:
            pd.testing.assert_frame_equal(
                _canon(ra[stream]), _canon(rc[stream]), check_dtype=False,
                obj=f"trial {trial} rescale->{new_shards} {cfg} {spill} "
                    f"stream {stream}")


def test_sigkill_anywhere_resumes_identically(ray_session, tmp_path):
    """Hard-crash the WHOLE engine process (SIGKILL, not a cooperative
    stop_after) at arbitrary wall offsets — mid-prepare, mid-epoch,
    mid-spill, mid-flush, mid-checkpoint — then rerun the CLI to
    completion: every committed stream must equal the uninterrupted
    run. This is the end-to-end crash-safety claim behind the 2PC sink
    + checkpoint + spill-segment machinery, exercised through the real
    process boundary."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from dataflow_mm_ray.streaming.sink import EpochSink

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(out, kill_after=None):
        cmd = [sys.executable, os.path.join(repo, "jobs", "run_streaming.py"),
               "--sf-dir", SF_TINY, "--out", str(out), "--epochs", "4",
               "--shards", "2", "--lateness-s", "3600", "--spill-mb", "0",
               "--processors", "gdedup,sdup", "--num-cpus", "4"]
        p = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL, cwd=repo)
        if kill_after is None:
            assert p.wait(timeout=300) == 0
            return True
        time.sleep(kill_after)
        if p.poll() is not None:
            return True  # finished before the kill landed
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
        return False

    streams = ["windows", "sliding", "sessions", "joins", "asof", "cep",
               "alerts", "wdedup", "gdedup", "sdup", "late"]

    def committed(out):
        sink = EpochSink(str(out), streams)
        return {s: _canon(sink.read_committed_ds(s).to_pandas())
                for s in streams}

    run(tmp_path / "full")
    want = committed(tmp_path / "full")
    assert sum(len(v) for v in want.values()) > 0
    for i, delay in enumerate([2.0, 5.0, 8.0]):
        out = tmp_path / f"kill{i}"
        finished = run(out, kill_after=delay)
        if not finished:
            run(out)  # resume to completion
        got = committed(out)
        for s in streams:
            pd.testing.assert_frame_equal(got[s], want[s], check_dtype=False,
                                          obj=f"kill@{delay}s stream {s}")


def test_processor_hash_class_attrs_and_set_determinism():
    """(r5 review 3) 1) A CLASS-valued config attr folds in its source
    (class reprs carry no address, so an address-gated digest would
    skip them and an edited helper class would resume silently). 2) A
    set-valued attr hashes identically across interpreter hash seeds —
    pickle/repr iteration order is PYTHONHASHSEED-randomized and would
    refuse every valid resume."""
    import subprocess
    import sys

    from dataflow_mm_ray.streaming.engine import _processor_code_hash
    from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst

    a, b, c = (SimhashNearDupFirst() for _ in range(3))

    class S1:
        def rule(self):
            return 1

    class S2:
        def rule(self):
            return 2

    a.strategy, b.strategy, c.strategy = S1, S2, S1
    assert _processor_code_hash(a) != _processor_code_hash(b)
    assert _processor_code_hash(a) == _processor_code_hash(c)

    # set attrs: identical digests under different hash seeds
    prog = (
        "from dataflow_mm_ray.streaming.engine import _processor_code_hash\n"
        "from dataflow_mm_ray.streaming.processor import SimhashNearDupFirst\n"
        "p = SimhashNearDupFirst()\n"
        "p.allowed = {'bash', 'edit', 'read', 'write'}\n"
        "p.table = {'b': 2, 'a': 1}\n"
        "print(_processor_code_hash(p))\n"
    )
    outs = set()
    for seed in ("0", "1", "12345"):
        r = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True,
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": "/root/repo"}, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-1500:]
        outs.add(r.stdout.strip())
    assert len(outs) == 1, outs
