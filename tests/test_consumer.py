"""Stream consumers (streaming/consumer.py): durable per-group read
positions over committed epochs, at-least-once polls, contiguity, and
the compaction retention rule (lagging groups are protected; a
position behind the horizon fails loudly with an explicit reset).
"""
import pandas as pd
import pytest

from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def transcripts_path(ray_session, tmp_path_factory):
    from dataflow_mm_ray.streaming.engine import prepare_transcripts

    p = tmp_path_factory.mktemp("consumer") / "transcripts"
    return prepare_transcripts(SF_TINY, str(p))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _engine(transcripts_path, out_dir):
    from dataflow_mm_ray.streaming.engine import StreamingEngine

    return StreamingEngine(transcripts_path, str(out_dir), n_epochs=5,
                           n_shards=3, lateness_s=3600)


def test_incremental_consumption_covers_stream(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.consumer import StreamConsumer

    out = tmp_path / "out"
    cons = StreamConsumer(str(out), "windows", group="g1")
    got = []
    for stop in range(5):
        eng = _engine(transcripts_path, out)
        eng.run(stop_after=stop)
        epochs, df = cons.poll_pandas()
        assert epochs and epochs[-1] == stop  # every tick is consumable
        got.append(df)
        cons.commit(epochs[-1])
    assert cons.position() == 5
    want = _engine(transcripts_path, out).results()["windows"]
    pd.testing.assert_frame_equal(
        _canon(pd.concat(got, ignore_index=True)), _canon(want)
    )
    # fully consumed: nothing ready
    epochs, df = cons.poll_pandas()
    assert epochs == [] and not len(df)


def test_restart_is_at_least_once(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.consumer import StreamConsumer

    out = tmp_path / "out"
    eng = _engine(transcripts_path, out)
    eng.run()
    c1 = StreamConsumer(str(out), "joins", group="g")
    e1, df1 = c1.poll_pandas(max_epochs=2)
    assert e1 == [0, 1]
    # crash before commit: a restarted consumer re-polls the same epochs
    c2 = StreamConsumer(str(out), "joins", group="g")
    e2, df2 = c2.poll_pandas(max_epochs=2)
    assert e2 == e1
    pd.testing.assert_frame_equal(_canon(df1), _canon(df2))
    c2.commit(1)
    e3, _ = c2.poll_pandas()
    assert e3 == [2, 3, 4]
    # commits are monotone: replaying an old commit can't move back
    c2.commit(0)
    assert c2.position() == 2


def test_gap_is_never_observed(ray_session, tmp_path):
    from dataflow_mm_ray.streaming.consumer import StreamConsumer
    from dataflow_mm_ray.streaming.sink import EpochSink

    sink = EpochSink(str(tmp_path), ["s"])
    df = pd.DataFrame({"x": [1, 2]})
    sink.stage_and_commit("s", 0, df, 0)
    sink.stage_and_commit("s", 2, df, 0)  # epoch 1 missing
    cons = StreamConsumer(str(tmp_path), "s", group="g")
    epochs, got = cons.poll_pandas()
    assert epochs == [0] and len(got) == 2
    cons.commit(0)
    assert cons.poll_pandas()[0] == []  # stalls at the gap
    sink.stage_and_commit("s", 1, df, 0)
    assert cons.poll_pandas()[0] == [1, 2]


def test_compaction_protects_lagging_group(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.compact import compact_stream, read_compaction
    from dataflow_mm_ray.streaming.consumer import (
        PositionCompactedError, StreamConsumer, consumer_positions)

    out = tmp_path / "out"
    eng = _engine(transcripts_path, out)
    eng.run()
    lag = StreamConsumer(str(out), "windows", group="lagging")
    lag.commit(0)  # has consumed epoch 0 only; needs 1..4
    assert consumer_positions(str(out), "windows") == {"lagging": 1}

    res = compact_stream(str(out), "windows", target_rows=10, min_input_files=1)
    # protection: only epoch 0 (the consumed prefix) may be covered
    assert res["compacted"] and res["upto_epoch"] == 0
    epochs, df = lag.poll_pandas()  # still fully servable epoch-by-epoch
    assert epochs == [1, 2, 3, 4] and len(df)
    lag.commit(4)

    res2 = compact_stream(str(out), "windows", target_rows=10, min_input_files=1)
    assert res2["compacted"] and res2["upto_epoch"] == 4

    # a group registered AFTER compaction starts at 0, behind the horizon
    newb = StreamConsumer(str(out), "windows", group="newborn")
    with pytest.raises(PositionCompactedError):
        newb.poll()
    assert newb.reset_to_horizon() == 5
    assert newb.poll_pandas()[0] == []  # nothing above the horizon yet

    # unprotected compaction is the explicit override
    comp = read_compaction(str(out), "windows")
    assert comp["segments"][-1]["upto_epoch"] == 4


def test_poll_dataset_matches_manifests(ray_session, transcripts_path, tmp_path):
    from dataflow_mm_ray.streaming.consumer import StreamConsumer

    out = tmp_path / "out"
    eng = _engine(transcripts_path, out)
    eng.run()
    cons = StreamConsumer(str(out), "sessions", group="g")
    epochs, ds = cons.poll(max_epochs=3)
    assert epochs == [0, 1, 2]
    got = _canon(ds.to_pandas())
    want = _canon(cons.poll_pandas(max_epochs=3)[1])
    pd.testing.assert_frame_equal(got, want)


# --- r5: parallel consumer groups + exactly-once consume->sink -------------


def test_parallel_members_drain_disjoint_union(ray_session, transcripts_path,
                                               tmp_path):
    """N members of one group: per-epoch file slices are disjoint, the
    union equals the full stream, and the GROUP position follows the
    slowest member (compaction protection)."""
    from dataflow_mm_ray.streaming.consumer import (
        ParallelConsumer, StreamConsumer, consumer_positions)

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    n = 3
    members = [ParallelConsumer(str(out), "windows", group="pg",
                                member=i, n_members=n) for i in range(n)]
    frames, seen_files = [], []
    for m in members:
        epochs, ds = m.poll()
        assert epochs == [0, 1, 2, 3, 4]
        if ds is not None:
            seen_files.append(set(ds.input_files()))
            frames.append(ds.to_pandas())
        m.commit(epochs[-1]) if m.member != 0 else None
    # disjoint slices
    for i in range(len(seen_files)):
        for j in range(i + 1, len(seen_files)):
            assert not (seen_files[i] & seen_files[j])
    # group position held at 0 until EVERY member commits
    assert consumer_positions(str(out), "windows")["pg"] == 0
    members[0].commit(4)
    assert consumer_positions(str(out), "windows")["pg"] == 5
    # union == full stream
    want = _engine(transcripts_path, out).results()["windows"]
    pd.testing.assert_frame_equal(
        _canon(pd.concat(frames, ignore_index=True)), _canon(want))
    # restart safety: a re-created member is fully drained
    again = ParallelConsumer(str(out), "windows", group="pg",
                             member=1, n_members=n)
    epochs, ds = again.poll()
    assert epochs == [] and ds is None
    # cardinality mix refuses loudly
    with pytest.raises(ValueError, match="cardinality"):
        ParallelConsumer(str(out), "windows", group="pg", member=0,
                         n_members=2)


def test_consume_to_sink_exactly_once_under_kill(ray_session,
                                                 transcripts_path, tmp_path):
    """consume -> transform -> second EpochSink, one epoch per commit:
    interrupting after the downstream commit but before the consumer
    commit (the worst-case cut) re-polls the same epoch, the downstream
    no-ops, and the final downstream stream equals an uninterrupted
    composition row-for-row."""
    from dataflow_mm_ray.streaming.consumer import StreamConsumer
    from dataflow_mm_ray.streaming.sink import EpochSink

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()

    def drain(dest, group, crash_after_downstream_commit_at=None):
        cons = StreamConsumer(str(out), "windows", group=group)
        down = EpochSink(str(dest), ["windows"])
        while True:
            epochs, ds = cons.poll(max_epochs=1)
            if not epochs:
                break
            (e,) = epochs
            df = ds.to_pandas() if ds is not None else pd.DataFrame()
            down.stage_and_commit("windows", e, df, 0)
            if e == crash_after_downstream_commit_at:
                return  # kill between downstream commit and consumer commit
            cons.commit(e)

    drain(tmp_path / "a", "full")                      # uninterrupted
    drain(tmp_path / "b", "killed",
          crash_after_downstream_commit_at=2)          # dies mid-drain
    drain(tmp_path / "b", "killed")                    # restart finishes
    a = EpochSink(str(tmp_path / "a"), ["windows"]).read_committed_ds("windows").to_pandas()
    b = EpochSink(str(tmp_path / "b"), ["windows"]).read_committed_ds("windows").to_pandas()
    assert len(a) > 0
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_compaction_protects_slowest_parallel_member(ray_session,
                                                     transcripts_path,
                                                     tmp_path):
    """Compaction's consumer protection must follow the GROUP position
    of a parallel group — the minimum across members — so a fast
    member's commits never let compaction cover epochs a slow member
    still needs; the slow member drains its slice intact afterwards."""
    from dataflow_mm_ray.streaming.compact import compact_stream, read_compaction
    from dataflow_mm_ray.streaming.consumer import ParallelConsumer

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    fast = ParallelConsumer(str(out), "windows", group="pc", member=0,
                            n_members=2)
    slow = ParallelConsumer(str(out), "windows", group="pc", member=1,
                            n_members=2)
    epochs, ds = fast.poll()
    fast_rows = ds.to_pandas()
    fast.commit(epochs[-1])          # member 0 fully drained
    slow.poll()                      # member 1 read but NOT committed
    comp = compact_stream(str(out), "windows", target_rows=10)
    covered = read_compaction(str(out), "windows")["segments"]
    # group position is 0 (slow member) -> nothing may be covered
    assert not covered, comp
    epochs, ds = slow.poll()
    assert epochs == [0, 1, 2, 3, 4]
    slow_rows = ds.to_pandas()
    slow.commit(epochs[-1])
    # with the whole group drained, compaction proceeds
    comp = compact_stream(str(out), "windows", target_rows=10)
    assert comp["compacted"]
    want = _engine(transcripts_path, out).results()["windows"]
    got = pd.concat([fast_rows, slow_rows], ignore_index=True)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_parallel_reset_to_horizon_is_member_scoped(ray_session,
                                                    transcripts_path,
                                                    tmp_path):
    """(r5 review) reset_to_horizon on a parallel member must move the
    MEMBER position (so its poll un-wedges) and never push the shared
    GROUP position — what compaction protection reads — past the other
    members' minimum."""
    from dataflow_mm_ray.streaming.compact import (compact_stream,
                                                   read_compaction)
    from dataflow_mm_ray.streaming.consumer import (ParallelConsumer,
                                                    PositionCompactedError,
                                                    consumer_positions)

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    m0 = ParallelConsumer(str(out), "windows", group="pr", member=0,
                          n_members=2)
    m1 = ParallelConsumer(str(out), "windows", group="pr", member=1,
                          n_members=2)
    compact_stream(str(out), "windows", target_rows=10,
                   protect_consumers=False)
    cov = read_compaction(str(out), "windows")["segments"][-1]["upto_epoch"]
    assert cov >= 0
    with pytest.raises(PositionCompactedError):
        m0.poll()
    pos = m0.reset_to_horizon()
    assert pos == cov + 1                 # past the horizon
    assert m0.position() == cov + 1       # the MEMBER file moved
    assert m1.position() == 0             # the other member untouched
    # the group position still follows the minimum across members
    assert consumer_positions(str(out), "windows")["pr"] == 0
    # member 1 recovers independently; only then the group advances
    m1.reset_to_horizon()
    assert consumer_positions(str(out), "windows")["pr"] == cov + 1


def test_parallel_dest_sink_members_union_is_full_stream(ray_session,
                                                         transcripts_path,
                                                         tmp_path):
    """(r5 review) jobs/consume_stream --dest-sink with parallel
    members: the downstream sink keys commits by (stream, epoch), so
    members sharing ONE sink root would silently drop every slice but
    the first committer's. The job gives each member its own sink root;
    the union of the member roots must equal the full stream."""
    import subprocess
    import sys

    from dataflow_mm_ray.streaming.sink import EpochSink

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    dest = tmp_path / "down"
    for member in (0, 1):
        r = subprocess.run(
            [sys.executable, "jobs/consume_stream.py", "--out", str(out),
             "--stream", "windows", "--group", "pds", "--dest", str(dest),
             "--dest-sink", "--member", str(member), "--n-members", "2",
             "--num-cpus", "2"],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
    frames = []
    for member in (0, 1):
        root = dest / f"member{member}of2"
        ds = EpochSink(str(root), ["windows"]).read_committed_ds("windows")
        if ds is not None:
            frames.append(ds.to_pandas())
    want = _engine(transcripts_path, out).results()["windows"]
    pd.testing.assert_frame_equal(
        _canon(pd.concat(frames, ignore_index=True)), _canon(want))


def test_compaction_never_covers_past_a_gap(ray_session, transcripts_path,
                                            tmp_path):
    """A committed-epoch gap (possible for a foreign writer using the
    sink API out of order) must stop compaction: covering past the gap
    would permanently hide the gap epoch's rows from every reader once
    its manifest lands."""
    from dataflow_mm_ray.streaming.compact import compact_stream, read_compaction
    from dataflow_mm_ray.streaming.sink import EpochSink

    out = tmp_path / "out"
    sink = EpochSink(str(out), ["s"])
    rows = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    sink.stage_and_commit("s", 0, rows, 0)
    sink.stage_and_commit("s", 1, rows, 0)
    sink.stage_and_commit("s", 3, rows, 0)          # gap: epoch 2 missing
    comp = compact_stream(str(out), "s", target_rows=1)
    assert comp["compacted"]
    assert comp["upto_epoch"] == 1                  # stops at the gap
    # the late epoch lands; a reader sees ALL committed rows
    sink.stage_and_commit("s", 2, rows, 0)
    got = sink.read_committed("s")
    assert len(got) == 8
    # once contiguous, the rest compacts
    comp2 = compact_stream(str(out), "s", target_rows=1)
    assert comp2["compacted"] and comp2["upto_epoch"] == 3
    assert read_compaction(str(out), "s")["segments"][-1]["upto_epoch"] == 3
    assert len(sink.read_committed("s")) == 8


def test_parallel_dest_sink_randomized_crashes(ray_session, transcripts_path,
                                               tmp_path):
    """Randomized adversary over the parallel consume->transform->sink
    composition: N members drain the same stream into per-member
    downstream sink roots, and after EVERY downstream commit the member
    may 'crash' (object abandoned before the consumer commit — the
    worst-case cut) or fall behind arbitrarily. Whatever the
    interleaving, when every member eventually finishes, the union of
    the downstream roots must equal the full stream row-for-row and
    every group position must read fully drained."""
    import random

    from dataflow_mm_ray.streaming.consumer import ParallelConsumer
    from dataflow_mm_ray.streaming.sink import EpochSink

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    want = _engine(transcripts_path, out).results()["windows"]

    rng = random.Random(20260820)
    n = 3
    downs = [EpochSink(str(tmp_path / f"down{i}"), ["windows"])
             for i in range(n)]

    def step(member: int) -> bool:
        """One poll/commit cycle for one member; True when drained.
        A fresh consumer object every call = restart-per-step."""
        c = ParallelConsumer(str(out), "windows", group="rz",
                             member=member, n_members=n)
        epochs, ds = c.poll(max_epochs=1)
        if not epochs:
            return True
        (e,) = epochs
        df = ds.to_pandas() if ds is not None else pd.DataFrame()
        downs[member].stage_and_commit("windows", e, df, 0)
        if rng.random() < 0.5:
            return False  # crash between the two commits: re-polls same epoch
        c.commit(e)
        return False

    done = [False] * n
    for _ in range(400):
        if all(done):
            break
        m = rng.randrange(n)
        if not done[m]:
            done[m] = step(m)
    assert all(done), "adversary budget too small"
    frames = []
    for i in range(n):
        ds = downs[i].read_committed_ds("windows")
        if ds is not None:
            frames.append(ds.to_pandas())
    got = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    from dataflow_mm_ray.streaming.consumer import consumer_positions

    assert consumer_positions(str(out), "windows")["rz"] == 5


def test_backfill_recovers_compacted_prefix(ray_session, transcripts_path,
                                            tmp_path):
    """A group registered after compaction hits PositionCompactedError;
    backfill() + commit(covered) + poll() must deliver the FULL stream
    (prefix from segments, tail epoch-by-epoch) — the no-data-loss
    alternative to reset_to_horizon(). Parallel members slice the
    backfill like epochs: disjoint, union == the prefix."""
    from dataflow_mm_ray.streaming.compact import compact_stream, read_compaction
    from dataflow_mm_ray.streaming.consumer import (ParallelConsumer,
                                                    PositionCompactedError,
                                                    StreamConsumer)

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    want = _engine(transcripts_path, out).results()["windows"]

    # compact only a prefix: protect nothing, small target, then check
    compact_stream(str(out), "windows", target_rows=10,
                   protect_consumers=False)
    covered = read_compaction(str(out), "windows")["segments"][-1]["upto_epoch"]
    assert 0 <= covered <= 4

    c = StreamConsumer(str(out), "windows", group="bf")
    with pytest.raises(PositionCompactedError):
        c.poll()
    ds, cov = c.backfill()
    assert cov == covered and ds is not None
    prefix = ds.to_pandas()
    c.commit(cov)
    epochs, tail_ds = c.poll()
    assert epochs == list(range(covered + 1, 5))
    frames = [prefix] + ([tail_ds.to_pandas()] if tail_ds is not None else [])
    pd.testing.assert_frame_equal(
        _canon(pd.concat(frames, ignore_index=True)), _canon(want))

    # parallel members: backfill slices are disjoint, union == prefix
    members = [ParallelConsumer(str(out), "windows", group="bfp",
                                member=i, n_members=2) for i in range(2)]
    pieces, file_sets = [], []
    for m in members:
        mds, mcov = m.backfill()
        assert mcov == covered
        if mds is not None:
            file_sets.append(set(mds.input_files()))
            pieces.append(mds.to_pandas())
    assert len(file_sets) < 2 or not (file_sets[0] & file_sets[1])
    pd.testing.assert_frame_equal(
        _canon(pd.concat(pieces, ignore_index=True)), _canon(prefix))


def test_backfill_cli_then_incremental(ray_session, transcripts_path,
                                       tmp_path):
    """The CLI composition of the recovery: `--backfill` drains the
    compacted prefix as one deterministic segment and commits past the
    horizon; a plain follow-up run drains the remaining epochs. The
    two segments together equal the full stream."""
    import glob
    import subprocess
    import sys

    from dataflow_mm_ray.streaming.compact import compact_stream

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    want = _engine(transcripts_path, out).results()["windows"]
    compact_stream(str(out), "windows", target_rows=10,
                   protect_consumers=False)
    dest = tmp_path / "drained"

    def run(*extra):
        r = subprocess.run(
            [sys.executable, "jobs/consume_stream.py", "--out", str(out),
             "--stream", "windows", "--group", "bfc", "--dest", str(dest),
             "--num-cpus", "2", *extra],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("--backfill")
    run()
    files = glob.glob(str(dest / "epochs=*" / "*.parquet"))
    assert files
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_backfill_cli_retry_and_midprefix_refusal(ray_session,
                                                  transcripts_path,
                                                  tmp_path):
    """(r5 review 3) 1) A --backfill retried after a crash between
    write and commit must REPLACE the partial segment, not append next
    to it (Ray's write_parquet appends uuid-named files). 2) A group
    that already drained part of the prefix refuses the backfill
    loudly — segments have no epoch boundaries, so it would re-deliver
    drained epochs into the union."""
    import glob
    import json as _json
    import os
    import subprocess
    import sys

    from dataflow_mm_ray.streaming.compact import compact_stream

    out = tmp_path / "out"
    _engine(transcripts_path, out).run()
    want = _engine(transcripts_path, out).results()["windows"]
    dest = tmp_path / "drained"

    def run(group, *extra, expect=0):
        r = subprocess.run(
            [sys.executable, "jobs/consume_stream.py", "--out", str(out),
             "--stream", "windows", "--group", group, "--dest", str(dest),
             "--num-cpus", "2", *extra],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == expect, (r.returncode, r.stderr[-1500:],
                                        r.stdout[-500:])
        return r.stdout

    # a group mid-prefix BEFORE compaction
    run("lag", "--max-epochs", "2")
    compact_stream(str(out), "windows", target_rows=10,
                   protect_consumers=False)
    out_s = run("lag", "--backfill", expect=2)
    assert "re-deliver" in out_s

    # fresh group: backfill, then simulate crash-before-commit by
    # resetting the group position file, and retry
    o1 = run("fresh", "--backfill")
    rec = _json.loads(out_s := o1.strip().splitlines()[0])
    seg = rec["segment"]
    n1 = len(glob.glob(os.path.join(seg, "*.parquet")))
    pos_path = out / "consumers" / "fresh" / "windows.json"
    pos_path.write_text(_json.dumps({"stream": "windows", "group": "fresh",
                                     "next_epoch": 0}))
    o2 = run("fresh", "--backfill")
    rec2 = _json.loads(o2.strip().splitlines()[0])
    assert rec2["rows"] == rec["rows"]          # not doubled
    # drain the tail; lag's drained segments + fresh backfill+tail
    # would double-count for 'lag' — but 'fresh' alone equals the
    # stream
    run("fresh")
    files = glob.glob(os.path.join(str(dest), "epochs=*", "*.parquet"))
    # keep only fresh's segments: prefix + the post-horizon tail; the
    # 'lag' group wrote epochs=0-1 before compaction — exclude it
    files = [f for f in files if "epochs=0-1" not in f]
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    assert n1 >= 1
