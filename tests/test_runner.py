"""Declarative pipeline runner (pipelines/runner.py): chain equality
with hand composition, the composed SQL oracle, per-step cache/resume
semantics (skip-on-match, spec-edit invalidation, kill-safety), and
the CLI spec loader."""
import json
import os

import pytest

from tests.conftest import SF_TINY


def _docs(sf_dir=SF_TINY):
    from dataflow_mm_ray.sources.tables import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"])


CHAIN = None  # built lazily (needs the package on sys.path via conftest)


def _chain():
    from dataflow_mm_ray.pipelines.runner import Step

    return [
        Step("rule_base_filter"),
        Step("text_stats"),
        Step("score_filter", {"score_col": "punct_ratio", "max_score": 0.35}),
    ]


def _manual(sf_dir=SF_TINY):
    from dataflow_mm_ray.stages import filters
    from dataflow_mm_ray.stages.text_analysis import rule_filter_kept, text_stats

    ds = text_stats(rule_filter_kept(_docs(sf_dir)))
    return filters.score_filter(ds, "punct_ratio", max_score=0.35)


def test_lazy_chain_equals_manual(ray_session):
    from dataflow_mm_ray.pipelines.runner import StepReport, run_pipeline
    from dataflow_mm_ray.testing import canon, to_pandas

    report: list[StepReport] = []
    got = run_pipeline(_docs(), _chain(), report=report)
    assert [r.action for r in report] == ["lazy", "lazy", "lazy"]
    import pandas.testing as pdt

    pdt.assert_frame_equal(canon(to_pandas(got)), canon(to_pandas(_manual())))


def test_chain_matches_sql_oracle(ray_session, oracle):
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import assert_matches_oracle

    q = registry()["pipeline_chain"]
    assert_matches_oracle(q.fn(SF_TINY), oracle, q.sql)


def test_fuzzy_op_resolution(ray_session):
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline

    # case-insensitive + unique-substring lookup, like the reference
    ds = run_pipeline(_docs(), [Step("RULE_BASE_FILTER"), Step("text_stat")])
    assert "punct_ratio" in ds.schema().names


def test_unknown_op_fails_before_running(ray_session):
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline

    with pytest.raises(KeyError):
        run_pipeline(_docs(), [Step("no_such_operator_xyz")])


def test_cache_requires_source_tag(ray_session, tmp_path):
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline

    with pytest.raises(ValueError, match="source_tag"):
        run_pipeline(_docs(), [Step("text_stats")], cache_dir=str(tmp_path))


def test_cache_and_resume(ray_session, tmp_path):
    from dataflow_mm_ray.pipelines.runner import StepReport, run_pipeline
    from dataflow_mm_ray.testing import canon, to_pandas
    import pandas.testing as pdt

    cache = str(tmp_path / "steps")
    tag = f"{SF_TINY}:documents"

    r1: list[StepReport] = []
    out1 = to_pandas(run_pipeline(_docs(), _chain(), cache_dir=cache,
                                  source_tag=tag, report=r1))
    assert [r.action for r in r1] == ["ran", "ran", "ran"]

    # rerun: every step skipped, output identical
    r2: list[StepReport] = []
    out2 = to_pandas(run_pipeline(_docs(), _chain(), cache_dir=cache,
                                  source_tag=tag, report=r2))
    assert [r.action for r in r2] == ["cached", "cached", "cached"]
    pdt.assert_frame_equal(canon(out1), canon(out2))

    # cached result equals the uncached lazy chain
    pdt.assert_frame_equal(canon(out1), canon(to_pandas(_manual())))


def test_killed_step_recomputes_only_itself(ray_session, tmp_path):
    from dataflow_mm_ray.pipelines.runner import StepReport, run_pipeline

    cache = str(tmp_path / "steps")
    tag = f"{SF_TINY}:documents"
    run_pipeline(_docs(), _chain(), cache_dir=cache, source_tag=tag)

    # simulate a kill between data write and marker write of step 1
    os.remove(os.path.join(cache, "step01_text_stats", "_SUCCESS.json"))
    r: list[StepReport] = []
    run_pipeline(_docs(), _chain(), cache_dir=cache, source_tag=tag, report=r)
    assert [x.action for x in r] == ["cached", "ran", "cached"]


def test_spec_edit_invalidates_downstream(ray_session, tmp_path):
    from dataflow_mm_ray.pipelines.runner import Step, StepReport, run_pipeline

    cache = str(tmp_path / "steps")
    tag = f"{SF_TINY}:documents"
    run_pipeline(_docs(), _chain(), cache_dir=cache, source_tag=tag)

    # change step 2's kwargs: steps 0-1 stay cached, step 2 reruns
    edited = _chain()
    edited[2] = Step("score_filter",
                     {"score_col": "punct_ratio", "max_score": 0.2})
    r: list[StepReport] = []
    run_pipeline(_docs(), edited, cache_dir=cache, source_tag=tag, report=r)
    assert [x.action for x in r] == ["cached", "cached", "ran"]

    # change step 0: the whole chain downstream recomputes
    edited0 = _chain()
    edited0[0] = Step("rule_base_filter", {"text_col": "text"})
    r0: list[StepReport] = []
    run_pipeline(_docs(), edited0, cache_dir=cache, source_tag=tag, report=r0)
    assert [x.action for x in r0] == ["ran", "ran", "ran"]

    # different source tag never reuses the cache
    r1: list[StepReport] = []
    run_pipeline(_docs(), _chain(), cache_dir=cache,
                 source_tag="other:documents", report=r1)
    assert [x.action for x in r1] == ["ran", "ran", "ran"]


def test_non_primitive_kwargs_rejected(ray_session, tmp_path):
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline

    with pytest.raises(TypeError, match="JSON-able"):
        run_pipeline(_docs(), [Step("text_stats", {"id_col": object()})],
                     cache_dir=str(tmp_path), source_tag="t")


def test_spec_loader(tmp_path):
    from dataflow_mm_ray.pipelines.runner import load_pipeline_spec

    p = tmp_path / "spec.json"
    p.write_text(json.dumps({
        "source": {"table": "documents", "columns": ["doc_id", "text"]},
        "steps": [
            {"op": "rule_base_filter"},
            {"op": "score_filter", "kwargs": {"score_col": "punct_ratio",
                                              "max_score": 0.35}},
        ],
    }))
    source, steps = load_pipeline_spec(str(p))
    assert source["table"] == "documents"
    assert steps[0].op == "rule_base_filter" and steps[0].kwargs == {}
    assert steps[1].kwargs["max_score"] == 0.35


def test_registry_ops_all_resolve(ray_session):
    from dataflow_mm_ray.registry import get_operator, list_operators

    ops = list_operators()
    assert len(ops) >= 27
    for name in ops:
        assert get_operator(name).name == name


def test_dedup_chain_equals_manual(ray_session):
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline
    from dataflow_mm_ray.stages.dedup import add_dedup_key, dedup_first_wins
    from dataflow_mm_ray.stages.text_analysis import rule_filter_kept, text_stats
    from dataflow_mm_ray.testing import canon, to_pandas
    import pandas.testing as pdt

    got = run_pipeline(_docs(), [
        Step("rule_base_filter"),
        Step("add_dedup_key"),
        Step("dedup_first_wins", {"key_col": "dedup_key", "order_by": ["doc_id"]}),
        Step("text_stats"),
    ])
    want = text_stats(dedup_first_wins(
        add_dedup_key(rule_filter_kept(_docs())), "dedup_key", order_by=["doc_id"]))
    pdt.assert_frame_equal(canon(to_pandas(got)), canon(to_pandas(want)))


def test_video_chain_spec_matches_query_and_resumes(ray_session, tmp_path):
    """The reference's composed video pipeline as a runner chain: the
    JSON spec (jobs/specs/video_chain.json), the registered query
    (video_chain_pipeline, SQL-oracled), and a CACHED run must agree
    row-for-row — the cache round-trip must not disturb the per-conv
    clip indexing; a kwarg edit invalidates that step and everything
    downstream, nothing upstream."""
    import pandas.testing as pdt

    from dataflow_mm_ray.pipelines.runner import (
        Step, load_pipeline_spec, run_pipeline)
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.sources.tables import read_table
    from dataflow_mm_ray.testing import canon, to_pandas
    from tests.conftest import SF_TINY

    src, steps = load_pipeline_spec("jobs/specs/video_chain.json")
    ds = read_table(SF_TINY, src["table"], columns=src.get("columns"))
    want = canon(to_pandas(registry()["video_chain_pipeline"].fn(SF_TINY)))
    assert len(want) > 0

    lazy = canon(to_pandas(run_pipeline(ds, steps)))
    pdt.assert_frame_equal(lazy, want)

    cache = tmp_path / "cache"
    rep1, rep2 = [], []
    cached = canon(to_pandas(run_pipeline(
        read_table(SF_TINY, src["table"], columns=src.get("columns")),
        steps, cache_dir=str(cache), source_tag="t", report=rep1)))
    pdt.assert_frame_equal(cached, want)
    assert all(r.action == "ran" for r in rep1)
    run_pipeline(read_table(SF_TINY, src["table"], columns=src.get("columns")),
                 steps, cache_dir=str(cache), source_tag="t", report=rep2)
    assert all(r.action == "cached" for r in rep2)

    # edit the aesthetic threshold: steps 0-3 stay cached, 4+ recompute
    edited = list(steps)
    edited[4] = Step("video_aesthetic_score", {"aes_min": 6.5})
    rep3 = []
    stricter = canon(to_pandas(run_pipeline(
        read_table(SF_TINY, src["table"], columns=src.get("columns")),
        edited, cache_dir=str(cache), source_tag="t", report=rep3)))
    assert [r.action for r in rep3] == ["cached"] * 4 + ["ran"] * 4
    assert len(stricter) < len(want)  # the tighter gate drops clips


def test_video_chain_partition_count_invariant_dtypes(ray_session):
    """(r5 review) num_partitions far above the distinct-conv count
    hands the videochain kernels empty partitions; those must emit the
    TYPED empty schema — a column-less or all-object empty frame
    poisons the concat'd result to object dtype and breaks the
    'identical rows at any num_partitions' rule."""
    import pandas.testing as pdt

    from dataflow_mm_ray.stages.videochain import (
        events_to_transcripts, video_aesthetic_score, video_clip_metadata,
        video_cut_plan, video_frame_plan, video_luminance_score,
        video_ocr_score, video_scene_chunks)
    from dataflow_mm_ray.sources.tables import read_table
    from dataflow_mm_ray.testing import canon, to_pandas
    from tests.conftest import SF_TINY

    def chain(num_partitions):
        ds = read_table(SF_TINY, "events",
                        columns=["event_id", "ts", "user_id", "event_type",
                                 "props"])
        ds = events_to_transcripts(ds, num_partitions=num_partitions)
        ds = video_scene_chunks(ds, num_partitions=num_partitions)
        ds = video_clip_metadata(ds, num_partitions=num_partitions)
        ds = video_frame_plan(ds)
        ds = video_aesthetic_score(ds)
        ds = video_luminance_score(ds)
        ds = video_ocr_score(ds)
        return to_pandas(video_cut_plan(ds))

    small = chain(4)
    assert len(small) > 0
    # sf0.001 has ~50 conversations; 128 partitions guarantees empties
    wide = chain(128)
    assert {str(t) for t in wide.dtypes} == {str(t) for t in small.dtypes}
    pdt.assert_frame_equal(canon(wide), canon(small))


def test_audio_chain_spec_matches_query_and_composition(ray_session, tmp_path):
    """The reference's audio VAD pipeline (Silero VAD -> timestamp
    chunk split) as a runner chain: the JSON spec
    (jobs/specs/audio_chain.json), the registered query
    (audio_chain_pipeline), the manual stage composition, and a CACHED
    run (list<double> VAD columns surviving the parquet IR round trip)
    must agree row-for-row; chunking is partition-count invariant."""
    import pandas.testing as pdt

    from dataflow_mm_ray.pipelines.runner import (
        Step, load_pipeline_spec, run_pipeline)
    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.sources.tables import read_table
    from dataflow_mm_ray.stages.audiochain import (
        attach_stub_audio, vad_segments_to_rows)
    from dataflow_mm_ray.stages.chunks import chunk_rows
    from dataflow_mm_ray.stages.multimodal import audio_vad_pipeline
    from dataflow_mm_ray.testing import canon, to_pandas
    from tests.conftest import SF_TINY

    want = canon(to_pandas(registry()["audio_chain_pipeline"].fn(SF_TINY)))
    assert len(want) > 0
    assert set(want["conv_id"]) != set()  # real segments, many docs

    # manual composition == the chain
    manual = chunk_rows(
        vad_segments_to_rows(
            audio_vad_pipeline(
                attach_stub_audio(read_table(SF_TINY, "documents",
                                             columns=["doc_id"])),
                max_speech_duration_s=30.0, seg_lists=True)),
        mode="split")
    pdt.assert_frame_equal(canon(to_pandas(manual)), want)

    # chunk stage partition invariance
    wide = chunk_rows(
        vad_segments_to_rows(
            audio_vad_pipeline(
                attach_stub_audio(read_table(SF_TINY, "documents",
                                             columns=["doc_id"])),
                max_speech_duration_s=30.0, seg_lists=True)),
        mode="split", num_partitions=64)
    pdt.assert_frame_equal(canon(to_pandas(wide)), want)

    # the CLI spec with cache/resume
    src, steps = load_pipeline_spec("jobs/specs/audio_chain.json")
    cache = tmp_path / "cache"
    rep1, rep2 = [], []
    cached = canon(to_pandas(run_pipeline(
        read_table(SF_TINY, src["table"], columns=src.get("columns")),
        steps, cache_dir=str(cache), source_tag="a", report=rep1)))
    pdt.assert_frame_equal(cached, want)
    assert all(r.action == "ran" for r in rep1)
    run_pipeline(read_table(SF_TINY, src["table"], columns=src.get("columns")),
                 steps, cache_dir=str(cache), source_tag="a", report=rep2)
    assert all(r.action == "cached" for r in rep2)


def test_neardup_ops_chain_equals_direct(ray_session):
    """The near-dup family as registry steps: a filtered-then-deduped
    chain must equal calling the stage directly on the same filtered
    input (the ds= form the ops wrap)."""
    import pandas.testing as pdt

    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline
    from dataflow_mm_ray.stages.neardup import (
        minhash_lsh_dedup, ngram_jaccard_dedup, simhash_dedup)
    from dataflow_mm_ray.stages.text_analysis import rule_filter_kept
    from dataflow_mm_ray.testing import canon, to_pandas

    for op, kwargs, direct in [
        ("minhash_lsh_dedup", {"threshold": 0.7},
         lambda ds: minhash_lsh_dedup(None, 0.7, ds=ds)),
        ("ngram_jaccard_dedup", {"threshold": 0.5},
         lambda ds: ngram_jaccard_dedup(None, 0.5, ds=ds)),
        ("simhash_dedup", {"max_hamming": 3},
         lambda ds: simhash_dedup(None, 3, ds=ds)),
    ]:
        got = run_pipeline(_docs(), [Step("rule_base_filter"), Step(op, kwargs)])
        want = direct(rule_filter_kept(_docs()))
        pdt.assert_frame_equal(canon(to_pandas(got)), canon(to_pandas(want)),
                               obj=op)
        assert to_pandas(got)["keep"].dtype == bool
