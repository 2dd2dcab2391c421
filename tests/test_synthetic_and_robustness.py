"""F1 synthetic transcript generator properties, serving error
quarantine, checkpoint shard-count guard."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.sources.synthetic import generate_transcripts


def test_generator_deterministic_and_schema():
    a = generate_transcripts(n_convs=30, seed=7)
    b = generate_transcripts(n_convs=30, seed=7)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(a["ts"].dtype) == "datetime64[us]"
    assert set(a["role"]) <= {"user", "assistant", "tool", "system"}
    # turn_idx contiguous per conv
    g = a.groupby("conv_id")["turn_idx"]
    assert (g.max() + 1 == g.size()).all()


def test_generator_stress_properties():
    df = generate_transcripts(n_convs=200, seed=11)
    sizes = df.groupby("conv_id").size()
    assert sizes.max() > 5 * sizes.median()  # zipf skew -> hot conversations
    # rule-tripping rows present: run the real filter
    from dataflow_mm_ray.functions.text_rules import rule_flags_batch

    flags = rule_flags_batch(df["text"].tolist())
    assert 0 < (~flags["keep"]).sum() < len(df)
    # tool invocations with matching later responses exist
    inv = df[(df["role"] == "assistant") & df["tool"].notna()]
    assert len(inv) > 0
    # late event-times: ts not monotone within some conversation
    mono = df.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing)
    assert not mono.all()


def test_synthetic_through_cep_kernels():
    from dataflow_mm_ray.partition import partition_map_pandas
    from dataflow_mm_ray.stages.join import _join_partition
    from dataflow_mm_ray.stages.windows import session_window_kernel

    df = generate_transcripts(n_convs=50, seed=3)
    sessions = partition_map_pandas(
        df, "conv_id", lambda p: session_window_kernel(p, 1800), 8,
        sort_by=("conv_id", "turn_idx"),
    )
    assert sessions["n_turns"].sum() == len(df)
    joins = partition_map_pandas(
        df, "conv_id", _join_partition, 8, sort_by=("conv_id", "turn_idx")
    )
    inv_count = ((df["role"] == "assistant") & df["tool"].notna()).sum()
    assert len(joins) == inv_count


def test_serving_error_quarantine():
    # exercised directly on the pool callable (a test-local backend
    # class can't be imported by ray workers); the actor-pool wiring is
    # covered by the prompted_qa oracle query
    from dataflow_mm_ray.serving import PromptedGenerator

    class FlakyBackend:
        def __init__(self, **kwargs):
            pass

        def generate(self, prompts):
            out = []
            for p in prompts:
                if "boom" in p:
                    raise RuntimeError("backend exploded")
                out.append("ok:" + p)
            return out

    gen = PromptedGenerator(backend_cls=FlakyBackend)
    out = gen(pd.DataFrame({"prompt": ["a", "boom1", "b", "boom2"]}))
    assert list(out["answer"].isna()) == [False, True, False, True]
    assert out["answer_error"].str.contains("backend exploded").fillna(False).tolist() == [
        False, True, False, True,
    ]
    assert out["answer"].iloc[0] == "ok:a"  # good rows survive the flaky batch


def test_resume_shard_count_guard(ray_session, tmp_path):
    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts

    tp = prepare_transcripts("/root/testdata/sf0.001", str(tmp_path / "t"), n_epochs=2)
    eng = StreamingEngine(tp, str(tmp_path / "o"), n_epochs=2, n_shards=2, lateness_s=10**9)
    eng.run(stop_after=0)
    with pytest.raises(ValueError, match="resume config mismatch"):
        StreamingEngine(tp, str(tmp_path / "o"), n_epochs=2, n_shards=3, lateness_s=10**9)


def test_normalizers_null_and_unicode_safety():
    """None/NaN -> "" (reference clean_punctuations rule); emoji and
    mixed-script text must not crash any mode."""
    import numpy as np

    from dataflow_mm_ray.stages.normalize import normalize_text

    for mode in ("basic", "english", "english-lite", "zh"):
        assert normalize_text(None, mode=mode) == ""
        assert normalize_text(float("nan"), mode=mode) == ""
        out = normalize_text("héllo 世界 🎉 3毛 café's 1.5%", mode=mode)
        assert isinstance(out, str)
    # zh pipeline on pure-ASCII text is punctuation/space rules only
    assert "hello" in normalize_text("hello, world!", mode="zh")


def test_dedup_pipelines_handle_empty_texts(ray_session):
    """Empty/whitespace texts form one exact group: first-wins keeps
    only the earliest (jaccard(empty, empty) = 1)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import minhash_lsh_dedup, simhash_dedup

    df = pd.DataFrame(
        {"doc_id": range(6),
         "text": ["real document with several words here", "", "   ", None,
                  "another distinct real document entirely", ""]}
    )
    out = minhash_lsh_dedup("", ds=rd.from_pandas(df), threshold=0.5).to_pandas()
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[0] and keep[4]
    assert keep[1]                      # first empty survives
    assert not (keep[2] or keep[3] or keep[5])  # later empties are exact dups
    sh = simhash_dedup("", ds=rd.from_pandas(df)).to_pandas()
    k2 = dict(zip(sh["doc_id"], sh["keep"]))
    assert k2[1] and not (k2[2] or k2[3] or k2[5])
