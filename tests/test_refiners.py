"""WikiQA parser (differential vs the reference implementation),
diversity filter, io sources."""
import os

import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.functions.wiki_qa import parse_wiki_qa

REFERENCE_WIKI = "/root/reference/dataflow/operators/core_vision/refine/wiki_qa_refiner.py"


def _reference_parse():
    """Load the reference's standalone parse helpers (no dataflow deps
    needed for the top-of-file functions)."""
    src = open(REFERENCE_WIKI).read()
    cut = src.index("@OPERATOR_REGISTRY.register()")
    header = src[:cut]
    header = "\n".join(
        ln for ln in header.splitlines() if not ln.startswith("from dataflow")
    )
    ns: dict = {}
    exec(header, ns)
    return ns["parse_wiki_qa"]


WIKI_FIXTURES = [
    "### Wikipedia Article: The quick brown fox.\n---\nQuestion Answer Pairs:\n"
    "Question: what animal?\nAnswer: a fox\nQuestion: colour?\n- A: brown\n",
    "Some context only, no markers at all.",
    "ctx here\nQuestion: q1?\nAnswer: a1",
    "c\nQ&A:\nQuestion: orphan no answer?",
    "**Article**: x\nQA:\n1.Question: numbered?\nAnswer: yes\n",
    "Q: immediate?\nAnswer: yep",
    "",
    "   ",
    "Article: ctx --- \nQuestions:\nQuestion: **bold** q?\nAnswer: *starred* a\n",
]


@pytest.mark.skipif(not os.path.exists(REFERENCE_WIKI), reason="reference tree absent")
def test_wiki_qa_matches_reference_implementation():
    ref = _reference_parse()
    for text in WIKI_FIXTURES:
        assert parse_wiki_qa(text) == ref(text), f"diverges on: {text!r}"
    assert parse_wiki_qa(None) == ref(None)


def test_parse_wiki_qa_basics():
    out = parse_wiki_qa("ctx here\nQuestion: q1?\nAnswer: a1")
    assert out["context"] == "ctx here"
    assert out["qas"] == [{"question": "q1?", "answer": "a1"}]
    assert parse_wiki_qa("no markers") == {"context": "no markers", "qas": []}
    assert parse_wiki_qa(None) == {"context": "", "qas": []}


def test_diversity_filter_first_wins(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.diversity import diversity_filter

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "alpha beta gamma delta",  # exact dup of 0 -> dropped
                "alpha beta gamma epsilon",  # cosine 0.75 < 0.8 -> kept
                "totally different words here",
            ],
        }
    )
    out = diversity_filter(rd.from_pandas(df), threshold=0.8)
    assert list(out["keep"]) == [True, False, True, True]


def test_diversity_filter_full_differential_vs_reference_scan(ray_session):
    # transcription of the reference ImageDiversityFilter scan
    # (image_diversity_filter.py:20-34 text half, 44-62 image half,
    # 102-104 composition with INDEPENDENT cache updates)
    import ray.data as rd

    from dataflow_mm_ray.stages.diversity import (
        _KeptIndex,
        _term_counts,
        diversity_filter_full,
        stub_phash,
    )

    rng = np.random.default_rng(3)
    texts = [
        "alpha beta gamma delta",
        "xy",  # short text -> text half fails, image cache may still grow
        "alpha beta gamma epsilon",
        "totally different words here",
        "",
    ]
    rows = [
        {
            "doc_id": i,
            "text": texts[int(rng.integers(len(texts)))] + (f" tail{i % 7}" if i % 3 else ""),
            "image_key": None if i % 29 == 0 else f"img{i % 23}.png",  # dup keys -> phash dups
        }
        for i in range(200)
    ]
    df = pd.DataFrame(rows)

    # reference loop transcription
    kept_text = _KeptIndex()
    kept_hashes = []
    expected = []
    for r in rows:
        t = r["text"]
        if not t or len(t) < 3:
            text_ok = False
        else:
            terms = _term_counts(t)
            text_ok = not kept_text.max_cosine_exceeds(terms, 0.8)
            if text_ok:
                kept_text.add(terms)
        ph = stub_phash(r["image_key"])
        if ph is None:
            img_ok = False
        elif not kept_hashes:
            img_ok = True
            kept_hashes.append(ph)
        else:
            min_dist = min(int((prev != ph).sum()) for prev in kept_hashes[-10000:])
            img_ok = min_dist > 5
            if img_ok:
                kept_hashes.append(ph)
        expected.append(text_ok and img_ok)

    out = diversity_filter_full(rd.from_pandas(df)).sort_values("doc_id")
    assert list(out["keep"]) == expected
    assert expected.count(True) > 0 and expected.count(False) > 0


def test_image_duplicate_filter_differential_vs_reference_scan(ray_session):
    # transcription of the standalone ImageDuplicateFilter scan
    # (image_diversity_filter.py:43-62): first decodable image kept with
    # min_dist None, later ones keep iff min Hamming > 5; missing ->
    # (False, None)
    import ray.data as rd

    from dataflow_mm_ray.stages.diversity import (
        image_duplicate_filter,
        stub_phash,
    )

    rows = [
        {"doc_id": i, "image_key": None if i % 17 == 0 else f"im{i % 13}.png"}
        for i in range(150)
    ]
    kept_hashes = []
    exp_keep, exp_dist = [], []
    for r in rows:
        ph = stub_phash(r["image_key"])
        if ph is None:
            exp_keep.append(False)
            exp_dist.append(np.nan)
        elif not kept_hashes:
            kept_hashes.append(ph)
            exp_keep.append(True)
            exp_dist.append(np.nan)
        else:
            md = min(int((prev != ph).sum()) for prev in kept_hashes[-10000:])
            ok = md > 5
            if ok:
                kept_hashes.append(ph)
            exp_keep.append(ok)
            exp_dist.append(float(md))

    out = image_duplicate_filter(
        rd.from_pandas(pd.DataFrame(rows))
    ).sort_values("doc_id")
    assert list(out["keep"]) == exp_keep
    np.testing.assert_array_equal(out["min_dist"].to_numpy(), np.asarray(exp_dist))
    assert out["min_dist"].dtype == np.float64
    assert any(exp_keep) and not all(exp_keep)


def test_stub_phash_identical_keys_and_missing():
    from dataflow_mm_ray.stages.diversity import phash_bits, stub_phash

    a, b = stub_phash("same.png"), stub_phash("same.png")
    assert a is not None and (a == b).all() and a.shape == (64,)
    assert stub_phash(None) is None
    # every-31st-missing convention shared with stages/nsfw
    missing = [k for k in (f"k{i}" for i in range(200)) if stub_phash(k) is None]
    assert missing
    # phash bits: half above median -> balanced-ish hash
    g = np.arange(1024, dtype=np.float64).reshape(32, 32)
    bits = phash_bits(g)
    assert bits.shape == (64,) and 0 < bits.sum() < 64


def test_io_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from dataflow_mm_ray.sources.io import read_any, read_jsonl_tolerant, write_any

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq_dir = str(tmp_path / "pq")
    write_any(rd.from_pandas(df), pq_dir, "parquet")
    back = read_any(pq_dir, "parquet").to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    # tolerant jsonl: bad line counted, good lines survive
    p = tmp_path / "data.jsonl"
    p.write_text('{"a": 1}\nnot json\n{"a": 2}\n')
    ds, bad = read_jsonl_tolerant(str(p))
    assert bad == 1
    assert sorted(ds.to_pandas()["a"]) == [1, 2]


def test_source_prefix_parsing(ray_session, tmp_path):
    """hf:/ms: prefix rules (storage.py:174-201) + local-export dispatch."""
    import pandas as pd

    from dataflow_mm_ray.sources.io import parse_source_prefix, read_source

    assert parse_source_prefix("hf:openai/gsm8k:main:train") == {
        "kind": "hf", "dataset": "openai/gsm8k", "config": "main",
        "split": "train", "path": None}
    assert parse_source_prefix("hf:squad:validation")["split"] == "validation"
    assert parse_source_prefix("hf:squad:a:b:c")["split"] == "train"  # >2 parts -> default
    assert parse_source_prefix("ms:modelscope/gsm8k:train") == {
        "kind": "ms", "dataset": "modelscope/gsm8k", "config": None,
        "split": "train", "path": None}
    assert parse_source_prefix("ms:d")["split"] == "train"
    assert parse_source_prefix("/tmp/x.parquet")["kind"] == "local"

    # local-export dispatch
    exp = tmp_path / "hf" / "openai/gsm8k" / "main" / "train"
    exp.mkdir(parents=True)
    pd.DataFrame({"q": ["a", "b"]}).to_parquet(exp / "part-0.parquet")
    ds = read_source("hf:openai/gsm8k:main:train", local_export_root=str(tmp_path))
    assert ds.count() == 2
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_source("hf:absent:train", local_export_root=str(tmp_path))
    with _pytest.raises(NotImplementedError):
        read_source("hf:absent:train")


def test_dependency_refiner_skips_degenerate_mcqs():
    # empty options (ZeroDivisionError in % n) and >5 options
    # (IndexError on the 'None of the above' letter) must be skipped,
    # not kill the map task.
    from dataflow_mm_ray.stages.refiners import DependencyRefiner

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "qas": [
                [
                    {"options": [], "answer_idx": 0, "question_title": "q0"},
                    {"options": [f"o{i}" for i in range(7)], "answer_idx": 1,
                     "question_title": "q1"},
                    {"options": ["a", "b", "c"], "answer_idx": 2,
                     "question_title": "q2"},
                ],
                [{"options": ["x", "y"], "answer_idx": 0, "question_title": "q3"}],
            ],
            "image": [["i.png"], ["j.png"]],
        }
    )
    out = DependencyRefiner("Answer this: {}")(df)
    # only the two well-formed MCQs produce rows; qa_idx identifies them
    assert sorted(zip(out["doc_id"], out["qa_idx"])) == [(0, 2), (1, 0)]
