"""Decision-rule semantics of the zero-shot NLI filter family
(image_sensitive_filter.py / image_complexity_filter.py /
image_consistency_filter.py) — pure kernel tests, no Ray."""
import hashlib

import numpy as np
import pandas as pd

from dataflow_mm_ray.stages.nli import (
    COMPLEXITY_CAPS,
    SENSITIVE_LABELS,
    ComplexityFilter,
    ConsistencyFilter,
    SensitiveFilter,
    StubNLIBackend,
    stub_entail_u32,
)


def _score(premise, hyp):
    return int(hashlib.md5((premise + "\x1f" + hyp).encode()).hexdigest()[:8], 16)


def test_stub_backend_matches_u32():
    ps = ["a", "some longer premise", ""]
    hs = ["h1", "h2", "h3"]
    u32 = stub_entail_u32(ps, hs)
    assert list(u32) == [_score(p, h) for p, h in zip(ps, hs)]
    probs = StubNLIBackend().entail(ps, hs)
    assert np.array_equal(probs, u32 / 4294967296.0)


def test_sensitive_empty_text_is_safe_missing_image_drops():
    # image_sensitive_filter.py:77-78 (empty text scores 0.0 on every
    # label -> safe) and 101-106 (missing image path -> unsafe).
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["", "   ", None, "x"],
            "img": ["a.png", "a.png", "a.png", ""],
        }
    )
    out = SensitiveFilter(text_keys=["text"], image_key="img", threshold=0.0)(df)
    # threshold=0.0: every non-empty text is unsafe; rows 1-3 are empty ->
    # risk 0, but 0 < 0.0 is false, so with t=0 nothing survives.
    assert list(out["doc_id"]) == []
    out = SensitiveFilter(text_keys=["text"], image_key="img", threshold=0.5)(df)
    # empty texts safe regardless of hash; doc 4 has no image -> dropped.
    kept = set(out["doc_id"])
    assert {1, 2, 3} <= kept or kept <= {1, 2, 3}
    assert 4 not in kept
    assert {1, 2, 3} == kept  # max_risk 0 < 0.5


def test_sensitive_multi_text_any_unsafe_drops():
    hot = "hot text"
    # find whether 'hot text' crosses 0.5 on any label
    mx = max(_score(hot, h) for h in SENSITIVE_LABELS.values()) / 4294967296.0
    df = pd.DataFrame({"doc_id": [1], "a": ["totally fine"], "b": [hot], "img": ["i.png"]})
    out = SensitiveFilter(text_keys=["a", "b"], image_key="img", threshold=mx)(df)
    assert list(out["doc_id"]) == []  # b's max >= threshold -> unsafe


def test_complexity_short_caption_detects_nothing():
    # image_complexity_filter.py:76-77: captions < 5 chars detect nothing
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["abc", "    ", None]})
    out = ComplexityFilter(caption_key="text", threshold=0.0, min_k=1)(df)
    assert list(out["doc_id"]) == []


def test_complexity_min_k_boundary():
    text = "a sufficiently long caption"
    caps = sum(
        _score(text, f"The following text describes {c}.") >= 0.4 * 4294967296.0
        for c in COMPLEXITY_CAPS
    )
    df = pd.DataFrame({"doc_id": [1], "text": [text]})
    kept_at = ComplexityFilter("text", threshold=0.4, min_k=caps)(df)
    dropped_at = ComplexityFilter("text", threshold=0.4, min_k=caps + 1)(df)
    assert list(kept_at["doc_id"]) == [1]
    assert list(kept_at["caps_detected"]) == [caps]
    assert list(dropped_at["doc_id"]) == []


def test_consistency_empty_answer_dropped_and_strip_semantics():
    # image_consistency_filter.py:63-66: empty hypothesis -> 0.0
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "c": ["  cap  ", "cap"],
            "q": ["q?", "q?"],
            "a": ["", "ans"],
        }
    )
    out = ConsistencyFilter("c", "q", "a", threshold=0.0)(df)
    # threshold 0.0: every score >= 0 passes, including the empty answer
    assert list(out["doc_id"]) == [1, 2]
    out = ConsistencyFilter("c", "q", "a", threshold=1e-9)(df)
    assert 1 not in set(out["doc_id"])  # empty answer -> score 0 < 1e-9
    # premise strip parity: "  cap  " and "cap" produce the same premise
    assert list(out["entail_u32"]) == [_score("cap q?", "ans")]
