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


# ---------------------------------------------------------------------------
# ImageCatFilter (image_cat_filter.py:105-171)
# ---------------------------------------------------------------------------


def _cat_ref_is_consistent(caption, ocr_text, *, complexity_thresh=0.4, min_caps=2,
                           action_thresh=0.4, ocr_thresh=0.2, ocr_nli_thresh=0.6):
    """Transcription of the reference decision methods with the stub
    entailment in place of the MNLI model (premise stripped, empty -> 0,
    exactly _entail_prob's contract at image_cat_filter.py:105-120)."""
    import re

    from dataflow_mm_ray.stages.nli import (
        CAT_ACTION_HYPOTHESIS,
        CAT_CAPS_HYPOTHESES,
        CAT_OCR_ONLY_HYPOTHESIS,
    )

    def entail(premise, hypothesis):
        premise = (premise or "").strip()
        hypothesis = (hypothesis or "").strip()
        if not premise or not hypothesis:
            return 0.0
        return _score(premise, hypothesis) / 4294967296.0

    # is_consistent (164-171)
    if not caption or not caption.strip():
        return False
    # _count_capabilities (122-130) + is_complex_caption (132-134)
    if not caption or len(caption.strip()) < 5:
        cnt = 0
    else:
        cnt = sum(1 for h in CAT_CAPS_HYPOTHESES if entail(caption, h) >= complexity_thresh)
    if cnt < min_caps:
        return False
    # has_action_verb (136-138)
    if entail(caption, CAT_ACTION_HYPOTHESIS) < action_thresh:
        return False
    # is_not_ocr_only (140-162)
    if ocr_thresh <= 0:
        return True
    ocr_tokens = set(re.findall(r"[A-Za-z']+", (ocr_text or "").lower()))
    cap_tokens = set(re.findall(r"[A-Za-z']+", (caption or "").lower()))
    if not ocr_tokens:
        return True
    jaccard = len(ocr_tokens & cap_tokens) / len(ocr_tokens | cap_tokens)
    if jaccard >= ocr_thresh:
        if entail(caption, CAT_OCR_ONLY_HYPOTHESIS) >= ocr_nli_thresh:
            return False
    return True


def test_cat_nli_filter_matches_reference_loop():
    from dataflow_mm_ray.stages.nli import CatNLIFilter

    rng = np.random.default_rng(17)
    words = ["cat", "dog", "runs", "jumps", "table", "red", "sign", "text", "'s"]
    captions = []
    for i in range(400):
        k = int(rng.integers(0, 12))
        cap = " ".join(rng.choice(words, size=k)) if k else ""
        if i % 13 == 0:
            cap = "  " + cap + "\t"
        if i % 29 == 0:
            cap = ""
        if i % 31 == 0:
            cap = "abc"  # < 5 chars after strip
        captions.append(cap)
    # OCR: sometimes the caption prefix (high overlap), sometimes junk
    ocr = [c[:40] if i % 2 == 0 else "zzz qqq" for i, c in enumerate(captions)]
    df = pd.DataFrame({"doc_id": np.arange(400), "text": captions, "ocr_text": ocr})
    stage = CatNLIFilter(caption_key="text", ocr_key="ocr_text")
    kept = stage(df)
    want = {i for i, (c, o) in enumerate(zip(captions, ocr)) if _cat_ref_is_consistent(c, o)}
    assert set(kept["doc_id"]) == want
    assert (want == set()) is False  # non-degenerate
    assert len(want) < 400


def test_cat_nli_ocr_disabled_threshold_zero():
    # is_not_ocr_only returns True when ocr_thresh <= 0 (line 141-142)
    from dataflow_mm_ray.stages.nli import CatNLIFilter

    df = pd.DataFrame({"doc_id": [0], "text": ["cat runs fast over table"],
                       "ocr_text": ["cat runs fast over table"]})
    with_gate = CatNLIFilter("text", "ocr_text")(df.copy())
    without = CatNLIFilter("text", "ocr_text", ocr_overlap_threshold=0.0)(df.copy())
    ref_keep = _cat_ref_is_consistent(df["text"][0], df["ocr_text"][0])
    ref_keep_no = _cat_ref_is_consistent(df["text"][0], df["ocr_text"][0], ocr_thresh=0.0)
    assert (len(with_gate) == 1) == ref_keep
    assert (len(without) == 1) == ref_keep_no
