"""Full RuleBaseFilter (text rules + image basic + NSFW) — differential
test of the engine's vectorized decision against a literal transcription
of the reference per-sample loop (rule_base_filter.py:204-241,357-378).
Pure kernel tests, no Ray."""
import numpy as np
import pandas as pd

from dataflow_mm_ray.functions.text_rules import rule_flags
from dataflow_mm_ray.stages.nsfw import (
    ALLOWED_FORMATS,
    RuleBaseFullFilter,
    StubNSFWBackend,
    _u32,
    nsfw_unsafe_mask,
    stub_image_meta,
)


def _ref_filter_sample(text, key, params):
    """Transcription of the reference decision order (_filter_sample:
    text -> load -> basic -> nsfw), using the same stub probe."""
    if text and isinstance(text, str) and len(text.strip()) > 0:
        if any(rule_flags(text)):  # any rule fired -> text half fails
            return False
    if key is None:
        return False
    meta = stub_image_meta([key]).iloc[0]
    if not meta["exists"]:
        return False  # _load_image returned None
    # _check_image_basic
    if meta["img_format"] and meta["img_format"].upper() not in ALLOWED_FORMATS:
        return False
    w, h = int(meta["width"]), int(meta["height"])
    if w < params["min_w"] or h < params["min_h"]:
        return False
    if w > params["max_w"] or h > params["max_h"]:
        return False
    ar = w / h
    if ar < params["min_ar"] or ar > params["max_ar"]:
        return False
    # _check_nsfw_content
    for label, score in StubNSFWBackend().scores([key])[0].items():
        ll = label.lower()
        if ("nsfw" in ll or "porn" in ll or "explicit" in ll) and score > params["thr"]:
            return False
    return True


def test_full_filter_differential_vs_reference_loop():
    rng = np.random.default_rng(7)
    texts = [
        "",  # empty -> text rules skipped
        "   ",
        None,
        "a perfectly normal sentence about data processing pipelines.",
        "lorem ipsum " * 40,  # fails the lorem rule
        "SHOUTY CAPS " * 30,  # fails capital-words
        "word " * 50,
    ]
    rows = []
    for i in range(400):
        rows.append(
            {
                "doc_id": i,
                "text": texts[int(rng.integers(len(texts)))],
                "image_key": None if i % 37 == 0 else f"bucket{i % 5}/{i}.img",
            }
        )
    df = pd.DataFrame(rows)
    params = dict(min_w=16, min_h=16, max_w=8192, max_h=8192,
                  min_ar=0.001, max_ar=1000.0, thr=0.5)
    expected = [
        r["doc_id"]
        for r in rows
        if _ref_filter_sample(r["text"], r["image_key"], params)
    ]
    out = RuleBaseFullFilter()(df)
    assert list(out["doc_id"]) == expected
    # evidence columns match the probe
    for _, r in out.iterrows():
        k = df.loc[df["doc_id"] == r["doc_id"], "image_key"].iloc[0]
        m = stub_image_meta([k]).iloc[0]
        assert (r["width"], r["height"], r["img_format"]) == (
            m["width"], m["height"], m["img_format"])
        assert r["nsfw_u32"] == _u32(k, "nsfw")


def test_nsfw_label_substring_rule():
    # rule_base_filter.py:236-239 — only nsfw/porn/explicit labels count,
    # strictly-above threshold.
    res = [
        {"normal": 0.99},
        {"nsfw": 0.5},        # not strictly above
        {"nsfw": 0.500001},
        {"PORNOGRAPHY": 0.6},
        {"explicit_content": 0.51, "safe": 0.9},
    ]
    assert list(nsfw_unsafe_mask(res, 0.5)) == [False, False, True, True, True]


def test_meta_gates_all_fire():
    # over a large key population every basic gate must reject someone —
    # guards against a stub whose ranges can never violate a bound.
    keys = [f"k{i}" for i in range(20000)]
    m = stub_image_meta(keys)
    assert (~m["exists"]).any()
    assert (~m["img_format"].isin(ALLOWED_FORMATS)).any()
    assert (m["width"] < 16).any() and (m["width"] > 8192).any()
    assert (m["height"] < 16).any() and (m["height"] > 8192).any()
    ar = m["width"] / m["height"]
    # dims-in-range rows can still violate aspect (e.g. 1/1500 < 0.001)
    assert (ar < 0.001).any() and (ar > 1000.0).any()


def test_clip_family_evaluator_zero_semantics():
    # image_clip_evaluator.py:60-66 — failed load or empty text -> 0.0;
    # otherwise the (clamped) model score. Non-destructive: every row out.
    import pandas as pd

    from dataflow_mm_ray.stages.clip_eval import (
        VQA_TEMPLATE,
        ClipFamilyEvaluator,
        StubPairScorer,
    )

    missing = next(f"k{i}" for i in range(200) if _u32(f"k{i}", "exists") % 31 == 0)
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a caption", "", "   ", "long caption"],
            "image_key": ["img.png", "img.png", "img.png", missing],
        }
    )
    out = ClipFamilyEvaluator(score_col="clip_score")(df)
    assert len(out) == 4
    assert out.loc[1, "clip_score"] == 0.0 and out.loc[2, "clip_score"] == 0.0
    assert out.loc[3, "clip_score"] == 0.0  # missing image
    expect = StubPairScorer("clip").scores(["img.png"], ["a caption"])[0]
    assert out.loc[0, "clip_score"] == expect
    # op salt + template keep the three models distinct
    vqa = ClipFamilyEvaluator(
        score_col="vqa_score", template=VQA_TEMPLATE,
        backend_kwargs={"op": "vqa"},
    )(df)
    long = ClipFamilyEvaluator(
        score_col="longclip_score", backend_kwargs={"op": "longclip"}
    )(df)
    assert vqa.loc[0, "vqa_score"] not in (out.loc[0, "clip_score"], long.loc[0, "longclip_score"])
