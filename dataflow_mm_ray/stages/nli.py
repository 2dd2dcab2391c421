"""Zero-shot NLI filter family (sensitive / complexity / consistency).

Reference semantics (reimplemented, not copied):

- ``ImageSensitiveFilter`` — ``dataflow/operators/core_vision/filter/
  image_sensitive_filter.py:13-131``: for each row, every text column is
  scored against six natural-language risk descriptions with an NLI
  entailment model; empty/whitespace text scores 0.0 on every label
  (line 77-78); a row is unsafe if ANY text's max label score is
  ``>= threshold`` (``is_safe_text``, line 96-99: safe iff max < t); the
  image path must be present (``is_safe_image``, line 101-106). Unsafe
  rows are dropped.
- ``ImageComplexityFilter`` — ``image_complexity_filter.py:10-105``: a
  caption "detects" a visual-capability label when the entailment
  probability of "The following text describes {cap}." is
  ``>= threshold`` (line 87-88); captions that are empty or shorter
  than 5 chars after strip detect nothing (line 76-77); keep iff at
  least ``min_k`` capabilities detected (line 92-94).
- ``ImageConsistencyFilter`` — ``image_consistency_filter.py:10-102``:
  premise = ``caption.strip() + " " + question.strip()``, hypothesis =
  ``answer.strip()``; empty hypothesis scores 0.0 (line 63-66); keep iff
  the entailment probability ``>= threshold`` (line 72-74).

Ray-Data-native mapping: the NLI model is heavy per-actor state, so each
filter is a callable class for ``map_batches(cls, concurrency=(1, n))``
— construction (model load) once per actor, batched scoring per Arrow
block. No model weights exist in this sandbox, so the shipped backend is
a deterministic md5-derived entailment stub (exactly SQL-expressible, so
every filter keeps a bit-exact DuckDB oracle); a real MNLI model only
needs to subclass ``NLIBackend`` and batch its forward pass.
"""
from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd

# image_sensitive_filter.py:14-21 — the six risk hypotheses.
SENSITIVE_LABELS: dict[str, str] = {
    "sexual_content": "The text describes sexual content, nudity or pornography.",
    "violence": "The text describes or encourages physical violence, injury, or killing.",
    "self_harm": "The text mentions suicide, self-harm or wanting to die.",
    "hate": "The text attacks or insults a group based on race, religion, gender or similar traits.",
    "harassment": "The text insults, bullies or harasses a person.",
    "threat": "The text threatens to harm a person or a group.",
}

# image_complexity_filter.py:11-23 — capability labels + hypothesis template.
COMPLEXITY_CAPS: list[str] = [
    "color",
    "shape",
    "object recognition",
    "action recognition",
    "text recognition",
    "spatial recognition",
    "counting",
    "spatial relationship",
    "object interaction",
    "scene understanding",
]
COMPLEXITY_TEMPLATE = "The following text describes {}."

_SEP = "\x1f"  # premise/hypothesis separator of the stub hash (chr(31) in SQL)


class NLIBackend:
    """Entailment scorer; constructed once per pool actor. A real
    implementation loads an MNLI model here and batches the pairs."""

    def entail(self, premises: Sequence[str], hypotheses: Sequence[str]) -> np.ndarray:
        raise NotImplementedError


class StubNLIBackend(NLIBackend):
    """Deterministic entailment stub: p = first 32 md5 bits of
    ``premise + chr(31) + hypothesis`` divided by 2^32. The division by a
    power of two is exact in float64, so DuckDB reproduces the score
    bit-for-bit via ``('0x'||substr(md5(...),1,8))::BIGINT``."""

    def entail(self, premises, hypotheses):
        return np.fromiter(
            (
                int(hashlib.md5((p + _SEP + h).encode("utf-8")).hexdigest()[:8], 16) / 4294967296.0
                for p, h in zip(premises, hypotheses)
            ),
            dtype=np.float64,
            count=len(premises),
        )


def stub_entail_u32(premises: Sequence[str], hypotheses: Sequence[str]) -> np.ndarray:
    """Raw 32-bit stub scores (integer form used in query outputs)."""
    return np.fromiter(
        (
            int(hashlib.md5((p + _SEP + h).encode("utf-8")).hexdigest()[:8], 16)
            for p, h in zip(premises, hypotheses)
        ),
        dtype=np.int64,
        count=len(premises),
    )


def _clean_texts(col: pd.Series) -> list[str]:
    return ["" if pd.isna(v) else str(v) for v in col]


class SensitiveFilter:
    """Actor-pool callable for the ImageSensitiveFilter decision rule.

    Emits ``safe`` plus the integer ``max_risk_u32`` evidence column
    (max over texts x labels of the 32-bit stub score; only defined for
    non-empty texts — empty text contributes 0)."""

    def __init__(self, text_keys: Sequence[str], image_key: str,
                 threshold: float = 0.5, backend_cls=StubNLIBackend, backend_kwargs=None):
        self.backend = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.text_keys = list(text_keys)
        self.image_key = image_key
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        max_risk = np.zeros(n, dtype=np.float64)
        max_u32 = np.zeros(n, dtype=np.int64)
        for key in self.text_keys:
            texts = _clean_texts(batch[key])
            # score_text: empty/whitespace-only -> all labels 0.0
            nonempty = np.array([bool(t.strip()) for t in texts])
            for hyp in SENSITIVE_LABELS.values():
                u32 = stub_entail_u32(texts, [hyp] * n)
                u32[~nonempty] = 0
                max_u32 = np.maximum(max_u32, u32)
        max_risk = max_u32 / 4294967296.0
        img = batch[self.image_key]
        img_ok = np.array([not pd.isna(v) and bool(str(v)) for v in img])
        safe = img_ok & (max_risk < self.threshold)
        out = batch.copy(deep=False)
        out["max_risk_u32"] = max_u32
        out["safe"] = safe
        return out[safe]


class ComplexityFilter:
    """Actor-pool callable for the ImageComplexityFilter rule: count
    capability labels whose entailment >= threshold; keep iff count >=
    min_k. Captions empty or < 5 chars after strip detect nothing."""

    def __init__(self, caption_key: str, threshold: float = 0.4, min_k: int = 2,
                 backend_cls=StubNLIBackend, backend_kwargs=None):
        self.backend = backend_cls(**(backend_kwargs or {}))
        self.caption_key = caption_key
        self.threshold = threshold
        self.min_k = min_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        texts = _clean_texts(batch[self.caption_key])
        eligible = np.array([len(t.strip()) >= 5 for t in texts])
        caps = np.zeros(n, dtype=np.int64)
        thresh_u32 = self.threshold * 4294967296.0
        for cap in COMPLEXITY_CAPS:
            hyp = COMPLEXITY_TEMPLATE.format(cap)
            u32 = stub_entail_u32(texts, [hyp] * n)
            caps += ((u32 >= thresh_u32) & eligible).astype(np.int64)
        out = batch.copy(deep=False)
        out["caps_detected"] = caps
        return out[caps >= self.min_k]


# image_cat_filter.py:17-28 — capability / action / OCR-only hypotheses.
CAT_CAPS_HYPOTHESES: list[str] = [
    "The caption describes what people or objects are doing.",
    "The caption describes interactions between multiple people or objects.",
    "The caption provides rich details about the scene.",
    "The caption mentions spatial relationships or positions of objects in the scene.",
    "The caption describes multiple aspects of the image rather than a single short fact.",
]
CAT_ACTION_HYPOTHESIS = "The caption clearly describes an action happening in the scene."
CAT_OCR_ONLY_HYPOTHESIS = (
    "The caption mainly transcribes the visible text in the image instead of describing the visual scene."
)

class CatNLIFilter:
    """Actor-pool callable for the ImageCatFilter decision rule
    (``image_cat_filter.py:105-171``): keep a row iff

    - the caption is non-empty after strip (``is_consistent``, 165-166);
    - >= ``min_caps`` of the five capability hypotheses are entailed at
      >= ``complexity_thresh`` — captions shorter than 5 chars after
      strip detect nothing (``_count_capabilities``, 122-130);
    - the action hypothesis is entailed at >= ``action_thresh`` (136-138);
    - the caption is not OCR-only (``is_not_ocr_only``, 140-162): when
      the OCR-token/caption-token Jaccard (token sets from
      ``[A-Za-z']+`` over lowered text) is >= ``ocr_overlap_threshold``
      AND the OCR-only hypothesis is entailed at >= ``ocr_nli_thresh``,
      drop; empty OCR text trivially passes.

    ``_entail_prob`` (105-120) STRIPS the premise and returns 0.0 for an
    empty premise/hypothesis — so all stub scores here hash the stripped
    caption. Emits ``caps_detected`` evidence."""

    def __init__(self, caption_key: str, ocr_key: str,
                 complexity_thresh: float = 0.4, min_caps: int = 2,
                 action_thresh: float = 0.4, ocr_overlap_threshold: float = 0.2,
                 ocr_nli_thresh: float = 0.6,
                 backend_cls=StubNLIBackend, backend_kwargs=None):
        import re

        self.backend = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.caption_key = caption_key
        self.ocr_key = ocr_key
        self.complexity_thresh = complexity_thresh
        self.min_caps = min_caps
        self.action_thresh = action_thresh
        self.ocr_thresh = ocr_overlap_threshold
        self.ocr_nli_thresh = ocr_nli_thresh
        self.token_re = re.compile(r"[A-Za-z']+")  # image_cat_filter.py:153-154

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        raw = _clean_texts(batch[self.caption_key])
        prem = [c.strip() for c in raw]
        nonempty = np.array([len(p) > 0 for p in prem])
        elig = np.array([len(p) >= 5 for p in prem])

        caps = np.zeros(n, dtype=np.int64)
        for hyp in CAT_CAPS_HYPOTHESES:
            u32 = stub_entail_u32(prem, [hyp] * n)
            u32[~nonempty] = 0  # _entail_prob: empty premise -> 0.0
            caps += ((u32 >= self.complexity_thresh * 4294967296.0) & elig).astype(np.int64)

        action = stub_entail_u32(prem, [CAT_ACTION_HYPOTHESIS] * n)
        action[~nonempty] = 0

        ocr_raw = _clean_texts(batch[self.ocr_key])
        ocr_nli = stub_entail_u32(prem, [CAT_OCR_ONLY_HYPOTHESIS] * n)
        ocr_nli[~nonempty] = 0
        ocr_only = np.zeros(n, dtype=bool)
        if self.ocr_thresh > 0:
            for i, (o, c) in enumerate(zip(ocr_raw, raw)):
                ot = set(self.token_re.findall(o.lower()))
                if not ot:
                    continue
                ct = set(self.token_re.findall(c.lower()))
                jac = len(ot & ct) / len(ot | ct)
                ocr_only[i] = (
                    jac >= self.ocr_thresh
                    and ocr_nli[i] >= self.ocr_nli_thresh * 4294967296.0
                )

        keep = (
            nonempty
            & (caps >= self.min_caps)
            & (action >= self.action_thresh * 4294967296.0)
            & ~ocr_only
        )
        out = batch.copy(deep=False)
        out["caps_detected"] = caps
        return out[keep]


class ConsistencyFilter:
    """Actor-pool callable for the ImageConsistencyFilter rule: NLI
    entailment of answer given caption+question; keep iff >= threshold."""

    def __init__(self, caption_key: str, question_key: str, answer_key: str,
                 threshold: float = 0.35, backend_cls=StubNLIBackend, backend_kwargs=None):
        self.backend = backend_cls(**(backend_kwargs or {}))
        self.keys = (caption_key, question_key, answer_key)
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ck, qk, ak = self.keys
        caps = _clean_texts(batch[ck])
        qs = _clean_texts(batch[qk])
        ans = _clean_texts(batch[ak])
        premises = [c.strip() + " " + q.strip() for c, q in zip(caps, qs)]
        hyps = [a.strip() for a in ans]
        u32 = stub_entail_u32(premises, hyps)
        u32[np.array([len(h) == 0 for h in hyps])] = 0
        out = batch.copy(deep=False)
        out["entail_u32"] = u32
        return out[u32 / 4294967296.0 >= self.threshold]
