"""Caption-as-Teacher filter (complexity + OCR-overlap gate).

Reference: ``dataflow/operators/core_vision/filter/cat_filter.py:36-111``.
Decision rule per row (``is_consistent``, line 89-93; ``run`` drops rows
whose check raises, line 95-107):

  keep iff caption is non-empty after strip
       AND the dependency parse yields >= min_triples DISTINCT
           (nsubj-text, verb-lemma, object-text) triples
           (``_triples_and_has_verb``, lines 47-68)
       AND the parse contains an action verb (any upos == VERB)
       AND the caption is not OCR-only: token-set Jaccard between the
           image's OCR text and the caption < ocr_overlap_threshold,
           with empty OCR trivially passing (lines 79-87).

The stanza dependency parser and pytesseract OCR are model/binary state
absent from this sandbox. ``triples_and_has_verb`` below transcribes the
reference's extraction over ANY parse structure (differentially tested
against an exec'd transcription of the reference loop), and the shipped
``stub_token_parse`` stands in for stanza with a deterministic grammar:
each disjoint group of 3 regex tokens becomes (nsubj -> VERB root <-
obj). Under that grammar the reference extraction reduces to counting
distinct token 3-grams, which keeps the registered query SQL-oracled
end-to-end; a real stanza pipeline drops into ``CatFilterStage`` via the
``parser`` hook without touching the decision logic.
"""
from __future__ import annotations

import re
from typing import Callable, Sequence

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"[A-Za-z']+")  # cat_filter.py:82-83 token regex


def stub_token_parse(text: str) -> list[list[dict]]:
    """Deterministic stanza stand-in: one sentence; each complete group
    of 3 lowercase tokens becomes subject(nsubj) -> verb(root, VERB) <-
    object(obj); leftover tokens attach nowhere."""
    toks = _TOKEN_RE.findall(text.lower())
    words = []
    for i, tok in enumerate(toks):
        wid = i + 1
        group, pos = divmod(i, 3)
        if pos == 0 and i + 2 < len(toks):
            words.append({"id": wid, "text": tok, "lemma": tok, "upos": "NOUN",
                          "head": 3 * group + 2, "deprel": "nsubj"})
        elif pos == 1 and i + 1 < len(toks):
            words.append({"id": wid, "text": tok, "lemma": tok, "upos": "VERB",
                          "head": 0, "deprel": "root"})
        elif pos == 2:
            words.append({"id": wid, "text": tok, "lemma": tok, "upos": "NOUN",
                          "head": 3 * group + 2, "deprel": "obj"})
        else:  # incomplete trailing group
            words.append({"id": wid, "text": tok, "lemma": tok, "upos": "NOUN",
                          "head": 0, "deprel": "dep"})
    return [words] if words else []


_SUBJ_RELS = ("nsubj", "nsubj:pass")
_OBJ_RELS = ("obj", "iobj", "xcomp", "obl", "attr", "ccomp")


def triples_and_has_verb(sentences: Sequence[Sequence[dict]]) -> tuple[int, bool]:
    """Transcription of ``CatFilter._triples_and_has_verb``
    (cat_filter.py:47-68) over plain dict tokens: distinct
    (subject-text, verb-lemma-or-text, object-text) triples where the
    subject's head is a VERB, plus whether any VERB appears."""
    triples = set()
    has_verb = False
    for words in sentences:
        children: dict[int, list[dict]] = {}
        for w in words:
            children.setdefault(w["head"], []).append(w)
            if w["upos"] == "VERB":
                has_verb = True
        for w in words:
            if w["deprel"] in _SUBJ_RELS:
                head_idx = w["head"]
                if head_idx == 0:
                    continue
                head = words[head_idx - 1]
                if head["upos"] != "VERB":
                    continue
                for ch in children.get(head["id"], []):
                    if ch["deprel"] in _OBJ_RELS:
                        triples.add((w["text"], head.get("lemma") or head["text"], ch["text"]))
    return len(triples), has_verb


def ocr_only_gate(ocr_text: str, caption: str, threshold: float) -> bool:
    """``is_not_ocr_only`` (cat_filter.py:79-87): True when the caption
    is NOT just a transcription of the on-image text."""
    ocr_tokens = set(_TOKEN_RE.findall((ocr_text or "").lower()))
    cap_tokens = set(_TOKEN_RE.findall((caption or "").lower()))
    if not ocr_tokens:
        return True
    jaccard = len(ocr_tokens & cap_tokens) / len(ocr_tokens | cap_tokens)
    return jaccard < threshold


class CatFilterStage:
    """Actor-pool callable: the parser (stanza in the reference) is
    per-actor state loaded once; rows whose processing raises are
    dropped like the reference's per-row try/except (cat_filter.py:
    98-104). Emits kept rows plus a ``triple_cnt`` evidence column."""

    def __init__(self, caption_key: str, ocr_key: str, min_triples: int = 2,
                 ocr_overlap_threshold: float = 0.2,
                 parser: Callable[[str], list] = stub_token_parse):
        self.parser = parser  # a real stanza Pipeline loads here
        self.caption_key = caption_key
        self.ocr_key = ocr_key
        self.min_triples = min_triples
        self.ocr_thresh = ocr_overlap_threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(batch), dtype=bool)
        cnts = np.zeros(len(batch), dtype=np.int64)
        caps = batch[self.caption_key].tolist()
        ocrs = batch[self.ocr_key].tolist()
        for i, (cap, ocr) in enumerate(zip(caps, ocrs)):
            try:
                if cap is None or (isinstance(cap, float) and pd.isna(cap)) or not str(cap).strip():
                    continue
                cap = str(cap)
                cnt, has_verb = triples_and_has_verb(self.parser(cap))
                cnts[i] = cnt
                keep[i] = (
                    cnt >= self.min_triples
                    and has_verb
                    and ocr_only_gate("" if ocr is None else str(ocr), cap, self.ocr_thresh)
                )
            except Exception:  # noqa: BLE001 — reference drops error rows
                keep[i] = False
        out = batch.copy(deep=False)
        out["triple_cnt"] = cnts
        return out[keep]
