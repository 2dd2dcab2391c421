"""WikiQA text-structure parser — reference ``WikiQARefiner``
(``dataflow/operators/core_vision/refine/wiki_qa_refiner.py:8-78``):
split a raw "Wikipedia article + QA" text into {context, qas}:

- the QA section starts at a "Question-Answer Pairs"/"Q&A"/"QA"/
  "Question(s)" heading (markdown-tolerant), falling back to the first
  "Question:"/"Q:" line; no QA markers -> whole text is context;
- context is stripped of "(Wikipedia) Article:" lead-ins and trailing
  '---' rules, whitespace-collapsed;
- the QA section splits into blocks at numbered/bulleted
  "Question:"/"Q:" markers; within a block the first "Answer:"/"A:"
  marker separates question from answer; markdown '*' runs removed;
  blocks missing either side are dropped.
"""
from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")
_STARS_RE = re.compile(r"\*+")
_SPLIT_RE = re.compile(
    r"(?i)(?:\n|^)\s*(?:###|\*\*|---)?\s*(?:Question[-–—\s]*Answer\s*Pairs|Q&A|QA|Questions?)\s*(?::|\*\*|---)?"
)
_FALLBACK_RE = re.compile(r"(?i)(?:\n|^)\s*(?:-\s*)?(?:Question|Q)\s*[:：]")
_ARTICLE_RE = re.compile(r"(?i)^\s*(?:###\s*)?(?:Wikipedia\s+)?Article\s*:?")
_TRAILING_RULE_RE = re.compile(r"\s*---+\s*$")
_QA_BLOCK_RE = re.compile(r"(?m)^\s*(?:\d+[\.\)]|[-•*]\s*)?(?:Question|Q)\s*[:：]?")
_ANSWER_RE = re.compile(r"(?i)(?:\n|^|\s+)(?:-\s*)?(?:Answer|A)\s*[:：]\s*(.*)", re.DOTALL)


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", s or "").strip()


def _destar(s: str) -> str:
    return _STARS_RE.sub("", s or "").strip()


def parse_wiki_qa(text) -> dict:
    if not isinstance(text, str) or not text.strip():
        return {"context": "", "qas": []}
    m = _SPLIT_RE.search(text)
    if m:
        raw_context, raw_qa = text[: m.start()], text[m.end():]
    else:
        fb = _FALLBACK_RE.search(text)
        if fb:
            raw_context, raw_qa = text[: fb.start()], text[fb.start():]
        else:
            return {"context": _norm(text), "qas": []}
    context = _ARTICLE_RE.sub("", raw_context).strip()
    context = _TRAILING_RULE_RE.sub("", context)
    context = _norm(context)
    qas = []
    for block in _QA_BLOCK_RE.split(raw_qa):
        if not block.strip():
            continue
        am = _ANSWER_RE.search(block)
        if not am:
            continue
        q = _norm(_destar(block[: am.start()]))
        a = _norm(_destar(am.group(1)))
        if q and a:
            qas.append({"question": q, "answer": a})
    return {"context": context, "qas": qas}
