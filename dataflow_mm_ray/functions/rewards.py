"""Answer-reward kernels — reference ``GeneralTextAnswerEvaluator``
(``dataflow/operators/core_vision/eval/general_text_answer_evaluator.py``):

- ``extract_answer``: text between <answer> tags (lines 46-52);
- ``multiple choice``: stripped exact match -> 1.0/0.0 (line 119);
- ``numerical``: decimal-presence ('.' or ',') must agree, then
  round-2 float equality after comma removal (lines 120-129);
- ``OCR``: 1 - word error rate (word-level Levenshtein / max(1, ref
  words), lines 63-81), clamped to [0,1];
- ``free-form``: mean of ROUGE-1/2/L F-measures (lines 95-100);
- ``regression``: 1 - clamped relative difference (lines 137-144);
- unknown types and internal errors -> 0.0 (lines 145-149).

Deviation (documented): the reference's ROUGE uses rouge_score's
Porter stemmer (``use_stemmer=True``); that package is not available
here, so the engine computes ROUGE on whitespace tokens without
stemming. Same formulas (unigram/bigram overlap F1, LCS F1).
"""
from __future__ import annotations

import re

import numpy as np

_ANSWER_RE = re.compile(r"<answer>\s*(.*?)\s*</answer>", re.DOTALL)


def extract_answer(text: str) -> str:
    m = _ANSWER_RE.search(text or "")
    return m.group(1).strip() if m else ""


def normalize_number(s: str):
    try:
        return float(s.replace(",", ""))
    except Exception:
        return None


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate via word-level edit distance (evaluator lines
    63-81; O(m) rolling rows instead of the full matrix)."""
    ref = reference.split()
    hyp = hypothesis.split()
    m, n = len(ref), len(hyp)
    prev = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, n + 1):
            cur[j] = (
                prev[j - 1]
                if ref[i - 1] == hyp[j - 1]
                else 1 + min(prev[j], cur[j - 1], prev[j - 1])
            )
        prev = cur
    return prev[n] / max(1, m)


def _f1(match: int, n_ref: int, n_hyp: int) -> float:
    if match == 0:
        return 0.0
    p, r = match / n_hyp, match / n_ref
    return 2 * p * r / (p + r)


def _ngram_overlap(ref: list[str], hyp: list[str], n: int) -> float:
    if len(ref) < n or len(hyp) < n:
        return 0.0
    from collections import Counter

    rg = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
    hg = Counter(tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1))
    match = sum(min(rg[g], hg[g]) for g in rg if g in hg)
    return _f1(match, sum(rg.values()), sum(hg.values()))


def _lcs_len(a: list[str], b: list[str]) -> int:
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    for i in range(1, len(a) + 1):
        cur = np.zeros(len(b) + 1, dtype=np.int64)
        for j in range(1, len(b) + 1):
            cur[j] = prev[j - 1] + 1 if a[i - 1] == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return int(prev[len(b)])


def rouge_avg_f(reference: str, hypothesis: str) -> float:
    """(rouge1_f + rouge2_f + rougeL_f) / 3 over whitespace tokens."""
    ref, hyp = reference.split(), hypothesis.split()
    if not ref or not hyp:
        return 0.0
    r1 = _ngram_overlap(ref, hyp, 1)
    r2 = _ngram_overlap(ref, hyp, 2)
    rl = _f1(_lcs_len(ref, hyp), len(ref), len(hyp))
    return (r1 + r2 + rl) / 3


def calculate_reward(gt_solution: str, model_output: str, question_type: str) -> float:
    try:
        out_ans = extract_answer(model_output)
        gt_ans = extract_answer(gt_solution)
        if question_type == "multiple choice":
            return 1.0 if out_ans.strip() == gt_ans.strip() else 0.0
        if question_type == "numerical":
            gt_dec = ("." in gt_ans) or ("," in gt_ans)
            out_dec = ("." in out_ans) or ("," in out_ans)
            if gt_dec != out_dec:
                return 0.0
            g, o = normalize_number(gt_ans), normalize_number(out_ans)
            if g is None or o is None:
                return 0.0
            return 1.0 if round(g, 2) == round(o, 2) else 0.0
        if question_type == "OCR":
            return max(0.0, min(1.0, 1 - wer(gt_ans, out_ans)))
        if question_type == "free-form":
            return max(0.0, min(1.0, rouge_avg_f(gt_ans, out_ans)))
        if question_type == "regression":
            g, o = normalize_number(gt_ans), normalize_number(out_ans)
            if g is None or o is None:
                return 0.0
            rel = (abs(o - g) + 1e-9) / (abs(g) + 1e-9)
            return 1 - min(1.0, max(0.0, rel))
        return 0.0
    except Exception:
        return 0.0
