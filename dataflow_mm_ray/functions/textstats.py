"""Text analysis kernels for large-scale training-data pipelines:
normalization, token counting, quality scoring, language ID and
document fingerprinting. All SQL-expressible (oracles in
queries_text.py) and deterministic.

The normalizer mirrors the reference's basic text normalization
(``dataflow/operators/core_vision/filter/rule_base_filter.py:35-54``,
also the BasicTextNormalizer semantics of
``dataflow/operators/core_audio/refine/audio_text_normalizer.py``):
strip ASCII punctuation, lowercase, collapse whitespace.
"""
from __future__ import annotations

import hashlib
import re
import string

import numpy as np
import pandas as pd

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)
_WS_RE = re.compile(r"\s+")
# BPE-ish pretokenizer: letter runs, digit runs, single non-alnum marks
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_CJK_RE = re.compile(r"[一-鿿]")

STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "es": ("el", "los", "las", "una", "es", "y", "en", "por", "con", "para"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")  # deterministic tie-break order

SHINGLE_WORDS = 5


def normalize_basic(text: str) -> str:
    """lowercase, strip ASCII punctuation, collapse whitespace."""
    return _WS_RE.sub(" ", str(text).translate(_PUNCT_TABLE).lower().strip())


def token_counts(text: str) -> tuple[int, int]:
    """(whitespace tokens, BPE-ish pretokens)."""
    return len(text.split()), len(_TOKEN_RE.findall(text))


def quality_metrics(text: str) -> tuple[int, int, float, float, float]:
    """(n_chars, n_words, mean_word_len, stopword_ratio, punct_ratio).

    Ratios follow the reference's heuristic-filter style: stopword ratio
    over lowercased whitespace words (English stop list), punctuation
    chars over total chars.
    """
    n_chars = len(text)
    words = text.lower().split()
    n_words = len(words)
    mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    stops = set(STOPWORDS["en"])
    stop_ratio = (sum(w in stops for w in words) / n_words) if n_words else 0.0
    n_punct = sum(c in string.punctuation for c in text)
    punct_ratio = (n_punct / n_chars) if n_chars else 0.0
    return n_chars, n_words, mean_wl, stop_ratio, punct_ratio


def lang_id(text: str) -> str:
    """N-gram-free stopword-vote language ID with deterministic
    tie-break: CJK chars -> zh, else the LANG_PRIORITY language with the
    strictly highest stopword count ('und' = no votes at all)."""
    if _CJK_RE.search(text):
        return "zh"
    words = text.lower().split()
    best_lang, best = "und", 0
    for lang in LANG_PRIORITY:
        stops = set(STOPWORDS[lang])
        c = sum(w in stops for w in words)
        if c > best:
            best, best_lang = c, lang
    return best_lang


def fingerprint(text: str) -> str:
    """Document fingerprint: min MD5 over 5-word shingles of the
    normalized text (a 1-permutation MinHash); whole-text MD5 when the
    text has fewer than 5 words. Near-identical documents that share
    any extremal shingle collide."""
    norm = normalize_basic(text)
    words = norm.split()
    if len(words) < SHINGLE_WORDS:
        return hashlib.md5(norm.encode("utf-8")).hexdigest()
    best = None
    for i in range(len(words) - SHINGLE_WORDS + 1):
        h = hashlib.md5(" ".join(words[i : i + SHINGLE_WORDS]).encode("utf-8")).hexdigest()
        if best is None or h < best:
            best = h
    return best


def textstats_batch(texts) -> pd.DataFrame:
    """One pass producing every per-document stat column."""
    n = len(texts)
    out = {
        "norm_text": np.empty(n, dtype=object),
        "n_ws_tokens": np.empty(n, dtype=np.int64),
        "n_pretokens": np.empty(n, dtype=np.int64),
        "n_chars": np.empty(n, dtype=np.int64),
        "n_words": np.empty(n, dtype=np.int64),
        "mean_word_len": np.empty(n, dtype=np.float64),
        "stopword_ratio": np.empty(n, dtype=np.float64),
        "punct_ratio": np.empty(n, dtype=np.float64),
        "lang_pred": np.empty(n, dtype=object),
        "fingerprint": np.empty(n, dtype=object),
    }
    for i, t in enumerate(texts):
        t = t if isinstance(t, str) else ""
        out["norm_text"][i] = normalize_basic(t)
        ws, bpe = token_counts(t)
        out["n_ws_tokens"][i], out["n_pretokens"][i] = ws, bpe
        nc, nw, mwl, sr, pr = quality_metrics(t)
        out["n_chars"][i], out["n_words"][i] = nc, nw
        out["mean_word_len"][i], out["stopword_ratio"][i], out["punct_ratio"][i] = mwl, sr, pr
        out["lang_pred"][i] = lang_id(t)
        out["fingerprint"][i] = fingerprint(t)
    return pd.DataFrame(out)
