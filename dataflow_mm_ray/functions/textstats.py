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


# word -> langs voting for it (stop lists can overlap across languages)
_STOP_SETS = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
_STOP_VOTES: dict[str, tuple[str, ...]] = {}
for _lang in LANG_PRIORITY:
    for _w in STOPWORDS[_lang]:
        _STOP_VOTES[_w] = _STOP_VOTES.get(_w, ()) + (_lang,)


def textstats_batch(texts) -> pd.DataFrame:
    """One fused pass producing every per-document stat column.

    Bit-identical to calling token_counts / quality_metrics / lang_id /
    fingerprint per row (pinned by the text_stats SQL oracle and
    tests), but each document is lowered/split/normalized ONCE, the
    punctuation count is one C-level str.translate instead of a
    per-char generator, stopword votes for all four languages come from
    one pass over the words, and the fingerprint min-compares raw
    digests (hex only once at the end). Measured ~2x on the sf0.1
    corpus — this was the slowest stateless map in BENCH_r02."""
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
    md5 = hashlib.md5
    votes_get = _STOP_VOTES.get
    fp_ids: list[int] = []
    fp_norms: list[str] = []
    fp_words: list[list[str]] = []
    for i, t in enumerate(texts):
        t = t if isinstance(t, str) else ""
        norm = normalize_basic(t)
        out["norm_text"][i] = norm
        lwords = t.lower().split()
        nw = len(lwords)
        out["n_ws_tokens"][i] = nw  # == len(t.split()): lowering never changes splits
        out["n_pretokens"][i] = len(_TOKEN_RE.findall(t))
        nc = len(t)
        out["n_chars"][i] = nc
        out["n_words"][i] = nw
        out["mean_word_len"][i] = (sum(map(len, lwords)) / nw) if nw else 0.0
        counts = {"en": 0, "de": 0, "fr": 0, "es": 0}
        for w in lwords:
            for lang in votes_get(w, ()):
                counts[lang] += 1
        out["stopword_ratio"][i] = (counts["en"] / nw) if nw else 0.0
        out["punct_ratio"][i] = ((nc - len(t.translate(_PUNCT_TABLE))) / nc) if nc else 0.0
        if _CJK_RE.search(t):
            out["lang_pred"][i] = "zh"
        else:
            best_lang, best = "und", 0
            for lang in LANG_PRIORITY:
                if counts[lang] > best:
                    best, best_lang = counts[lang], lang
            out["lang_pred"][i] = best_lang
        nwords = norm.split()
        if len(nwords) < SHINGLE_WORDS:
            out["fingerprint"][i] = md5(norm.encode("utf-8")).hexdigest()
        else:
            fp_ids.append(i)
            fp_norms.append(norm)
            fp_words.append(nwords)
    _fingerprint_fill(out["fingerprint"], fp_ids, fp_norms, fp_words)
    return pd.DataFrame(out)


def _fingerprint_fill(dst: np.ndarray, ids: list[int], norms: list[str],
                      words: list[list[str]]) -> None:
    """min-MD5-over-5-word-windows for the >=5-word docs of one batch.

    The windows are SUBSTRINGS of the normalized text (single-space
    joined), so they are sliced from per-word offset arrays instead of
    re-joined, and the 50-odd digests per document run through one
    vectorized DuckDB ``min(md5(w)) GROUP BY doc`` — ~2x over the
    per-window hashlib loop, byte-identical output (DuckDB md5 == RFC
    md5). Falls back to hashlib if DuckDB is unavailable."""
    if not ids:
        return
    try:
        import duckdb
    except ImportError:  # pragma: no cover - duckdb is a baked-in dep
        for i, nw in zip(ids, words):
            dst[i] = min(
                hashlib.md5(" ".join(nw[j : j + SHINGLE_WORDS]).encode("utf-8")).digest()
                for j in range(len(nw) - SHINGLE_WORDS + 1)
            ).hex()
        return
    win_ids, wins = [], []
    for i, norm, nw in zip(ids, norms, words):
        lens = np.fromiter(map(len, nw), dtype=np.int64, count=len(nw))
        starts = np.zeros(len(nw), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=starts[1:])
        ends = starts + lens
        k = len(nw) - SHINGLE_WORDS + 1
        win_ids.extend([i] * k)
        wins.extend(norm[starts[j] : ends[j + SHINGLE_WORDS - 1]] for j in range(k))
    df = pd.DataFrame({"i": np.asarray(win_ids, dtype=np.int64), "w": wins})
    res = duckdb.execute("SELECT i, min(md5(w)) AS f FROM df GROUP BY i").df()
    for i, f in zip(res["i"].to_numpy(), res["f"].to_numpy()):
        dst[i] = f
