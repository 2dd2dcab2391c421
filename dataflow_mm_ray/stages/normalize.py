"""Text normalization stage — reference ``TextNormalizer``
(``dataflow/operators/core_audio/refine/audio_text_normalizer.py:19-160``):
mode-dispatched normalizers (whisper English / Chinese cn_tn / basic)
with an optional punctuation strip.

Modes here:
- ``basic``        — lowercase + whitespace collapse
  (BasicTextNormalizer core), optional ASCII punctuation strip;
- ``english-lite`` — the old small contraction subset (kept for
  SQL-mirrorability);
- ``english``      — whisper EnglishTextNormalizer algorithm
  (functions/en_text_norm.py: fillers, bracketed asides, the full
  replacer table, numeric-aware symbol stripping; number-words and the
  spelling json are documented out of scope);
- ``zh``           — the reference cn_tn TextNorm pipeline
  (functions/cn_text_norm.py, differential-pinned against the
  reference module in tests/test_cn_norm.py); kwargs forward the
  TextNorm options (to_banjiao, remove_fillers, remove_erhua, ...).

Stateless map_batches; normalizers are module-level compiled regexes.
"""
from __future__ import annotations

import re
import string

import pandas as pd

from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE

_WS_RE = re.compile(r"\s+")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)
_BRACKETS_RE = re.compile(r"[<\[\(][^>\]\)]*[>\]\)]")
_CONTRACTIONS = [
    (re.compile(r"\bwon't\b"), "will not"),
    (re.compile(r"\bcan't\b"), "cannot"),
    (re.compile(r"\bn't\b"), " not"),
    (re.compile(r"\b(\w+)'re\b"), r"\1 are"),
    (re.compile(r"\b(\w+)'ll\b"), r"\1 will"),
    (re.compile(r"\b(\w+)'ve\b"), r"\1 have"),
    (re.compile(r"\bi'm\b"), "i am"),
    (re.compile(r"\bit's\b"), "it is"),
]


def normalize_text(text: str, mode: str = "basic", remove_punct: bool = True, **kwargs) -> str:
    # None/NaN -> "" (the reference's clean_punctuations rule,
    # audio_text_normalizer.py:14-17), never the string "None"/"nan"
    if text is None or (isinstance(text, float) and text != text):
        t = ""
    else:
        t = str(text)
    if mode == "english":
        from dataflow_mm_ray.functions.en_text_norm import en_text_norm

        return en_text_norm(t)
    if mode == "zh":
        from dataflow_mm_ray.functions.cn_text_norm import cn_text_norm

        return cn_text_norm(t, **kwargs)
    if mode == "english-lite":
        t = t.lower()
        t = _BRACKETS_RE.sub(" ", t)
        for pat, rep in _CONTRACTIONS:
            t = pat.sub(rep, t)
        t = t.translate(_PUNCT_TABLE)
    elif mode == "basic":
        t = t.lower()
        if remove_punct:
            t = t.translate(_PUNCT_TABLE)
    else:
        raise ValueError(f"unknown normalizer mode {mode!r}")
    return _WS_RE.sub(" ", t.strip())


def text_normalize(ds, text_col: str = "text", out_col: str = "norm_text",
                   mode: str = "basic", remove_punct: bool = True, **kwargs):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch[out_col] = [normalize_text(t, mode, remove_punct, **kwargs) for t in batch[text_col]]
        return batch

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)
