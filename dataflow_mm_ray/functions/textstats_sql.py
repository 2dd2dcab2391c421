"""DuckDB oracle for the textstats kernel (functions/textstats.py).

Whitespace caveat: the kernel follows the reference's Python semantics
(``\\s``/str.split are Unicode-aware), while RE2's ``\\s`` here is
ASCII — the two diverge only on text containing non-ASCII whitespace
(absent from the synthetic corpus). The ngram dedup path, whose keep
decisions must hold on ANY input, instead tokenizes ASCII-only on both
sides (stages/neardup.shingle_sets_batch)."""
from __future__ import annotations

from dataflow_mm_ray.functions.textstats import LANG_PRIORITY, STOPWORDS

_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
_PUNCT_CLASS = r"[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]"
_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _inlist(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def textstats_sql(source: str = "documents", id_col: str = "doc_id", text_col: str = "text", round_to: int = 6) -> str:
    ws = _WS
    lang_counts = ",\n    ".join(
        f"length(list_filter(lwords, w -> w IN {_inlist(STOPWORDS[lang])})) AS c_{lang}"
        for lang in LANG_PRIORITY
    )
    # first language in priority order achieving the strictly-positive max
    best = "CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'und' " + " ".join(
        f"WHEN c_{lang} = greatest(c_en, c_de, c_fr, c_es) THEN '{lang}'" for lang in LANG_PRIORITY
    ) + " END"
    return f"""
WITH _base AS (
  SELECT {id_col}, {text_col} AS t FROM {source}
), _feat AS (
  SELECT {id_col}, t,
    regexp_replace(trim(lower(regexp_replace(t, '{_PUNCT_CLASS}', '', 'g')), {ws}), '\\s+', ' ', 'g') AS norm_text,
    list_filter(regexp_split_to_array(lower(t), '\\s+'), w -> w <> '') AS lwords,
    length(t) AS n_chars
  FROM _base
), _agg AS (
  SELECT {id_col}, t, norm_text, lwords, n_chars,
    list_filter(regexp_split_to_array(norm_text, ' '), w -> w <> '') AS nwords,
    {lang_counts}
  FROM _feat
)
SELECT {id_col},
  norm_text,
  length(lwords) AS n_ws_tokens,
  length(regexp_extract_all(t, '{_TOKEN_PATTERN}')) AS n_pretokens,
  n_chars,
  length(lwords) AS n_words,
  CASE WHEN length(lwords) = 0 THEN 0.0
       ELSE round(CAST(list_sum(list_transform(lwords, w -> length(w))) AS DOUBLE) / length(lwords), {round_to})
  END AS mean_word_len,
  CASE WHEN length(lwords) = 0 THEN 0.0
       ELSE round(CAST(length(list_filter(lwords, w -> w IN {_inlist(STOPWORDS['en'])})) AS DOUBLE)
                  / length(lwords), {round_to})
  END AS stopword_ratio,
  CASE WHEN n_chars = 0 THEN 0.0
       ELSE round(CAST(n_chars - length(regexp_replace(t, '{_PUNCT_CLASS}', '', 'g')) AS DOUBLE) / n_chars, {round_to})
  END AS punct_ratio,
  CASE WHEN regexp_matches(t, '[一-鿿]') THEN 'zh' ELSE {best} END AS lang_pred,
  CASE WHEN length(nwords) < 5 THEN md5(norm_text)
       ELSE list_aggregate(
              list_transform(range(length(nwords) - 4),
                i -> md5(nwords[i+1] || ' ' || nwords[i+2] || ' ' || nwords[i+3] || ' ' || nwords[i+4] || ' ' || nwords[i+5])),
              'min')
  END AS fingerprint
FROM _agg
"""
