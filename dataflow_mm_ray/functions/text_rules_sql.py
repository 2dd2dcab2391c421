"""DuckDB SQL expression of the 15-rule text filter (text_rules.py) so
the whole filter is oracle-checkable. The SQL mirrors the Python kernel
rule for rule; both sides are tested against each other on adversarial
fixtures in tests/test_text_rules.py.

NFD normalization (rule 15) is omitted on the SQL side — it cannot
affect the ASCII substring 'javascript'.
"""
from __future__ import annotations

# whitespace set matching Python str.strip()/rstrip()/lstrip()
_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
# ASCII punctuation, exactly string.punctuation, as an RE2 class
_PUNCT_CLASS = r"[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]"

_ID_PATTERN = (
    r"(身\s{0,10}份|id\s{0,10}number\s{0,10}|identification|identity|"
    r"\s{0,10}ID\s{0,10}No\s{0,10}|id\s{0,10}card\s{0,10}|NRIC\s{0,10}number\s{0,10}|"
    r"IC\s{0,10}number\s{0,10}|resident\s{0,10}registration\s{0,10}|"
    r"I.D.\s{0,10}Number\s{0,10})"
)
_SPECIAL_PATTERN = (
    r"u200e|&#247;|\? :|[�□]|\{/U\}|"
    r"U\+26[0-F][0-D]|U\+273[3-4]|U\+1F[3-6][0-4][0-F]|U\+1F6[8-F][0-F]"
)
_HTML_PATTERN = r"[&＆](nbsp|lt|gt|amp|quot|apos|hellip|ndash|mdash|lsquo|rsquo|ldquo|rdquo)"

_BULLETS = "('•','‣','▶','◀','◦','■','□','▪','▫','–')"


def rule_filter_sql(source: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """SQL producing (id_col, r_* x16, keep) for every row of ``source``."""
    ws = _WS
    return f"""
WITH _base AS (
  SELECT {id_col}, {text_col} AS t FROM {source}
), _feat AS (
  SELECT {id_col}, t,
    list_filter(regexp_split_to_array(t, '\\s+'), w -> w <> '') AS words,
    list_filter(string_split(t, chr(10)), x -> trim(x, {ws}) <> '') AS lines,
    list_filter(regexp_split_to_array(lower(t), '\\s+'), w -> w <> '') AS lwords,
    length(t) AS n_chars
  FROM _base
), _agg AS (
  SELECT {id_col}, t, n_chars,
    length(words) AS n_words,
    length(lines) AS n_lines,
    list_sum(list_transform(words, w -> length(w))) AS sum_word_len,
    length(list_filter(lines, x -> ends_with(rtrim(x, {ws}), '...')
                                   OR ends_with(rtrim(x, {ws}), '…'))) AS n_ellipsis,
    length(list_filter(lines, x -> substr(ltrim(x, {ws}), 1, 1) IN {_BULLETS})) AS n_bullet,
    length(list_filter(words, w -> w = upper(w) AND w <> lower(w))) AS n_caps,
    length(list_distinct(lwords)) AS n_unique,
    length(lwords) AS n_lwords,
    (n_chars - length(replace(t, '#', '')))
      + (n_chars - length(replace(t, '...', ''))) // 3
      + (n_chars - length(replace(t, '…', ''))) AS n_symbols,
    (n_chars - length(replace(t, '{{', ''))) + (n_chars - length(replace(t, '}}', ''))) AS n_curly,
    (length(lower(t)) - length(replace(lower(t), 'lorem ipsum', ''))) // 11 AS n_lorem,
    length(regexp_extract_all(t, '{_ID_PATTERN}', 0, 'i')) AS n_id,
    list_max(list_transform(regexp_split_to_array(t, '[–.!?,;•/|…\\n]'),
             s -> length(list_filter(regexp_split_to_array(s, '\\s+'), w -> w <> '')))) AS max_sent_words,
    list_filter(list_transform(lines,
        x -> trim(regexp_replace(lower(regexp_replace(x, '{_PUNCT_CLASS}', '', 'g')), '\\s+', ' ', 'g'), {ws})),
        x -> x <> '') AS nlines,
    (t IS NULL OR trim(t, {ws}) = '') AS r_empty
  FROM _feat
)
SELECT {id_col},
  r_empty,
  coalesce(NOT r_empty AND ends_with(t, ':'), FALSE) AS r_colon_end,
  coalesce(NOT r_empty AND n_lines > 0
           AND CAST(n_ellipsis AS DOUBLE) / n_lines >= 0.3, FALSE) AS r_ellipsis,
  coalesce(NOT r_empty AND n_words > 0
           AND (CAST(sum_word_len AS DOUBLE) / n_words < 3
                OR CAST(sum_word_len AS DOUBLE) / n_words >= 20), FALSE) AS r_mean_word_len,
  coalesce(NOT r_empty AND n_words > 0
           AND CAST(n_symbols AS DOUBLE) / n_words >= 0.4, FALSE) AS r_symbol_ratio,
  coalesce(NOT r_empty AND regexp_matches(t, '{_HTML_PATTERN}'), FALSE) AS r_html_entity,
  coalesce(NOT r_empty AND n_id >= 3, FALSE) AS r_id_card,
  coalesce(NOT r_empty AND max_sent_words > 112, FALSE) AS r_no_punct_run,
  coalesce(NOT r_empty AND regexp_matches(t, '{_SPECIAL_PATTERN}'), FALSE) AS r_special_chars,
  coalesce(NOT r_empty AND regexp_matches(t, 'Copyright|Watermark|Confidential'), FALSE) AS r_watermark,
  coalesce(NOT r_empty AND n_chars > 0
           AND CAST(n_curly AS DOUBLE) / n_chars >= 0.025, FALSE) AS r_curly_brackets,
  coalesce(NOT r_empty AND n_words > 0
           AND CAST(n_caps AS DOUBLE) / n_words > 0.2, FALSE) AS r_caps_ratio,
  coalesce(NOT r_empty AND n_chars > 0
           AND CAST(n_lorem AS DOUBLE) / n_chars > 3e-8, FALSE) AS r_lorem_ipsum,
  coalesce(NOT r_empty AND n_lwords > 0
           AND CAST(n_unique AS DOUBLE) / n_lwords <= 0.1, FALSE) AS r_unique_words,
  coalesce(NOT r_empty AND n_lines > 0
           AND CAST(n_bullet AS DOUBLE) / n_lines > 0.9, FALSE) AS r_bulletpoints,
  coalesce(NOT r_empty AND length(nlines) > 0
           AND NOT (length(nlines) <= 3
                    OR length(nlines) - length(list_filter(nlines, x -> contains(x, 'javascript'))) >= 3),
           FALSE) AS r_javascript,
  NOT (r_empty OR r_colon_end OR r_ellipsis OR r_mean_word_len OR r_symbol_ratio
       OR r_html_entity OR r_id_card OR r_no_punct_run OR r_special_chars
       OR r_watermark OR r_curly_brackets OR r_caps_ratio OR r_lorem_ipsum
       OR r_unique_words OR r_bulletpoints OR r_javascript) AS keep
FROM _agg
"""
