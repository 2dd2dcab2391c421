"""Zero-shot NLI filter queries (sensitive / complexity / consistency).

Each query runs the actor-pool filter from ``stages/nli.py`` over the
documents table with the deterministic stub NLI backend, and carries a
bit-exact DuckDB oracle generated from the SAME label/template constants
(the stub score is the first 32 md5 bits of ``premise || chr(31) ||
hypothesis`` over 2^32 — exact in float64 on both sides).
"""
from __future__ import annotations

from dataflow_mm_ray.queries import register
from dataflow_mm_ray.sources.tables import read_table
from dataflow_mm_ray.stages.nli import (
    COMPLEXITY_CAPS,
    COMPLEXITY_TEMPLATE,
    SENSITIVE_LABELS,
)

# Python str.strip() whitespace set, for SQL trim() parity.
_WS = " " + "".join(chr(c) for c in (9, 10, 13, 11, 12))


def _sql_score(premise_expr: str, hypothesis: str) -> str:
    """SQL twin of stages.nli.stub_entail_u32 for a constant hypothesis."""
    hyp = hypothesis.replace("'", "''")
    return f"('0x'||substr(md5({premise_expr} || chr(31) || '{hyp}'),1,8))::BIGINT"


_SENSITIVE_MAX = "greatest(" + ", ".join(
    _sql_score("text", hyp) for hyp in SENSITIVE_LABELS.values()
) + ")"

_SENSITIVE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         CASE WHEN text IS NULL OR length(trim(text, '{_WS}')) = 0
              THEN 0 ELSE {_SENSITIVE_MAX} END AS max_risk_u32
  FROM documents
)
SELECT doc_id, max_risk_u32 FROM scored
WHERE source IS NOT NULL AND length(source) > 0
  AND max_risk_u32 / 4294967296.0 < 0.5
"""


@register("nli_sensitive_filter", _SENSITIVE_SQL)
def q_nli_sensitive(sf_dir: str):
    """ImageSensitiveFilter (image_sensitive_filter.py:13-131): six risk
    hypotheses x each text column, unsafe iff any max score >= 0.5 or the
    media path is missing. ``source`` stands in for the image path."""
    from dataflow_mm_ray.stages.nli import SensitiveFilter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    kept = docs.map_batches(
        SensitiveFilter,
        fn_constructor_kwargs={"text_keys": ["text"], "image_key": "source"},
        batch_format="pandas",
        concurrency=(1, 2),
        batch_size=4096,
    )
    return kept.map_batches(lambda b: b[["doc_id", "max_risk_u32"]], batch_format="pandas")


_CAPS_TERMS = " + ".join(
    "(CASE WHEN elig AND "
    + _sql_score("text", COMPLEXITY_TEMPLATE.format(cap))
    + " >= (0.4 * 4294967296.0) THEN 1 ELSE 0 END)"
    for cap in COMPLEXITY_CAPS
)

_COMPLEXITY_SQL = f"""
WITH s AS (
  SELECT doc_id, text,
         coalesce(length(trim(text, '{_WS}')) >= 5, FALSE) AS elig
  FROM documents
)
SELECT doc_id, CAST({_CAPS_TERMS} AS BIGINT) AS caps_detected
FROM s WHERE ({_CAPS_TERMS}) >= 2
"""


@register("nli_complexity_filter", _COMPLEXITY_SQL)
def q_nli_complexity(sf_dir: str):
    """ImageComplexityFilter (image_complexity_filter.py:10-105): count
    capability hypotheses entailed at >= 0.4; keep iff >= min_k=2."""
    from dataflow_mm_ray.stages.nli import ComplexityFilter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    kept = docs.map_batches(
        ComplexityFilter,
        fn_constructor_kwargs={"caption_key": "text"},
        batch_format="pandas",
        concurrency=(1, 2),
        batch_size=4096,
    )
    return kept.map_batches(lambda b: b[["doc_id", "caps_detected"]], batch_format="pandas")


from dataflow_mm_ray.stages.nli import (  # noqa: E402
    CAT_ACTION_HYPOTHESIS,
    CAT_CAPS_HYPOTHESES,
    CAT_OCR_ONLY_HYPOTHESIS,
)

# stripped-caption premise (ImageCatFilter._entail_prob strips, 105-109)
_CAT_PREM = f"trim(text, '{_WS}')"

_CAT_CAPS_TERMS = " + ".join(
    "(CASE WHEN elig AND "
    + _sql_score("cap", hyp)
    + " >= (0.4 * 4294967296.0) THEN 1 ELSE 0 END)"
    for hyp in CAT_CAPS_HYPOTHESES
)

_CAT_NLI_SQL = f"""
WITH s AS (
  SELECT doc_id, {_CAT_PREM} AS cap,
         regexp_extract_all(lower(text), '[a-z'']+') AS cap_toks,
         regexp_extract_all(lower(substr(text, 1, 40)), '[a-z'']+') AS ocr_toks
  FROM documents
  WHERE text IS NOT NULL AND length({_CAT_PREM}) > 0
), g AS (
  SELECT doc_id, cap, length(cap) >= 5 AS elig,
         len(list_distinct(ocr_toks)) AS n_ocr,
         len(list_intersect(list_distinct(ocr_toks), list_distinct(cap_toks))) AS n_inter,
         len(list_distinct(ocr_toks || cap_toks)) AS n_union
  FROM s
), sc AS (
  SELECT doc_id, n_ocr, n_inter, n_union,
         CAST({_CAT_CAPS_TERMS} AS BIGINT) AS caps_detected,
         {_sql_score("cap", CAT_ACTION_HYPOTHESIS)} AS action_u32,
         {_sql_score("cap", CAT_OCR_ONLY_HYPOTHESIS)} AS ocr_nli_u32
  FROM g
)
SELECT doc_id, caps_detected FROM sc
WHERE caps_detected >= 2
  AND action_u32 >= (0.4 * 4294967296.0)
  AND NOT (n_ocr > 0 AND n_inter * 1.0 / n_union >= 0.2
           AND ocr_nli_u32 >= (0.6 * 4294967296.0))
"""


@register("nli_cat_filter", _CAT_NLI_SQL)
def q_nli_cat_filter(sf_dir: str):
    """ImageCatFilter (image_cat_filter.py:105-171): the fourth NLI rule
    — >= min_caps of five capability hypotheses entailed at >= 0.4, the
    action hypothesis at >= 0.4, and not OCR-only (token Jaccard >= 0.2
    combined with the OCR-only hypothesis at >= 0.6 drops the row). OCR
    text is the first-40-chars surrogate (same convention as
    cat_filter); NLI premises are the STRIPPED caption."""
    from dataflow_mm_ray.stages.nli import CatNLIFilter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_ocr(b):
        b = b.copy(deep=False)
        b["ocr_text"] = b["text"].astype(str).str.slice(0, 40)
        return b

    kept = docs.map_batches(add_ocr, batch_format="pandas").map_batches(
        CatNLIFilter,
        fn_constructor_kwargs={"caption_key": "text", "ocr_key": "ocr_text"},
        batch_format="pandas",
        concurrency=(1, 2),
        batch_size=4096,
    )
    return kept.map_batches(lambda b: b[["doc_id", "caps_detected"]], batch_format="pandas")


_QUESTION = "What does this text describe?"

_CONSISTENCY_SQL = f"""
WITH qa AS (
  SELECT doc_id, text, 'ans-' || md5(text) AS answer FROM documents
), scored AS (
  SELECT doc_id,
         CASE WHEN length(trim(answer, '{_WS}')) = 0 THEN 0 ELSE
           ('0x'||substr(md5(trim(text, '{_WS}') || ' ' || '{_QUESTION}'
                             || chr(31) || trim(answer, '{_WS}')),1,8))::BIGINT
         END AS entail_u32
  FROM qa
)
SELECT doc_id, entail_u32 FROM scored
WHERE entail_u32 / 4294967296.0 >= 0.35
"""


@register("nli_consistency_filter", _CONSISTENCY_SQL)
def q_nli_consistency(sf_dir: str):
    """ImageConsistencyFilter (image_consistency_filter.py:10-102)
    composed after PromptedQAGenerator: premise = caption + question,
    hypothesis = the generated answer; keep iff entailment >= 0.35."""
    from dataflow_mm_ray.serving import prompted_qa
    from dataflow_mm_ray.stages.nli import ConsistencyFilter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    prompts = docs.map_batches(
        lambda b: b.rename_columns(["doc_id", "prompt"]), batch_format="pyarrow"
    )
    answered = prompted_qa(prompts, concurrency=(1, 2), batch_size=4096)

    def add_question(b):
        b = b.copy(deep=False)
        b["caption"] = b["prompt"]
        b["question"] = _QUESTION
        return b

    kept = answered.map_batches(add_question, batch_format="pandas").map_batches(
        ConsistencyFilter,
        fn_constructor_kwargs={
            "caption_key": "caption",
            "question_key": "question",
            "answer_key": "answer",
        },
        batch_format="pandas",
        concurrency=(1, 2),
        batch_size=4096,
    )
    return kept.map_batches(lambda b: b[["doc_id", "entail_u32"]], batch_format="pandas")
