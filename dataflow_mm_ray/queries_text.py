"""Text-analysis queries over the documents table: the reference's
rule filter plus training-data text analytics, each with a full DuckDB
oracle."""
from __future__ import annotations

from dataflow_mm_ray.functions.text_rules_sql import rule_filter_sql
from dataflow_mm_ray.functions.textstats_sql import textstats_sql
from dataflow_mm_ray.queries import register
from dataflow_mm_ray.sources.tables import read_table
from dataflow_mm_ray.stages.text_analysis import rule_filter_flags, rule_filter_kept, text_stats


def _documents(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"])


@register("rule_filter", rule_filter_sql(source="documents"))
def q_rule_filter(sf_dir: str):
    """Reference RuleBaseFilter's 15 text rules, non-destructive flags
    (rule bodies: dataflow/operators/core_vision/filter/rule_base_filter.py:243-354)."""
    return rule_filter_flags(_documents(sf_dir))


@register(
    "rule_filter_kept",
    "WITH _flags AS (" + rule_filter_sql(source="documents") + ") "
    "SELECT d.doc_id, d.text FROM documents d JOIN _flags f ON d.doc_id = f.doc_id WHERE f.keep",
)
def q_rule_filter_kept(sf_dir: str):
    """Destructive RuleBaseFilter (drops failing rows, rule_base_filter.py:420-424)."""
    return rule_filter_kept(_documents(sf_dir))


@register("text_stats", textstats_sql(source="documents"))
def q_text_stats(sf_dir: str):
    """Normalization + token counts + quality metrics + language ID +
    fingerprint in one vectorized pass (reference analogs: text
    normalizer audio_text_normalizer.py:145-160; quality heuristics
    rule_base_filter.py helpers; IDF corpus stats utils.py:161-181)."""
    return text_stats(_documents(sf_dir))


# ---------------------------------------------------------------------------
# full RuleBaseFilter: 15 text rules + image basic checks + NSFW threshold

_WS = " " + "".join(chr(c) for c in (9, 10, 13, 11, 12))  # Python str.strip set


def _img_u32(tag: str) -> str:
    """SQL twin of stages.nsfw._u32 over the synthetic image key ``k``."""
    return f"('0x'||substr(md5(k || chr(31) || '{tag}'),1,8))::BIGINT"


def _rule_filter_full_sql() -> str:
    from dataflow_mm_ray.stages.nsfw import (
        ALLOWED_FORMATS,
        IMAGE_KEY_SQL,
        STUB_FORMATS,
        STUB_MISSING_MOD,
    )

    fmts = ", ".join(f"'{f}'" for f in STUB_FORMATS)
    allowed = ", ".join(f"'{f}'" for f in ALLOWED_FORMATS)
    return f"""
WITH _flags AS ({rule_filter_sql(source="documents")}),
_img AS (
  SELECT doc_id, text, {IMAGE_KEY_SQL} AS k FROM documents
), _meta AS (
  SELECT doc_id, text, k,
    ({_img_u32("exists")} % {STUB_MISSING_MOD}) <> 0 AS exists_ok,
    1 + ({_img_u32("w")} % 20000) AS width,
    1 + ({_img_u32("h")} % 20000) AS height,
    ([{fmts}])[1 + ({_img_u32("fmt")} % {len(STUB_FORMATS)})] AS img_format,
    {_img_u32("nsfw")} AS nsfw_u32
  FROM _img
)
SELECT m.doc_id, m.width, m.height, m.img_format, m.nsfw_u32
FROM _meta m JOIN _flags f ON m.doc_id = f.doc_id
WHERE (m.text IS NULL OR length(trim(m.text, '{_WS}')) = 0 OR f.keep)
  AND m.exists_ok
  AND m.img_format IN ({allowed})
  AND m.width BETWEEN 16 AND 8192 AND m.height BETWEEN 16 AND 8192
  AND (CAST(m.width AS DOUBLE) / m.height) BETWEEN 0.001 AND 1000.0
  AND NOT (m.nsfw_u32 / 4294967296.0 > 0.5)
"""


@register("rule_filter_full", _rule_filter_full_sql())
def q_rule_filter_full(sf_dir: str):
    """COMPLETE RuleBaseFilter: the 15 text rules composed with the
    image half (_check_image_basic rule_base_filter.py:204-222,
    _check_nsfw_content :225-241, composition :357-378) over the md5
    stub probe/classifier. Image key is the synthetic per-row path
    source || '/' || doc_id || '.img'."""
    from dataflow_mm_ray.stages.nsfw import add_image_key, rule_base_full

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    keyed = docs.map_batches(add_image_key, batch_format="pandas")
    return rule_base_full(keyed)


# ---------------------------------------------------------------------------
# declarative pipeline runner chain (pipelines/runner.py)

_CHAIN_MAX_PUNCT = 0.35


def _pipeline_chain_sql() -> str:
    return (
        "WITH _flags AS (" + rule_filter_sql(source="documents") + "), "
        "_kept AS (SELECT d.doc_id, d.text FROM documents d "
        "JOIN _flags f ON d.doc_id = f.doc_id WHERE f.keep), "
        "_stats AS (" + textstats_sql(source="_kept") + ") "
        f'SELECT *, punct_ratio <= {_CHAIN_MAX_PUNCT} AS "select" FROM _stats'
    )


@register("pipeline_chain", _pipeline_chain_sql())
def q_pipeline_chain(sf_dir: str):
    """The declarative pipeline-runner lifecycle (pipelines/runner.py):
    registry-resolved op chain rule_base_filter -> text_stats ->
    score_filter as ONE lazy Dataset — the engine twin of the
    reference's pipeline scripts chaining op.run(storage) over per-step
    cache files (SURVEY §3.1; e.g. image_filter_aesthetic.py:10-77,
    storage.py:88-100). Composed oracle = each stage's SQL twin CTE'd
    in sequence."""
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline

    return run_pipeline(
        _documents(sf_dir),
        [
            Step("rule_base_filter"),
            Step("text_stats"),
            Step("score_filter", {"score_col": "punct_ratio",
                                  "max_score": _CHAIN_MAX_PUNCT}),
        ],
    )
