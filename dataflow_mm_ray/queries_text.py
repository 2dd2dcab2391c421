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
