"""The engine's query registry: name -> (Ray pipeline, DuckDB oracle).

Each entry is one operator/pipeline from SURVEY.md §2 re-expressed
Ray-Data-first, with (where SQL-expressible) an ANSI-SQL oracle that
DuckDB runs over the same parquet tables. Column names and dtypes match
between the two sides; float-sensitive outputs are integer (``*_us``)
or explicitly rounded identically on both sides.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE, transcripts_from_events


class Query(NamedTuple):
    fn: Callable[[str], Any]
    sql: str | None  # DuckDB oracle (None -> rows-only check)


_REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = Query(fn, sql)
        return fn

    return deco


def registry() -> dict[str, Query]:
    # import for side-effect registration
    import dataflow_mm_ray.queries_cep  # noqa: F401
    import dataflow_mm_ray.queries_text  # noqa: F401
    import dataflow_mm_ray.queries_dedup  # noqa: F401
    import dataflow_mm_ray.queries_ops  # noqa: F401
    import dataflow_mm_ray.queries_nli  # noqa: F401

    return dict(_REGISTRY)
