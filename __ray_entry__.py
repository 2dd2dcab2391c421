"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in dataflow_mm_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``      — flagship pipeline on /root/testdata/sf0.001.
- ``queries()``    — name -> callable(sf_dir) for every implemented
  operator/pipeline (SURVEY.md §2 inventory).
- ``oracle_sql()`` — matching DuckDB SQL per query where the semantics
  are SQL-expressible (others get the driver's rows-only check).
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: windowed agg + stateful tool join + rule filtering over
    the sf0.001 transcript stream, returned as one correlation table."""
    from dataflow_mm_ray.pipelines.flagship import flagship_pipeline

    return flagship_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from dataflow_mm_ray.queries import registry

    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    from dataflow_mm_ray.queries import registry

    return {name: q.sql for name, q in registry().items() if q.sql is not None}
