"""Parquet table sources with column pruning.

Mirrors the reference's ``FileStorage`` readers
(``dataflow/utils/storage.py:106-143``) but streaming: a table is a
lazy ``ray.data.Dataset`` of Arrow blocks, never a whole-table pandas
DataFrame on the driver.
"""
from __future__ import annotations

import os
from typing import Sequence

import ray.data as rd


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: Sequence[str] | None = None,
    **kwargs,
) -> "rd.Dataset":
    """Read one named parquet table, pruning to ``columns`` at the scan.

    Always pass ``columns`` in pipelines — at 100 TB a read that loads
    all columns for a 2-column transform is wrong.
    """
    return rd.read_parquet(table_path(sf_dir, name), columns=list(columns) if columns else None, **kwargs)
