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


_READ_TASK_BYTES = 8 << 20  # target bytes of parquet per read task
_READ_TASK_ROWS = 32768  # target rows per read task (compression-proof)


def _default_num_blocks(path: str) -> int | None:
    """Split single-file reads across tasks: Ray otherwise decodes one
    file in ONE read task, serializing the whole pipeline behind a
    single-threaded parquet decode (measured 2.4x slowdown end-to-end).
    Target ~8 MiB of file OR ~32k rows per read task — whichever gives
    more tasks — capped at 4x cluster CPUs. The rows floor matters for
    highly-compressible text: a 1M-doc corpus of near-duplicates packs
    into a 19 MiB file, and the byte heuristic alone handed a 130 s
    fused read+annotate to ONE task (measured; 30 tasks -> 7 s)."""
    import ray

    try:
        size = os.path.getsize(path)
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        return None
    by_rows = 0
    try:
        import pyarrow.parquet as pq

        by_rows = pq.read_metadata(path).num_rows // _READ_TASK_ROWS
    except Exception:
        pass
    nb = max(1, min(max(size // _READ_TASK_BYTES, by_rows), ncpu * 4))
    return int(nb) if nb > 1 else None


def read_parquet_split(path: str, columns: Sequence[str] | None = None, **kwargs):
    """Generic parquet read with the single-file split applied — every
    parquet read in the engine should go through here or read_table
    (CLAUDE.md convention: never a single-task read_parquet)."""
    if "override_num_blocks" not in kwargs and os.path.isfile(path):
        nb = _default_num_blocks(path)
        if nb:
            kwargs["override_num_blocks"] = nb
    return rd.read_parquet(path, columns=list(columns) if columns else None, **kwargs)


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
    path = table_path(sf_dir, name)
    if "override_num_blocks" not in kwargs:
        nb = _default_num_blocks(path)
        if nb:
            kwargs["override_num_blocks"] = nb
    return rd.read_parquet(path, columns=list(columns) if columns else None, **kwargs)
