"""Paged keyed storage (the MyScale/ClickHouse storage semantics over
parquet).

Reference: ``dataflow/utils/storage.py:293-432`` (``MyScaleDBStorage``)
pages a (pipeline_id, task_id)-scoped record set with ``page_size`` /
``page_num`` (``LIMIT page_size OFFSET (page_num-1)*page_size`` —
line 366; ``page_size=None`` disables paging) and writes records back
under a new ``task_id`` with system columns ``(pipeline_id, task_id,
raw_data_id, min_hashes, data)``.

Re-expressed over partitioned parquet (no DB in this environment, and
a database round-trip per operator step is the reference's
scale-killer anyway):

- a "table" is a directory of parquet files partitioned by
  ``pipeline_id/task_id`` (``root/pipeline=<id>/task=<id>/*.parquet``);
- ``read_page`` orders rows DETERMINISTICALLY by (file name, row
  position) and slices the requested page, decoding only the row
  groups that overlap it. Like the reference's page query (which has
  NO ORDER BY — a documented ClickHouse paging hazard), the order is
  stable-but-arbitrary, NOT raw_data_id order; what the engine
  guarantees is that pages partition the task's rows and that reruns
  page identically.
- ``write_task`` writes a new task partition with the system columns,
  one file per block named by the block's CONTENT DIGEST — distinct
  blocks can never overwrite each other, and a rerun rewrites the same
  bytes to the same names (idempotent). Byte-identical duplicate
  blocks would coalesce into one file; pass a globally unique
  ``raw_id_col`` (recommended) to make every block's content distinct.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

SYS_COLS = ["pipeline_id", "task_id", "raw_data_id", "min_hashes"]


def task_dir(root: str, pipeline_id: str, task_id: str) -> str:
    return os.path.join(root, f"pipeline={pipeline_id}", f"task={task_id}")


def read_page(root: str, pipeline_id: str, task_id: str,
              page_size: int | None = 10_000, page_num: int = 0):
    """Read one page of a task's records as a Ray Dataset.

    ``page_num`` follows the reference's 1-based arithmetic
    (``OFFSET (page_num-1)*page_size``, storage.py:366, with page 0
    clamping to offset 0); ``page_size=None`` reads everything."""
    import pyarrow.parquet as pq
    import ray.data as rd

    d = task_dir(root, pipeline_id, task_id)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no task partition at {d}")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    if page_size is None:
        # rows-aware split (CLAUDE.md: never a single-task read_parquet)
        total = sum(pq.read_metadata(f).num_rows for f in files)
        nb = max(len(files), total // 32768) or 1
        return rd.read_parquet(files, override_num_blocks=nb)
    offset = max(0, (page_num - 1)) * page_size

    frames = []
    seen = 0
    remaining = page_size
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        n = md.num_rows
        if seen + n <= offset or remaining <= 0:
            seen += n
            continue
        # row-group pruning: decode only the groups overlapping
        # [offset, offset + page_size)
        rg_start = seen
        for rg in range(md.num_row_groups):
            rg_n = md.row_group(rg).num_rows
            rg_lo, rg_hi = rg_start, rg_start + rg_n
            want_lo = max(rg_lo, offset)
            want_hi = min(rg_hi, offset + page_size)
            if want_lo < want_hi:
                t = pf.read_row_group(rg)
                frames.append(t.slice(want_lo - rg_lo, want_hi - want_lo).to_pandas())
                remaining -= want_hi - want_lo
            rg_start = rg_hi
        seen += n
    if not frames:
        # schema-preserving empty page: zero rows of the task's schema
        if files:
            return rd.from_arrow(pq.ParquetFile(files[0]).schema_arrow.empty_table())
        return rd.from_pandas(pd.DataFrame())
    return rd.from_pandas(pd.concat(frames, ignore_index=True))


def write_task(ds, root: str, pipeline_id: str, task_id: str,
               raw_id_col: str | None = None):
    """Write a Dataset as a new task partition with the reference's
    system columns (storage.py:406-432): ``raw_data_id`` from
    ``raw_id_col`` (or a per-block sequence — pass ``raw_id_col`` for
    globally unique ids) and the ``min_hashes`` near-dup hook column
    (default ``[0]``, storage.py:289-291). Files are written per block
    by the map tasks themselves (distributed, resumable), named by the
    block's content digest so distinct blocks can never collide."""
    d = task_dir(root, pipeline_id, task_id)
    os.makedirs(d, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        b = b.copy(deep=False)
        b["pipeline_id"] = pipeline_id
        b["task_id"] = task_id
        if raw_id_col is not None:
            ids = b[raw_id_col].to_numpy()
            # integer ids canonicalize to int64; any other key type
            # (string/UUID) is stored as-is — a float->int cast would
            # silently truncate distinct ids together
            b["raw_data_id"] = ids.astype(np.int64) if ids.dtype.kind in "iu" else ids
        elif "raw_data_id" not in b.columns:
            b["raw_data_id"] = np.arange(len(b), dtype=np.int64)
        b["min_hashes"] = [[0]] * len(b)  # storage.py:289-291 hook default
        t = pa.Table.from_pandas(b, preserve_index=False)
        h = hashlib.md5()
        for col in t.columns:
            for chunk in col.chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        h.update(buf)
        token = h.hexdigest()[:16]
        f = os.path.join(d, f"part-{token}-{len(b)}.parquet")
        tmp = f + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, f)
        return pd.DataFrame({"file": [f], "rows": [len(b)]})

    return ds.map_batches(write_block, batch_format="pandas", batch_size=65536)
