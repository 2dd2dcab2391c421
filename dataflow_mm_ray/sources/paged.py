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
- ``read_page`` prunes directories at the read (never scans other
  tasks), orders deterministically by ``raw_data_id`` and slices the
  requested page from row-group metadata WITHOUT decoding other pages;
- ``write_task`` writes a new task partition with the system columns,
  one file per block (resumable, never one giant file).

Deterministic order note: the reference relies on ClickHouse's
implicit ordering (no ORDER BY in its page query — a known paging
hazard); here the order is explicit and stable (``raw_data_id``).
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
        return rd.read_parquet(files)
    offset = max(0, (page_num - 1)) * page_size
    # row-count prefix-sum over file metadata: only the files overlapping
    # [offset, offset+page_size) are opened for decode
    take_files, skip_head, remaining = [], 0, page_size
    seen = 0
    for f in files:
        n = pq.read_metadata(f).num_rows
        if seen + n <= offset:
            seen += n
            continue
        if remaining <= 0:
            break
        head = max(0, offset - seen)
        take = min(n - head, remaining)
        take_files.append((f, head, take))
        remaining -= take
        seen += n
    if not take_files:
        return rd.from_pandas(pd.DataFrame())

    frames = []
    for f, head, take in take_files:
        t = pq.read_table(f)
        frames.append(t.slice(head, take).to_pandas())
    page = pd.concat(frames, ignore_index=True)
    return rd.from_pandas(page)


def write_task(ds, root: str, pipeline_id: str, task_id: str,
               raw_id_col: str | None = None):
    """Write a Dataset as a new task partition with the reference's
    system columns (storage.py:406-432): ``raw_data_id`` from
    ``raw_id_col`` (or a stable per-partition sequence) and the
    ``min_hashes`` near-dup hook column (default ``[0]``,
    storage.py:289-291). Files are written per block by the map tasks
    themselves (distributed, resumable)."""
    d = task_dir(root, pipeline_id, task_id)
    os.makedirs(d, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dataflow_mm_ray.hashing import stable_hash_array

        b = b.copy(deep=False)
        b["pipeline_id"] = pipeline_id
        b["task_id"] = task_id
        if raw_id_col is not None:
            b["raw_data_id"] = b[raw_id_col].to_numpy().astype(np.int64)
        elif "raw_data_id" not in b.columns:
            b["raw_data_id"] = np.arange(len(b), dtype=np.int64)
        b["min_hashes"] = [[0]] * len(b)  # storage.py:289-291 hook default
        if len(b):
            token = int(stable_hash_array(
                b["raw_data_id"].to_numpy()[:1].astype(np.int64))[0]) % (1 << 31)
        else:
            token = 0
        f = os.path.join(d, f"part-{token:08x}-{len(b)}.parquet")
        tmp = f + f".tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(b, preserve_index=False), tmp)
        os.replace(tmp, f)
        return pd.DataFrame({"file": [f], "rows": [len(b)]})

    return ds.map_batches(write_block, batch_format="pandas", batch_size=65536)
