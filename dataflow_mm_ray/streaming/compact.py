"""Committed-stream compaction — the small-files maintenance job.

At 10^12-turn scale the epoch sink accumulates one parquet file per
(stream, epoch, shard); a month of 5-minute epochs is ~10^5 small
files per stream, which makes every downstream ``read_parquet`` pay
file-open overhead and bloats manifest scans. ``compact_stream``
rewrites the committed tail into few large files WITHOUT touching the
exactly-once protocol:

- **Epoch manifests are never modified or deleted.** The engine's
  replay no-op check (``is_committed``) and resume validation keep
  working unchanged; a re-run over a compacted out_dir is still a
  no-op.
- A single **compaction pointer** (``manifests/<stream>/compaction.json``)
  is the only new commit point: it lists ordered *segments*, each
  covering epochs ``(prev.upto_epoch, upto_epoch]`` with the compacted
  files that replace those epochs' data files. Readers take segment
  files for covered epochs and per-epoch manifest files above the
  highest covered epoch.
- **Crash-safe in both directions**: compacted files are staged +
  fsync'd to deterministic paths before the pointer is atomically
  ``os.replace``d (a crash before the swap leaves stray staging files
  that no reader observes; a retried run overwrites the same paths).
  Old per-epoch data files are deleted only AFTER the swap — a crash
  between swap and cleanup leaves orphan data files that no manifest
  path resolution ever returns, and the next compaction sweeps them.
- **Row-identical**: within a segment, input files are concatenated in
  committed order (epoch asc, manifest file order), and segments are
  ordered — ``read_committed`` returns the byte-identical frame before
  and after compaction (pytest-pinned).
- **Distributed**: each output file is written by one Ray task that
  reads only its input slice; the driver handles manifest JSON and the
  pointer swap, never rows.
- **One compactor per stream at a time** (like any OPTIMIZE job): safe
  next to an appending engine, but two concurrent compactions of the
  same stream may sweep each other's staged attempt. Run it as a
  single maintenance job (``jobs/compact_streams.py``).

The reference's step-cache analog rewrites a whole table per step
(dataflow/utils/storage.py:88-100); this is the streaming-sink
equivalent of a Delta/Iceberg OPTIMIZE over the epoch log.
"""
from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from dataflow_mm_ray.fsutil import fsync_dir, fsync_file_and_dir


def _compaction_path(out_dir: str, stream: str) -> str:
    return os.path.join(out_dir, "manifests", stream, "compaction.json")


def read_compaction(out_dir: str, stream: str) -> dict:
    p = _compaction_path(out_dir, stream)
    if not os.path.exists(p):
        return {"stream": stream, "segments": []}
    with open(p) as f:
        return json.load(f)


@ray.remote
def _write_compacted(out_dir: str, rel_inputs: list[str], rel_out: str) -> int:
    """Concatenate the input files (in order) into one staged parquet;
    idempotent-by-overwrite on the deterministic output path."""
    tables = [pq.read_table(os.path.join(out_dir, r)) for r in rel_inputs]
    merged = pa.concat_tables(tables, promote_options="default")
    path = os.path.join(out_dir, rel_out)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(merged, path)
    fsync_file_and_dir(path)
    return merged.num_rows


def compact_stream(
    out_dir: str,
    stream: str,
    target_rows: int = 4_000_000,
    min_input_files: int = 2,
    protect_consumers: bool = True,
) -> dict:
    """Compact every committed-but-uncovered epoch of one stream.

    Returns a summary dict (``compacted=False`` when there was nothing
    worth rewriting). Safe to run concurrently with an appending
    engine: only epochs whose manifests exist at call time are covered.

    With ``protect_consumers`` (default), epochs a registered consumer
    group (streaming/consumer.py) has not yet committed past are left
    uncompacted — the retention-vs-lag rule that keeps ``poll()``
    servable epoch-by-epoch for every live group. Disable only when
    lagging groups are abandoned (they then get the explicit
    ``PositionCompactedError`` + reset path).
    """
    from dataflow_mm_ray.streaming.sink import EpochSink

    sink = EpochSink(out_dir, [stream])
    comp = read_compaction(out_dir, stream)
    covered = comp["segments"][-1]["upto_epoch"] if comp["segments"] else -1

    epochs = [e for e in sink.committed_epochs(stream) if e > covered]
    # contiguous prefix only: the engine commits epochs in order, but a
    # foreign writer could leave a gap — covering past one would
    # permanently hide the gap epoch's data from every reader once its
    # manifest lands (segment files replace ALL epochs <= upto_epoch)
    contiguous: list[int] = []
    want = covered + 1
    for e in epochs:
        if e != want:
            break
        contiguous.append(e)
        want += 1
    epochs = contiguous
    if protect_consumers:
        from dataflow_mm_ray.streaming.consumer import consumer_positions

        positions = consumer_positions(out_dir, stream)
        if positions:
            min_needed = min(positions.values())  # lowest next-epoch
            epochs = [e for e in epochs if e < min_needed]
    if not epochs:
        return {"stream": stream, "compacted": False, "reason": "no uncovered epochs"}

    # per-file (path, ~rows) straight from the manifests — the plan
    # never opens a data file on the driver. Manifests carry per-epoch
    # row counts; files within an epoch are assumed even (they are
    # shard outputs), which only affects grouping granularity.
    plan: list[tuple[list[str], int]] = []  # (rel files of one epoch, rows)
    for e in epochs:
        with open(sink._manifest_path(stream, e)) as f:
            m = json.load(f)
        plan.append((list(m["files"]), int(m["rows"])))
    n_inputs = sum(len(fs) for fs, _ in plan)
    if n_inputs < min_input_files:
        return {"stream": stream, "compacted": False, "reason": "too few input files"}

    # group files (in committed order — epoch asc, manifest file order)
    # into output files of ~target_rows; a segment may split one
    # epoch's files across outputs, which readers handle because
    # committed_files concatenates segment files in order
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0.0
    for files, rows in plan:
        per_file = rows / len(files) if files else 0.0
        for rel in files:
            cur.append(rel)
            cur_rows += per_file
            if cur_rows >= target_rows:
                groups.append(cur)
                cur, cur_rows = [], 0.0
    if cur:
        groups.append(cur)
    groups = [g for g in groups if g]

    gen = comp["segments"][-1]["gen"] + 1 if comp["segments"] else 0
    rel_outs = [
        os.path.join("staging", stream, f"compact-gen{gen}", f"part-{i:05d}.parquet")
        for i in range(len(groups))
    ]
    rows_per_out = ray.get(
        [_write_compacted.remote(out_dir, g, ro) for g, ro in zip(groups, rel_outs)]
    )

    # the one commit point: fsync'd pointer JSON + atomic replace
    comp["segments"].append(
        {
            "gen": gen,
            "upto_epoch": max(epochs),
            "files": rel_outs,
            "rows": int(sum(rows_per_out)),
        }
    )
    p = _compaction_path(out_dir, stream)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(comp, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)
    fsync_dir(os.path.dirname(p))

    # post-commit cleanup: the covered epochs' data files are
    # unreachable now; deletion is idempotent (missing_ok) and a crash
    # here just leaves orphans for the next run's sweep
    removed = 0
    for files, _ in plan:
        for rel in files:
            try:
                os.remove(os.path.join(out_dir, rel))
                removed += 1
            except FileNotFoundError:
                pass
    _sweep_orphans(out_dir, stream, comp)
    return {
        "stream": stream,
        "compacted": True,
        "gen": gen,
        "input_files": n_inputs,
        "output_files": len(rel_outs),
        "rows": int(sum(rows_per_out)),
        "upto_epoch": max(epochs),
        "removed_files": removed,
    }


def _sweep_orphans(out_dir: str, stream: str, comp: dict) -> None:
    """Remove staged compact-gen dirs that no committed segment
    references (crashed attempts / superseded generations)."""
    live = {f for seg in comp["segments"] for f in seg["files"]}
    live_dirs = {os.path.dirname(f) for f in live}
    stage_root = os.path.join(out_dir, "staging", stream)
    if not os.path.isdir(stage_root):
        return
    for name in os.listdir(stage_root):
        if not name.startswith("compact-gen"):
            continue
        rel_dir = os.path.join("staging", stream, name)
        if rel_dir in live_dirs:
            continue
        full = os.path.join(stage_root, name)
        for part in os.listdir(full):
            try:
                os.remove(os.path.join(full, part))
            except FileNotFoundError:
                pass
        try:
            os.rmdir(full)
        except OSError:
            pass


def compact_all(out_dir: str, streams: list[str] | None = None,
                target_rows: int = 4_000_000) -> dict[str, dict]:
    """Compact every (or the given) stream of an engine out_dir."""
    if streams is None:
        mroot = os.path.join(out_dir, "manifests")
        streams = sorted(os.listdir(mroot)) if os.path.isdir(mroot) else []
    return {s: compact_stream(out_dir, s, target_rows=target_rows) for s in streams}
