"""Exactly-once two-phase-commit Parquet sink.

Protocol (per output stream, per epoch):

1. **Stage**: tasks write ``staging/<stream>/epoch=<N>/part-*.parquet``.
   Staging writes are idempotent-by-overwrite: a retried epoch rewrites
   the same deterministic paths.
2. **Commit**: the driver writes a manifest JSON listing the staged
   files + row count + the epoch watermark to a temp path and
   ``os.replace``s it to ``manifests/<stream>/epoch-<N>.json`` (atomic
   on POSIX). An epoch is visible iff its manifest exists.
3. **Idempotence**: re-running a committed epoch is a no-op
   (``is_committed`` short-circuits before any staging write), so
   crash-between-commit-and-checkpoint replays cannot duplicate rows.

Readers (``read_committed``) union exactly the manifest-listed files —
stray staging files from a crashed attempt are never observed.

The reference's closest notion is per-step cache-file materialization
(``dataflow/utils/storage.py:88-100``); the epoch manifest replaces the
"whole table per step" file with per-partition, per-epoch commits.
"""
from __future__ import annotations

import json
import os
from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from dataflow_mm_ray.fsutil import fsync_dir, fsync_file_and_dir


class EpochSink:
    def __init__(self, out_dir: str, streams: Iterable[str]):
        self.out_dir = out_dir
        self.streams = list(streams)
        for s in self.streams:
            os.makedirs(os.path.join(out_dir, "staging", s), exist_ok=True)
            os.makedirs(os.path.join(out_dir, "manifests", s), exist_ok=True)

    # -- commit protocol ---------------------------------------------------
    def _manifest_path(self, stream: str, epoch: int) -> str:
        return os.path.join(self.out_dir, "manifests", stream, f"epoch-{epoch}.json")

    def is_committed(self, stream: str, epoch: int) -> bool:
        return os.path.exists(self._manifest_path(stream, epoch))

    def _commit_manifest(self, stream: str, epoch: int, files: list[str], rows: int,
                         watermark_us: int):
        """The single commit point: fsync'd manifest JSON + atomic
        os.replace. Callers must have made the listed data files
        durable first (fsutil.fsync_file_and_dir) — the manifest must
        never outlive the data it references."""
        manifest = {
            "stream": stream,
            "epoch": epoch,
            "files": list(files),
            "rows": int(rows),
            "watermark_us": int(watermark_us),
        }
        tmp = self._manifest_path(stream, epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path(stream, epoch))
        fsync_dir(os.path.dirname(self._manifest_path(stream, epoch)))

    def stage_and_commit(self, stream: str, epoch: int, df: pd.DataFrame, watermark_us: int):
        """Write one epoch of one stream and commit it atomically.
        No-op if the epoch is already committed."""
        if self.is_committed(stream, epoch):
            return
        stage_dir = os.path.join(self.out_dir, "staging", stream, f"epoch={epoch}")
        os.makedirs(stage_dir, exist_ok=True)
        files = []
        if len(df):
            path = os.path.join(stage_dir, "part-00000.parquet")
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
            fsync_file_and_dir(path)
            files.append(os.path.relpath(path, self.out_dir))
        self._commit_manifest(stream, epoch, files, len(df), watermark_us)

    def commit_files(self, stream: str, epoch: int, files: list[str], rows: int,
                     watermark_us: int):
        """Commit a manifest over files ALREADY staged (and fsync'd) by
        workers/shards (distributed staging — the driver never touches
        the rows). No-op if the epoch is committed."""
        if self.is_committed(stream, epoch):
            return
        self._commit_manifest(stream, epoch, files, rows, watermark_us)

    # -- readers -----------------------------------------------------------
    def committed_epochs(self, stream: str) -> list[int]:
        d = os.path.join(self.out_dir, "manifests", stream)
        out = []
        for name in os.listdir(d):
            if name.startswith("epoch-") and name.endswith(".json"):
                out.append(int(name[len("epoch-") : -len(".json")]))
        return sorted(out)

    def committed_files(self, stream: str) -> list[str]:
        """Absolute paths of every committed file, commit order.

        Epochs covered by the compaction pointer (streaming/compact.py)
        resolve to their compacted segment files; epochs above the
        highest covered epoch resolve through their own manifests —
        same rows, same order, fewer files."""
        out = []
        covered = -1
        comp_path = os.path.join(self.out_dir, "manifests", stream, "compaction.json")
        if os.path.exists(comp_path):
            with open(comp_path) as f:
                comp = json.load(f)
            for seg in comp["segments"]:
                out.extend(os.path.join(self.out_dir, rel) for rel in seg["files"])
                covered = seg["upto_epoch"]
        for epoch in self.committed_epochs(stream):
            if epoch <= covered:
                continue
            with open(self._manifest_path(stream, epoch)) as f:
                manifest = json.load(f)
            out.extend(os.path.join(self.out_dir, rel) for rel in manifest["files"])
        return out

    def committed_rows(self, stream: str) -> int:
        """Exact committed row count from the manifests alone — O(#epochs)
        driver work, no data-file reads. The scale path for soak/ops
        summaries (a full readback of a 10^9-row stream to count it is
        the driver-collect anti-pattern). Per-epoch manifests survive
        compaction (only covered *data* files are deleted), so the sum
        is exact in every compaction state."""
        total = 0
        for epoch in self.committed_epochs(stream):
            with open(self._manifest_path(stream, epoch)) as f:
                total += json.load(f)["rows"]
        return total

    def read_committed(self, stream: str) -> pd.DataFrame:
        """Union of manifest-listed files only (never stray staging).

        Driver-side pandas — a test/verification convenience for small
        results; scale consumers use ``read_committed_ds``."""
        frames = [pq.read_table(p).to_pandas() for p in self.committed_files(stream)]
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    def read_committed_ds(self, stream: str):
        """The scale reader: a lazy ``ray.data.Dataset`` over exactly
        the manifest-listed files — committed rows stream through
        downstream stages without ever landing on the driver. Returns
        None when no epoch has committed any file yet."""
        import ray.data as rd

        files = self.committed_files(stream)
        if not files:
            return None
        # partitioning=None: the staging layout's epoch=N directory is
        # a sink implementation detail — hive inference would add an
        # `epoch` column to uncompacted epochs that pq.read_table
        # (read_committed) and compacted segment files never have,
        # making the Dataset schema depend on compaction state
        return rd.read_parquet(files, partitioning=None)
