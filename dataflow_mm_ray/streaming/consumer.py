"""Incremental consumers over committed output streams — the
downstream half of the exactly-once contract (consumer groups over the
epoch log, the analog of a Kafka group offset / a Delta streaming
reader's reservoir version).

A :class:`StreamConsumer` tracks a durable *position* (the next epoch
to read) per ``(group, stream)`` under ``<out_dir>/consumers/``:

- ``poll()`` returns every committed-but-unconsumed epoch from the
  position upward (contiguous — it stops at the first gap, so an epoch
  is never observed before its predecessors) as a lazy
  ``ray.data.Dataset`` over exactly the manifest-listed files; rows
  never land on the driver.
- ``commit(upto)`` atomically advances the position (fsync + replace,
  same discipline as the sink's manifests).

Delivery contract: *at-least-once* by default — a crash between
``poll`` and ``commit`` re-polls the same epochs. End-to-end
exactly-once is the standard idempotent-writer composition: key the
downstream write by ``(group, stream, epoch range)`` and make it a
no-op when that range is already present (the engine's own 2PC sink is
such a writer), then ``commit``.

Compaction interop (streaming/compact.py): compacted segments drop
per-epoch file granularity, so a position that falls at-or-below the
compaction horizon can no longer be served epoch-by-epoch —
``poll`` raises :class:`PositionCompactedError` (Kafka's
offset-out-of-range). ``compact_stream(..., protect_consumers=True)``
(the default) never covers epochs a registered consumer group still
needs, so the error only occurs for groups created after the fact or
when protection is explicitly disabled; ``reset_to_horizon()`` plus a
full-prefix backfill read (``sink.read_committed_ds``) is the recovery
path.
"""
from __future__ import annotations

import json
import os

import pandas as pd

from dataflow_mm_ray.fsutil import fsync_dir
from dataflow_mm_ray.streaming.sink import EpochSink


class PositionCompactedError(RuntimeError):
    """The consumer's next epoch was compacted into a segment; the
    per-epoch files no longer exist. Recover with
    ``reset_to_horizon()`` (skip) or a full-prefix backfill read."""


def _covered_epoch(out_dir: str, stream: str) -> int:
    from dataflow_mm_ray.streaming.compact import read_compaction

    comp = read_compaction(out_dir, stream)
    return comp["segments"][-1]["upto_epoch"] if comp["segments"] else -1


def consumer_positions(out_dir: str, stream: str) -> dict[str, int]:
    """``{group: next_epoch}`` for every registered consumer group of
    one stream — what compaction's consumer protection reads."""
    root = os.path.join(out_dir, "consumers")
    out: dict[str, int] = {}
    if not os.path.isdir(root):
        return out
    for group in os.listdir(root):
        p = os.path.join(root, group, f"{stream}.json")
        if os.path.exists(p):
            with open(p) as f:
                out[group] = int(json.load(f)["next_epoch"])
    return out


class StreamConsumer:
    def __init__(self, out_dir: str, stream: str, group: str = "default"):
        self.out_dir = out_dir
        self.stream = stream
        self.group = group
        self.sink = EpochSink(out_dir, [stream])
        self._pos_dir = os.path.join(out_dir, "consumers", group)
        self._pos_path = os.path.join(self._pos_dir, f"{stream}.json")
        os.makedirs(self._pos_dir, exist_ok=True)
        if not os.path.exists(self._pos_path):
            # registering the group AT THE HORIZON would silently skip
            # compacted history; new groups start at 0 and either read
            # the uncompacted epochs or get the explicit compaction
            # error + reset choice
            self._write_position(0)

    # -- position ----------------------------------------------------------
    def position(self) -> int:
        """Next epoch this consumer will read."""
        with open(self._pos_path) as f:
            return int(json.load(f)["next_epoch"])

    def _write_position(self, next_epoch: int) -> None:
        tmp = self._pos_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stream": self.stream, "group": self.group,
                       "next_epoch": int(next_epoch)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pos_path)
        fsync_dir(self._pos_dir)

    def _advance(self, next_epoch: int) -> None:
        """Move THIS consumer's durable position forward. The single
        reader's position is the group file; ParallelConsumer overrides
        this to write its member file (and resync the group minimum) —
        ``commit``/``reset_to_horizon`` must go through this hook, or a
        member would advance the shared group position past the other
        members' minimum."""
        self._write_position(next_epoch)

    def commit(self, upto_epoch: int) -> None:
        """Durably mark epochs ``<= upto_epoch`` consumed. Monotone:
        committing behind the current position is a no-op (replays of a
        restarted processor can never move the group backwards)."""
        if upto_epoch + 1 > self.position():
            self._advance(upto_epoch + 1)

    def reset_to_horizon(self) -> int:
        """Skip past the compaction horizon (data loss is explicit:
        the skipped epochs are only available as the full compacted
        prefix). Returns the new position."""
        nxt = _covered_epoch(self.out_dir, self.stream) + 1
        if nxt > self.position():
            self._advance(nxt)
        return self.position()

    def backfill(self):
        """Recovery read for a position at-or-below the compaction
        horizon: ``(dataset, covered_epoch)`` — a lazy Dataset over the
        compacted segment files (all epochs ``<= covered_epoch``), or
        ``(None, -1)`` when nothing is compacted. After the downstream
        write of the backfill is durable, ``commit(covered_epoch)``
        moves past the horizon and ``poll()`` resumes epoch-by-epoch —
        the complete alternative to ``reset_to_horizon()`` (which skips
        the prefix instead of reading it).

        Delivery note: segments have no per-epoch boundaries, so a
        consumer that had already consumed part of the prefix re-reads
        those rows (at-least-once over the prefix; exact for a consumer
        at position 0 — key the downstream write by
        ``(group, stream, 'backfill', covered_epoch)`` to make the
        composition idempotent). Parallel members slice segment files
        like epochs: disjoint, union == the full prefix."""
        from dataflow_mm_ray.streaming.compact import read_compaction

        comp = read_compaction(self.out_dir, self.stream)
        if not comp["segments"]:
            return None, -1
        covered = comp["segments"][-1]["upto_epoch"]
        files = [os.path.join(self.out_dir, rel)
                 for seg in comp["segments"] for rel in seg["files"]]
        files = self._slice_files(files)
        if not files:
            return None, covered
        import ray.data as rd

        return rd.read_parquet(files, partitioning=None), covered

    def _slice_files(self, files: list[str]) -> list[str]:
        """Hook: which of an epoch's (or the backfill's) files this
        consumer reads. The single reader takes all; ParallelConsumer
        takes its member slice."""
        return files

    # -- reading -----------------------------------------------------------
    def _ready_epochs(self, max_epochs: int | None) -> list[int]:
        pos = self.position()
        covered = _covered_epoch(self.out_dir, self.stream)
        if covered >= pos:
            raise PositionCompactedError(
                f"consumer group {self.group!r} is at epoch {pos} but "
                f"compaction covers epochs <= {covered} of stream "
                f"{self.stream!r}; reset_to_horizon() or backfill from "
                "the compacted prefix (sink.read_committed_ds)"
            )
        ready: list[int] = []
        committed = self.sink.committed_epochs(self.stream)
        want = pos
        for e in committed:
            if e < want:
                continue
            if e != want:  # gap: never observe an epoch before its prefix
                break
            ready.append(e)
            want += 1
            if max_epochs is not None and len(ready) >= max_epochs:
                break
        return ready

    def poll(self, max_epochs: int | None = None):
        """``(epochs, dataset)``: the committed-but-unconsumed epochs
        (contiguous from the position) and a lazy Dataset over exactly
        their manifest-listed files — ``None`` when those epochs
        committed zero files (or nothing is ready). Does NOT advance
        the position; call ``commit(epochs[-1])`` after the downstream
        write is durable."""
        epochs = self._ready_epochs(max_epochs)
        files: list[str] = []
        for e in epochs:
            with open(self.sink._manifest_path(self.stream, e)) as f:
                m = json.load(f)
            files.extend(self._slice_files(
                [os.path.join(self.out_dir, rel) for rel in m["files"]]))
        if not files:
            return epochs, None
        import ray.data as rd

        # partitioning=None: the staging layout's epoch=N directory is
        # a sink implementation detail — hive inference would add an
        # `epoch` column that read_committed (pq.read_table) never has
        return epochs, rd.read_parquet(files, partitioning=None)

    def poll_pandas(self, max_epochs: int | None = None):
        """Driver-side convenience for small streams/tests: same
        epochs, rows as one pandas frame (empty frame when none)."""
        epochs, ds = self.poll(max_epochs)
        if ds is None:
            return epochs, pd.DataFrame()
        return epochs, ds.to_pandas()


class ParallelConsumer(StreamConsumer):
    """One member of an N-way parallel consumer group over the same
    epoch log (the analog of N Kafka consumers in one group): members
    share the epoch sequence, and each epoch's manifest-listed files
    are deterministically assigned ``file_index % n_members == member``
    — disjoint by construction, union == the full stream. Each member
    advances its OWN durable position (restart-safe per member, same
    at-least-once poll/commit contract as the single reader); the GROUP
    position — what compaction's consumer protection and single-reader
    tools observe — is synced to the minimum across members on every
    member commit, so the group can never lose unread files to
    compaction because one member is behind.

    Members must agree on ``n_members``: a member file from a different
    cardinality refuses loudly (resharding a live group would silently
    re-slice files)."""

    def __init__(self, out_dir: str, stream: str, group: str = "default",
                 member: int = 0, n_members: int = 1):
        if not (0 <= member < n_members):
            raise ValueError(f"member must be in [0, {n_members}); got {member}")
        super().__init__(out_dir, stream, group=group)
        self.member = int(member)
        self.n_members = int(n_members)
        prefix = f"{stream}.member"
        for name in os.listdir(self._pos_dir):
            if (name.startswith(prefix) and name.endswith(".json")
                    and "of" in name
                    and not name.endswith(f"of{n_members}.json")):
                raise ValueError(
                    f"consumer group {group!r} has member file {name} with a "
                    f"different cardinality than n_members={n_members} — "
                    "drain and delete the old member files before resharding"
                )
        self._member_path = os.path.join(
            self._pos_dir, f"{stream}.member{member}of{n_members}.json")
        if not os.path.exists(self._member_path):
            self._write_member(super().position())

    def _write_member(self, next_epoch: int) -> None:
        tmp = self._member_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stream": self.stream, "group": self.group,
                       "member": self.member, "n_members": self.n_members,
                       "next_epoch": int(next_epoch)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._member_path)
        fsync_dir(self._pos_dir)

    def position(self) -> int:
        with open(self._member_path) as f:
            return int(json.load(f)["next_epoch"])

    def _advance(self, next_epoch: int) -> None:
        # the member file is THIS consumer's position; the shared group
        # file only ever moves via the locked minimum-sync below
        self._write_member(next_epoch)
        self._sync_group_position()

    def commit(self, upto_epoch: int) -> None:
        if upto_epoch + 1 > self.position():
            self._advance(upto_epoch + 1)
        else:
            self._sync_group_position()

    def _sync_group_position(self) -> None:
        """Group position := min over member positions (a member that
        never registered holds the group at the shared position).

        The read-members -> min -> compare -> write sequence runs under
        an advisory file lock: without it two concurrently committing
        members can interleave so a stale (smaller) minimum is written
        AFTER a newer one, and the group position — which external
        tools treat as monotone — moves backwards."""
        import fcntl

        lock_path = os.path.join(self._pos_dir, f"{self.stream}.lock")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk.fileno(), fcntl.LOCK_EX)
            try:
                positions = []
                seen = set()
                suffix = f"of{self.n_members}.json"
                for name in os.listdir(self._pos_dir):
                    if (name.startswith(f"{self.stream}.member")
                            and name.endswith(suffix)):
                        with open(os.path.join(self._pos_dir, name)) as f:
                            rec = json.load(f)
                        positions.append(int(rec["next_epoch"]))
                        seen.add(int(rec["member"]))
                if len(seen) < self.n_members:
                    # an unregistered member is implicitly at the group
                    # position
                    return
                nxt = min(positions)
                with open(self._pos_path) as f:
                    cur = int(json.load(f)["next_epoch"])
                if nxt > cur:
                    self._write_position(nxt)
            finally:
                fcntl.flock(lk.fileno(), fcntl.LOCK_UN)

    def _slice_files(self, files: list[str]) -> list[str]:
        # epoch-local (and backfill-local) ``file_index % n_members``:
        # disjoint by construction, union == every file
        return [f for i, f in enumerate(files)
                if i % self.n_members == self.member]
