"""Durability helpers for the exactly-once commit protocol.

The 2PC sink's atomicity comes from fsync'd manifest JSON +
``os.replace``; that is only a guarantee if the DATA files a manifest
references are durable *before* the manifest is. These helpers fsync a
written file and its containing directory (the directory entry is what
makes a new file survive a crash on POSIX filesystems) — used by every
staging write (sink, shard-staged parquet, state snapshots).
"""
from __future__ import annotations

import os


def fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def fsync_file_and_dir(path: str) -> None:
    fsync_file(path)
    fsync_dir(os.path.dirname(path))
