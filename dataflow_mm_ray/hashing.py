"""Deterministic, process-stable hashing utilities.

Python's builtin ``hash`` is salted per process and must never be used
for partitioning. Everything here is stable across processes, runs and
machines so that shuffles, checkpoints and resumed runs agree.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def stable_hash_array(values) -> np.ndarray:
    """Deterministic uint64 hash of a 1-D array-like (str / int / ...).

    Uses pandas' SipHash-based ``hash_array`` with its fixed default
    key, so the result is identical in every worker process — safe for
    hash partitioning and salting.
    """
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        arr = np.asarray(arr, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def partition_ids(values, num_partitions: int) -> np.ndarray:
    """Stable partition id in [0, num_partitions) per value."""
    return (stable_hash_array(values) % np.uint64(num_partitions)).astype(np.int32)


def sha1_hex_array(texts) -> np.ndarray:
    """Vectorized-ish SHA1 hex digest per text (content fingerprints).

    SHA1 is used as an exact-duplicate content key (not for security).
    Matches DuckDB/SQL ``md5``-family determinism requirements: the
    digest depends only on the UTF-8 bytes of the text.
    """
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        out[i] = hashlib.sha1(str(t).encode("utf-8")).hexdigest()
    return out


def md5_hex_array(texts) -> np.ndarray:
    """MD5 hex digest per text — matches DuckDB's ``md5()`` exactly."""
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        out[i] = hashlib.md5(str(t).encode("utf-8")).hexdigest()
    return out
