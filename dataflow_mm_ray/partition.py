"""Keyed hash-partitioned execution — the engine's one shuffle idiom.

Every keyed stage (windows, sessions, stateful joins, first-wins dedup,
conversation re-assembly) needs *all rows of a key co-located and in a
known order*. ``partition_map`` implements a classic two-stage map-side
shuffle with raw Ray tasks:

1. **split** — one task per input block splits it into P sub-frames by
   ``stable_hash(key) % P`` (SipHash, process-stable — hashing.py) and
   returns them as P separate objects (``num_returns=P``), so a reduce
   task only ever fetches its own shard of each block;
2. **reduce** — one task per partition concatenates its B pieces,
   optionally sorts (stable mergesort: ties keep input order), and
   applies the caller's *vectorized* pandas kernel to the whole
   partition (thousands of keys per call — never a Python call per
   key).

Why not ``Dataset.groupby(...).map_groups``: measured on this Ray
version it costs 12-20s for a 100k-row shuffle (per-group slicing
overhead in ``_apply_udf_to_groups``; the HASH_SHUFFLE strategy spawns
a fleet of aggregator actors), vs <2s for this exchange. This is the
one documented drop to raw Ray tasks, and it is the same exchange
topology Ray Data's own shuffle uses: B*P small objects through the
object store, spilling as needed — on a cluster each reduce pulls only
its own shards across the network.

Scale knobs: ``num_partitions`` must satisfy (input bytes / P) < worker
heap; hot keys are pre-combined upstream (window partials) or salted by
the caller.

The result is a regular lazy ``ray.data.Dataset`` (from pandas refs),
so downstream stages keep streaming.
"""
from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
import ray
import ray.data as rd

from dataflow_mm_ray.hashing import partition_ids
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

# Auto-sizing target: ~1M transcript-ish rows (~100-300 MB pandas) per
# reduce partition. Floor = cluster CPUs so every core owns a reduce
# task; cap only as a runaway guard (at the cap, partitions grow with
# the input instead — the caller should then pass num_partitions).
TARGET_ROWS_PER_PARTITION = 1_000_000
MAX_AUTO_PARTITIONS = 65536


def resolve_num_partitions(num_partitions: int, n_rows: int | None = None) -> int:
    """Resolve the P=0 "auto" sentinel (schema.DEFAULT_NUM_PARTITIONS).

    P must satisfy two opposing constraints: (input rows / P) fits one
    worker's heap (pushes P up with data size), and B*P split objects
    stay cheap (pushes P down at small scale — measured 4.5x on a fixed
    P=64 vs P=CPUs at 100k rows). Auto = max(cluster CPUs,
    rows/TARGET_ROWS_PER_PARTITION when the input size is known).
    ``GRAFT_NUM_PARTITIONS`` overrides for experiments.
    """
    if num_partitions:
        return num_partitions
    import os

    env = os.environ.get("GRAFT_NUM_PARTITIONS")
    if env:
        return max(1, int(env))
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8)) or 8
    p = cpus
    if n_rows:
        p = max(p, -(-n_rows // TARGET_ROWS_PER_PARTITION))
    return min(p, MAX_AUTO_PARTITIONS)


def _split_block(block, key: str, num_partitions: int):
    # blocks arrive as zero-copy Arrow tables and are split AS Arrow:
    # one C++ take + P zero-copy slices. The sub-tables travel through
    # the object store as raw Arrow buffers (no per-string pickling —
    # measured a large chunk of the exchange cost on string-heavy
    # transcript blocks); the single pandas conversion happens at the
    # reduce. pandas inputs (map_batches upstreams) keep the frame path.
    import numpy as np

    if isinstance(block, pd.DataFrame):
        df = block
        if len(df) == 0:
            parts = [df] * num_partitions
        else:
            pid = partition_ids(df[key].to_numpy(), num_partitions)
            # stable sort by partition id, then contiguous slices —
            # much cheaper than num_partitions boolean-mask copies, and
            # keeps the original row order within each partition
            order = np.argsort(pid, kind="stable")
            sdf = df.iloc[order]
            bounds = np.searchsorted(pid[order], np.arange(num_partitions + 1))
            parts = [sdf.iloc[bounds[p] : bounds[p + 1]] for p in range(num_partitions)]
    else:
        import pyarrow as pa

        # strip the pandas schema metadata: blocks that round-tripped
        # through Ray's pandas->Arrow conversion can carry dtype strings
        # (e.g. "numpy.ndarray(shape=..)" for object ndarray columns)
        # that pyarrow's metadata-driven to_pandas cannot parse
        if hasattr(block, "replace_schema_metadata"):
            block = block.replace_schema_metadata(None)
        if block.num_rows == 0:
            parts = [block] * num_partitions
        else:
            pid = partition_ids(block.column(key).to_numpy(zero_copy_only=False),
                                num_partitions)
            order = np.argsort(pid, kind="stable")
            stbl = block.take(pa.array(order))
            bounds = np.searchsorted(pid[order], np.arange(num_partitions + 1))
            parts = [
                stbl.slice(bounds[p], bounds[p + 1] - bounds[p])
                for p in range(num_partitions)
            ]
    if num_partitions == 1:
        return parts[0]
    return tuple(parts)


def _pieces_to_frames(pieces) -> list[pd.DataFrame]:
    """Non-empty pieces as pandas frames, order preserved; consecutive
    Arrow sub-tables are concatenated at the Arrow level first so the
    (usual) all-Arrow case pays ONE to_pandas."""
    import pyarrow as pa

    frames: list[pd.DataFrame] = []
    run: list = []

    def flush():
        if run:
            t = run[0] if len(run) == 1 else pa.concat_tables(run)
            frames.append(t.to_pandas())
            run.clear()

    for p in pieces:
        if isinstance(p, pd.DataFrame):
            flush()
            if len(p):
                frames.append(p)
        elif p.num_rows:
            run.append(p)
    flush()
    return frames


def _reduce_partition(fn, sort_by, *pieces) -> pd.DataFrame:
    frames = _pieces_to_frames(pieces)
    if not frames:
        # empty partition (fewer distinct keys than P): still run fn on
        # a correctly-columned empty frame so every output block has
        # fn's schema — a column-less block would KeyError downstream
        # kernels and break Dataset schema unification. Scan for a piece
        # that CARRIES a schema: Ray's map_batches emits column-less
        # blocks for empty input blocks, so pieces[0] alone isn't
        # trustworthy.
        empty = pd.DataFrame()
        for p in pieces:
            pdf = p if isinstance(p, pd.DataFrame) else p.to_pandas()
            if len(pdf.columns):
                empty = pdf.iloc[:0]
                break
        return fn(empty.reset_index(drop=True))
    df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0].reset_index(drop=True)
    if sort_by:
        df = df.sort_values(list(sort_by), kind="mergesort")
    return fn(df)


def _reduce_partition_arrow(fn, *pieces):
    """Arrow-table reduce: pieces stay Arrow end-to-end (concat + the
    caller's Table->Table kernel) — no pandas block is ever built, so
    string-heavy outputs avoid Python-object materialization entirely."""
    import pyarrow as pa

    tables = []
    for p in pieces:
        if isinstance(p, pd.DataFrame):
            tables.append(pa.Table.from_pandas(p, preserve_index=False))
        elif p.num_rows or not tables:
            tables.append(p)
    t = tables[0] if len(tables) == 1 else pa.concat_tables(
        [t for t in tables if t.num_rows] or tables[:1]
    )
    return fn(t)


# Tree-merge guard: above this many upstream blocks, each reducer's
# pieces are coalesced in waves of COALESCE_FANIN before the final
# reduce. Bounds per-task fan-in (a reduce over 1e5 blocks would take
# 1e5 args) and lets chunk refs die as soon as their merge consumes
# them — without it, B blocks x P partitions at 100-TB scale
# (B~1e5, P~1e4) parks 1e9 live ObjectRefs on the driver for the
# whole reduce wave.
COALESCE_THRESHOLD = 256
COALESCE_FANIN = 64


def _merge_pieces(*pieces) -> pd.DataFrame:
    """Order-preserving pandas coalesce of one reducer's chunk."""
    frames = _pieces_to_frames(pieces)
    if not frames:
        # prefer a schema-bearing piece (map_batches emits column-less
        # blocks for empty inputs — see _reduce_partition)
        empty = pd.DataFrame()
        for p in pieces:
            pdf = p if isinstance(p, pd.DataFrame) else p.to_pandas()
            if len(pdf.columns):
                empty = pdf.iloc[:0]
                break
        return empty
    return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]


def _merge_pieces_arrow(*pieces):
    import pyarrow as pa

    tables = [
        pa.Table.from_pandas(p, preserve_index=False) if isinstance(p, pd.DataFrame) else p
        for p in pieces
    ]
    nonempty = [t for t in tables if t.num_rows]
    return pa.concat_tables(nonempty or tables[:1])


def _assemble(split_pieces, fn, sort_by, num_partitions: int,
              arrow_output: bool = False):
    if sort_by and arrow_output:
        # the Arrow reduce has no sort step; silently dropping sort_by
        # would hand the caller unsorted partitions
        raise ValueError("sort_by is not supported with arrow_output=True")
    reduce = ray.remote(_reduce_partition_arrow if arrow_output else _reduce_partition)
    if num_partitions == 1:
        split_pieces = [[p] for p in split_pieces]
    while len(split_pieces) > COALESCE_THRESHOLD:
        merge = ray.remote(_merge_pieces_arrow if arrow_output else _merge_pieces)
        split_pieces = [
            [
                merge.remote(*[
                    split_pieces[b][p]
                    for b in range(lo, min(lo + COALESCE_FANIN, len(split_pieces)))
                ])
                for p in range(num_partitions)
            ]
            for lo in range(0, len(split_pieces), COALESCE_FANIN)
        ]
    if arrow_output:
        out_refs = [
            reduce.remote(fn, *[split_pieces[b][p] for b in range(len(split_pieces))])
            for p in range(num_partitions)
        ]
        return rd.from_arrow_refs(out_refs)
    out_refs = [
        reduce.remote(fn, sort_by, *[split_pieces[b][p] for b in range(len(split_pieces))])
        for p in range(num_partitions)
    ]
    return rd.from_pandas_refs(out_refs)


def partition_map(
    ds,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    sort_by: Sequence[str] | None = None,
    arrow_output: bool = False,
):
    """Apply ``fn`` to each hash partition of ``ds`` keyed by ``key``.

    ``fn`` receives a pandas DataFrame holding *every* row whose key
    hashes to that partition (all rows of any given key — never split),
    optionally pre-sorted by ``sort_by``. It must return a DataFrame.

    With ``arrow_output=True`` the reduce stays Arrow end-to-end:
    ``fn`` receives (and must return) a pyarrow Table and ``sort_by``
    is unsupported — sort inside the kernel where needed.
    """
    num_partitions = resolve_num_partitions(num_partitions)
    block_refs = ds.to_arrow_refs()  # shuffle barrier: executes upstream (zero-copy blocks)
    split = ray.remote(num_returns=num_partitions)(_split_block)
    pieces = [split.remote(b, key, num_partitions) for b in block_refs]
    return _assemble(pieces, fn, sort_by, num_partitions,
                     arrow_output=arrow_output)


def _split_parquet_chunk(path: str, row_groups: list[int], columns, key: str, num_partitions: int):
    """Map-side read+split fused in one task: decode a row-group range
    straight from the file, hash, split — the driver never materializes
    or re-ships the input."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    t = pf.read_row_groups(row_groups, columns=list(columns) if columns else None)
    return _split_block(t, key, num_partitions)


def partition_map_parquet(
    path: str,
    columns: Sequence[str] | None,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    sort_by: Sequence[str] | None = None,
    target_rows_per_task: int = 500_000,
    arrow_output: bool = False,
):
    """partition_map reading directly from a parquet file: the split
    stage decodes row-group ranges in parallel tasks (no Dataset read,
    no driver-side barrier — the fastest path for keyed pipelines that
    start at a table scan). With ``arrow_output=True`` the reduce
    applies an Arrow Table->Table ``fn`` and the result Dataset holds
    Arrow blocks — no pandas materialization anywhere."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    num_partitions = resolve_num_partitions(num_partitions, n_rows=md.num_rows)
    n_rg = md.num_row_groups
    rows_per_rg = max(1, md.num_rows // max(1, n_rg))
    rg_per_task = max(1, target_rows_per_task // rows_per_rg)
    chunks = [list(range(i, min(i + rg_per_task, n_rg))) for i in range(0, n_rg, rg_per_task)]
    split = ray.remote(num_returns=num_partitions)(_split_parquet_chunk)
    pieces = [split.remote(path, rgs, columns, key, num_partitions) for rgs in chunks]
    return _assemble(pieces, fn, sort_by, num_partitions, arrow_output=arrow_output)


def _join_reduce(key, how, suffixes, n_left, *pieces) -> pd.DataFrame:
    lf = _pieces_to_frames(pieces[:n_left])
    rf = _pieces_to_frames(pieces[n_left:])

    def side_empty(side):
        # empty sides keep their input schema where a piece carries one
        # (upstream empty blocks can be column-less), so the merged
        # block has the full joined schema whenever it is knowable
        for p in side:
            pdf = p if isinstance(p, pd.DataFrame) else p.to_pandas()
            if key in pdf.columns:
                return pdf.iloc[:0]
        return pd.DataFrame({key: []})

    left = pd.concat(lf, ignore_index=True) if lf else side_empty(pieces[:n_left])
    right = pd.concat(rf, ignore_index=True) if rf else side_empty(pieces[n_left:])
    return left.merge(right, on=key, how=how, suffixes=suffixes, sort=False)


def hash_join(
    left_ds,
    right_ds,
    key: str,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Generic large-large equi-join: both sides are hash-partitioned by
    ``key`` with the SAME stable partitioning, then matching partitions
    are joined pairwise with a vectorized pandas merge — the explicit
    partitioned hash join the Ray guide prescribes when neither side
    fits a broadcast. (Small sides should use ``ray.put`` + per-batch
    lookup instead; see stages/similarity.py.)"""
    num_partitions = resolve_num_partitions(num_partitions)
    split = ray.remote(num_returns=num_partitions)(_split_block)
    l_refs = left_ds.to_arrow_refs()
    r_refs = right_ds.to_arrow_refs()
    l_pieces = [split.remote(b, key, num_partitions) for b in l_refs]
    r_pieces = [split.remote(b, key, num_partitions) for b in r_refs]
    if num_partitions == 1:
        l_pieces = [[p] for p in l_pieces]
        r_pieces = [[p] for p in r_pieces]
    reduce = ray.remote(_join_reduce)
    out = [
        reduce.remote(
            key, how, suffixes, len(l_pieces),
            *[l_pieces[b][p] for b in range(len(l_pieces))],
            *[r_pieces[b][p] for b in range(len(r_pieces))],
        )
        for p in range(num_partitions)
    ]
    return rd.from_pandas_refs(out)


def partition_map_pandas(
    df: pd.DataFrame,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int,
    sort_by: Sequence[str] | None = None,
) -> pd.DataFrame:
    """Single-process reference implementation of partition_map (same
    partitioning + ordering), used by tests to pin shuffle semantics."""
    pid = partition_ids(df[key].to_numpy(), num_partitions)
    outs = []
    for p in range(num_partitions):
        part = df[pid == p]
        if not len(part):
            continue
        part = part.reset_index(drop=True)
        if sort_by:
            part = part.sort_values(list(sort_by), kind="mergesort")
        outs.append(fn(part))
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
