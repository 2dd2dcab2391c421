"""Late-data correction reprocessing — the lambda repair pass.

The engine never mutates an emitted window: rows arriving behind the
watermark are quarantined to the ``late`` stream (engine.py, the late
split). This module replays that quarantine into ADDITIVE correction
streams so a consumer can reconstruct the exact batch answer at ANY
lateness setting:

- ``windows_fix``  — same schema as ``windows``  (state/store _WIN_COLS)
- ``sliding_fix``  — same schema as ``sliding``  (_SLIDE_COLS)

The lambda-repair invariant (pytest-pinned in tests/test_reprocess.py):
group-summing ``windows UNION ALL windows_fix`` on
(conv_id, window_start_us) equals the batch ``tumbling_window_agg``
over the full input, bit-for-bit — the engine's late/current split is
exclusive, so the quarantine holds exactly the rows the on-time
aggregate is missing, and sum-shaped aggregates repair by addition.
Likewise for ``sliding`` with ``sliding_window_agg``.

Exactly-once and incremental: late epoch e is consumed into fix epoch
e (1:1); an epoch whose fix manifest exists is skipped. The pass can
run after every tick, once at the end, or again after more epochs
commit — re-running is a no-op, and corrections from successive passes
compose because they are deltas over disjoint row sets.

Scale shape: the quarantine is read per-epoch straight from the
manifest-listed parquet (never via the driver), partial-aggregated per
batch (a hot conversation contributes one row per window per batch),
merged with ONE keyed exchange (partition_map on conv_id), and each
reduce partition stages its own output file — the driver commits
manifests only.

Ordering constraint: run the repair BEFORE compacting the ``late``
stream (streaming/compact.py deletes per-epoch data files once a
compacted segment covers them); a missing staged file raises with that
instruction rather than silently under-correcting.

Out of scope by design: non-additive streams (sessions, joins, asof,
cep, alerts) — a late turn can merge two already-emitted sessions, so
their repair is not expressible as a delta row. The documented path
there is a re-run with larger lateness (checkpoint rescale keeps that
cheap to operate).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from dataflow_mm_ray.groupsum import group_sum, group_sum_df
from dataflow_mm_ray.hashing import stable_hash_array
from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS
from dataflow_mm_ray.streaming.sink import EpochSink

US = 1_000_000
FIX_STREAMS = ("windows_fix", "sliding_fix")

_WIN_COLS = ["conv_id", "window_start_us", "n_turns", "n_user_turns",
             "n_tool_calls", "sum_chars"]
_SLIDE_COLS = ["conv_id", "window_start_us", "n_turns", "sum_chars"]


def _latest_config(out_dir: str) -> dict:
    """The engine's window geometry, read from the latest checkpoint —
    corrections computed with a different width/slide than the run
    would silently corrupt the merged view, so there is no override."""
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    epochs = [
        int(n[len("ckpt-"):-len(".json")])
        for n in os.listdir(ckpt_dir)
        if n.startswith("ckpt-") and n.endswith(".json")
    ] if os.path.isdir(ckpt_dir) else []
    if not epochs:
        raise ValueError(
            f"{out_dir} has no engine checkpoint — run the engine (at "
            "least one epoch) before repairing"
        )
    with open(os.path.join(ckpt_dir, f"ckpt-{max(epochs)}.json")) as f:
        return json.load(f)["config"]


def _late_manifest(out_dir: str, epoch: int) -> dict:
    with open(os.path.join(out_dir, "manifests", "late",
                           f"epoch-{epoch}.json")) as f:
        return json.load(f)


def _win_partials(b: pd.DataFrame, width_us: int) -> pd.DataFrame:
    """Per-batch combiner over quarantine rows (ts_us/text_len layout —
    same sums as stages/windows._partial_window_counts, which consumes
    the ts/text layout)."""
    role = b["role"].to_numpy()
    return group_sum(
        {
            "conv_id": b["conv_id"].to_numpy(),
            "window_start_us":
                (b["ts_us"].to_numpy(dtype=np.int64) // width_us) * width_us,
        },
        {
            "n_turns": np.ones(len(b), dtype=np.int64),
            "n_user_turns": (role == "user").astype(np.int64),
            "n_tool_calls":
                ((role == "assistant") & b["tool"].notna().to_numpy()).astype(np.int64),
            "sum_chars": b["text_len"].to_numpy(dtype=np.int64),
        },
    )


def _slide_partials(b: pd.DataFrame, slide_width_us: int,
                    slide_us: int) -> pd.DataFrame:
    k = slide_width_us // slide_us
    us = b["ts_us"].to_numpy(dtype=np.int64)
    bucket = (us // slide_us) * slide_us
    n = len(b)
    return group_sum(
        {
            "conv_id": np.tile(b["conv_id"].to_numpy(), k),
            "window_start_us":
                np.concatenate([bucket - i * slide_us for i in range(k)]),
        },
        {
            "n_turns": np.ones(n * k, dtype=np.int64),
            "sum_chars": np.tile(b["text_len"].to_numpy(dtype=np.int64), k),
        },
    )


def _stage_reduce(cols: list[str], stage_dir: str, out_dir: str):
    """Reduce kernel: merge partials for one hash partition and stage
    the result parquet with a content-derived deterministic name — a
    retried reduce overwrites the same path with identical bytes, so
    the later manifest commit never double-counts."""
    sums = [c for c in cols if c not in ("conv_id", "window_start_us")]

    def fn(part: pd.DataFrame) -> pd.DataFrame:
        merged = group_sum_df(part, ["conv_id", "window_start_us"], sums)[cols]
        if not len(merged):
            return pd.DataFrame({"file": pd.Series([], dtype=object),
                                 "rows": pd.Series([], dtype=np.int64)})
        h = stable_hash_array(merged["conv_id"].to_numpy())
        w = merged["window_start_us"].to_numpy(dtype=np.int64).view(np.uint64)
        x = h ^ (w * np.uint64(0x9E3779B97F4A7C15))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(31)
        digest = int(np.bitwise_xor.reduce(x))
        os.makedirs(stage_dir, exist_ok=True)
        path = os.path.join(stage_dir, f"part-{len(merged)}-{digest:016x}.parquet")
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dataflow_mm_ray.fsutil import fsync_file_and_dir

        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
        os.replace(tmp, path)
        fsync_file_and_dir(path)
        return pd.DataFrame({"file": [os.path.relpath(path, out_dir)],
                             "rows": [np.int64(len(merged))]})

    return fn


def repair(out_dir: str,
           num_partitions: int = DEFAULT_NUM_PARTITIONS) -> dict:
    """Replay every committed-but-unrepaired ``late`` epoch into the
    correction streams. Returns per-stream repaired row counts.
    Exactly-once per epoch; safe to call repeatedly."""
    import ray.data as rd

    cfg = _latest_config(out_dir)
    width_us = cfg["width_s"] * US
    slide_width_us = cfg["slide_width_s"] * US
    slide_us = cfg["slide_s"] * US

    sink = EpochSink(out_dir, list(FIX_STREAMS))
    late_sink = EpochSink(out_dir, ["late"])
    stats = {"windows_fix": 0, "sliding_fix": 0, "epochs": []}
    for epoch in late_sink.committed_epochs("late"):
        if all(sink.is_committed(s, epoch) for s in FIX_STREAMS):
            continue
        m = _late_manifest(out_dir, epoch)
        wm = m["watermark_us"]
        files = [os.path.join(out_dir, rel) for rel in m["files"]]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"late epoch {epoch} staged files are gone (compacted?) — "
                "run the repair BEFORE compacting the 'late' stream: "
                + missing[0]
            )
        counts = {}
        if files:
            # no columns= pruning: this Ray version's parquet datasource
            # raises UnboundLocalError combining columns with
            # partitioning=None, and the quarantine holds no text — only
            # hashes and small ints ride along
            ds = rd.read_parquet(files, partitioning=None).materialize()
            for stream, partial, cols in (
                ("windows_fix",
                 lambda b: _win_partials(b, width_us), _WIN_COLS),
                ("sliding_fix",
                 lambda b: _slide_partials(b, slide_width_us, slide_us),
                 _SLIDE_COLS),
            ):
                if sink.is_committed(stream, epoch):
                    continue
                stage_dir = os.path.join(out_dir, "staging", stream,
                                         f"epoch={epoch}")
                staged = partition_map(
                    ds.map_batches(partial, batch_format="pandas"),
                    "conv_id",
                    _stage_reduce(cols, stage_dir, out_dir),
                    num_partitions=num_partitions,
                ).to_pandas()
                counts[stream] = (list(staged["file"]),
                                  int(staged["rows"].sum()) if len(staged) else 0)
        for stream in FIX_STREAMS:
            fs, rows = counts.get(stream, ([], 0))
            sink.commit_files(stream, epoch, fs, rows, wm)
            stats[stream] += rows
        stats["epochs"].append(epoch)
    return stats


def _merged(out_dir: str, base: str, fix: str, cols: list[str],
            num_partitions: int):
    """Lazy repaired view: union the committed base + fix files and
    re-sum per (conv_id, window) — one keyed exchange, driver never
    sees rows."""
    import ray.data as rd

    base_sink = EpochSink(out_dir, [base])
    fix_sink = EpochSink(out_dir, [fix])
    files = base_sink.committed_files(base) + fix_sink.committed_files(fix)
    if not files:
        return None
    # both streams' files hold exactly `cols` — nothing to prune (and
    # columns= + partitioning=None trips a Ray datasource bug)
    ds = rd.read_parquet(files, partitioning=None)
    sums = [c for c in cols if c not in ("conv_id", "window_start_us")]
    return partition_map(
        ds, "conv_id",
        lambda part: group_sum_df(part, ["conv_id", "window_start_us"], sums)[cols],
        num_partitions=num_partitions,
    )


def repaired_windows(out_dir: str,
                     num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """``windows`` with late corrections applied — equals the batch
    tumbling aggregate over the full input once ``repair`` has covered
    every committed late epoch."""
    return _merged(out_dir, "windows", "windows_fix", _WIN_COLS, num_partitions)


def repaired_sliding(out_dir: str,
                     num_partitions: int = DEFAULT_NUM_PARTITIONS):
    return _merged(out_dir, "sliding", "sliding_fix", _SLIDE_COLS, num_partitions)
