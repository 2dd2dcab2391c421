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

Non-additive repair — sessions (``repair_sessions``): a late turn can
MERGE two already-emitted sessions, so no delta row exists; the repair
is keyed recomputation instead. The quarantine names the affected
conversations; the pass re-reads ONLY those conversations from the
source (broadcast membership filter — the exchange is proportional to
the affected subset, never the full table), recomputes their sessions
with the batch kernel, and commits them as the ``sessions_fix`` stream
with REPLACEMENT semantics: the merged view drops every on-time
session of an affected conversation and substitutes the fix rows
(presence in the fix stream IS the retraction marker). Fix passes are
keyed by the highest late epoch they cover — a later pass supersedes,
and readers resolve only the latest manifest.

Still out of scope: joins/asof/cep/alerts — same non-additivity, but
their correlation state spans conversations and time bounds, so the
honest path is a re-run with larger lateness (checkpoint rescale keeps
that cheap to operate).
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


_SESS_COLS = ["conv_id", "session_id", "n_turns", "start_us", "end_us",
              "duration_us"]


def _all_late_files(out_dir: str, epochs: list[int]) -> list[str]:
    files = []
    for e in epochs:
        m = _late_manifest(out_dir, e)
        for rel in m["files"]:
            p = os.path.join(out_dir, rel)
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"late epoch {e} staged file is gone (compacted?) — "
                    f"run the repair BEFORE compacting the 'late' stream: {p}"
                )
            files.append(p)
    return files


def _affected_convs(late_files: list[str]) -> np.ndarray:
    """Distinct conversations with quarantined rows: per-batch unique
    (tiny partials) -> driver union. The array is bounded by the number
    of DISTINCT late conversations, not late rows; at a scale where
    even that set breaks the driver, swap the exact array for a Bloom
    filter — the broadcast-membership shape stays the same."""
    import ray.data as rd

    parts = (
        rd.read_parquet(late_files, partitioning=None)
        .map_batches(
            lambda b: pd.DataFrame({"conv_id": pd.unique(b["conv_id"])}),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return np.unique(parts["conv_id"].to_numpy()) if len(parts) else np.empty(0, dtype=object)


def _fix_epoch(out_dir: str) -> int | None:
    """Highest committed sessions_fix pass (readers resolve ONLY this
    one — earlier passes are superseded, not unioned)."""
    d = os.path.join(out_dir, "manifests", "sessions_fix")
    if not os.path.isdir(d):
        return None
    es = [int(n[len("epoch-"):-len(".json")]) for n in os.listdir(d)
          if n.startswith("epoch-") and n.endswith(".json")]
    return max(es) if es else None


def repair_sessions(out_dir: str, transcripts_path: str,
                    num_partitions: int = DEFAULT_NUM_PARTITIONS) -> dict:
    """Recompute the session windows of every conversation touched by
    the quarantine and commit them as the ``sessions_fix`` stream
    (replacement semantics, pass keyed by the highest covered late
    epoch). No-op when the latest pass already covers every committed
    late epoch."""
    import ray
    import ray.data as rd

    cfg = _latest_config(out_dir)
    gap_s = cfg["gap_s"]
    late_sink = EpochSink(out_dir, ["late"])
    late_epochs = late_sink.committed_epochs("late")
    if not late_epochs:
        return {"sessions_fix": 0, "epoch": None, "affected_convs": 0,
                "skipped": True}
    target = max(late_epochs)
    sink = EpochSink(out_dir, ["sessions_fix"])
    if sink.is_committed("sessions_fix", target):
        return {"sessions_fix": 0, "epoch": target, "affected_convs": 0,
                "skipped": True}
    wm = _late_manifest(out_dir, target)["watermark_us"]
    late_files = _all_late_files(out_dir, late_epochs)
    affected = _affected_convs(late_files) if late_files else np.empty(0, dtype=object)
    files_out: list[str] = []
    rows_out = 0
    if len(affected):
        from dataflow_mm_ray.stages.windows import session_window_kernel

        aff_ref = ray.put(affected)

        def only_affected(b: pd.DataFrame) -> pd.DataFrame:
            return b[np.isin(b["conv_id"].to_numpy(), ray.get(aff_ref))]

        stage_dir = os.path.join(out_dir, "staging", "sessions_fix",
                                 f"epoch={target}")

        def sessionize_and_stage(part: pd.DataFrame) -> pd.DataFrame:
            s = session_window_kernel(part, gap_s)
            fixed = pd.DataFrame(
                {
                    "conv_id": s["conv_id"].to_numpy(),
                    "session_id": s["session_id"].to_numpy(dtype=np.int32),
                    "n_turns": s["n_turns"].to_numpy(dtype=np.int64),
                    "start_us": s["session_start"].to_numpy(
                        dtype="datetime64[us]").astype(np.int64),
                    "end_us": s["session_end"].to_numpy(
                        dtype="datetime64[us]").astype(np.int64),
                    "duration_us": s["duration_us"].to_numpy(dtype=np.int64),
                }
            )
            return _stage_frame(fixed, stage_dir, out_dir)

        # the source read is pruned to the affected conversations BEFORE
        # the exchange — repair cost tracks the late subset, not the
        # table. A prepared input is epoch=N dirs + _meta.json; list the
        # epoch dirs explicitly (partitioning=None keeps the schema free
        # of a synthetic `epoch` column, and _meta.json never gets read)
        if os.path.exists(os.path.join(transcripts_path, "_meta.json")):
            parts = [
                os.path.join(transcripts_path, d, f)
                for d in sorted(os.listdir(transcripts_path))
                if d.startswith("epoch=")
                for f in sorted(os.listdir(os.path.join(transcripts_path, d)))
                if f.endswith(".parquet")
            ]
            src_ds = rd.read_parquet(parts, partitioning=None)
        else:
            src_ds = rd.read_parquet(transcripts_path)
        src = src_ds.map_batches(only_affected, batch_format="pandas")
        staged = partition_map(
            src, "conv_id", sessionize_and_stage,
            num_partitions=num_partitions, sort_by=("conv_id", "turn_idx"),
        ).to_pandas()
        files_out = list(staged["file"])
        rows_out = int(staged["rows"].sum()) if len(staged) else 0
    sink.commit_files("sessions_fix", target, files_out, rows_out, wm)
    return {"sessions_fix": rows_out, "epoch": target,
            "affected_convs": int(len(affected)), "skipped": False}


def repaired_sessions(out_dir: str):
    """Sessions with late-conversation recomputation applied: on-time
    sessions of unaffected conversations UNION the latest fix pass.
    Falls back to the raw ``sessions`` stream when no repair has run."""
    import ray
    import ray.data as rd

    base = EpochSink(out_dir, ["sessions"]).read_committed_ds("sessions")
    fe = _fix_epoch(out_dir)
    if fe is None:
        return base
    with open(os.path.join(out_dir, "manifests", "sessions_fix",
                           f"epoch-{fe}.json")) as f:
        m = json.load(f)
    fix_files = [os.path.join(out_dir, rel) for rel in m["files"]]
    if not fix_files:
        return base
    fix = rd.read_parquet(fix_files, partitioning=None)
    # presence in the fix stream IS the retraction of a conversation's
    # on-time sessions
    affected = np.unique(
        fix.map_batches(
            lambda b: pd.DataFrame({"conv_id": pd.unique(b["conv_id"])}),
            batch_format="pandas",
        ).to_pandas()["conv_id"].to_numpy()
    )
    aff_ref = ray.put(affected)

    def drop_affected(b: pd.DataFrame) -> pd.DataFrame:
        return b[~np.isin(b["conv_id"].to_numpy(), ray.get(aff_ref))]

    if base is None:
        return fix
    kept = base.map_batches(drop_affected, batch_format="pandas")
    return kept.union(fix)


def _stage_frame(df: pd.DataFrame, stage_dir: str, out_dir: str) -> pd.DataFrame:
    """Stage one partition's frame with a content-derived name (same
    idempotence contract as _stage_reduce)."""
    if not len(df):
        return pd.DataFrame({"file": pd.Series([], dtype=object),
                             "rows": pd.Series([], dtype=np.int64)})
    h = stable_hash_array(df["conv_id"].to_numpy())
    w = df["start_us"].to_numpy(dtype=np.int64).view(np.uint64)
    x = h ^ (w * np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(31)
    digest = int(np.bitwise_xor.reduce(x))
    os.makedirs(stage_dir, exist_ok=True)
    path = os.path.join(stage_dir, f"part-{len(df)}-{digest:016x}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_mm_ray.fsutil import fsync_file_and_dir

    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)
    fsync_file_and_dir(path)
    return pd.DataFrame({"file": [os.path.relpath(path, out_dir)],
                         "rows": [np.int64(len(df))]})


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
