"""Checkpoint rescaling: rewrite a checkpoint taken at N state shards
into an equivalent checkpoint for M shards — the savepoint-rescale
operation that moves a running job from an N-node cluster to a 4N-node
cluster (the north rule's two cluster sizes) without losing state or
exactly-once guarantees.

Every piece of shard state is keyed, and each key class has ONE
routing rule shared with the engine's extract path
(``streaming/engine.py _extract`` / ``run_epoch``):

- conversation-keyed (windows, sliding, sessions + ordinal counters,
  pending joins, as-of carry, CEP/alert buffers and counters,
  upsert revisions): ``hashing.partition_ids(conv_id, M)``;
- content-keyed (windowed-dedup winners): ``uint64(dk1) % M`` —
  the ``dshard`` rule;
- plugin processor state: ``partition_ids(state[route_key], M)`` —
  the rule the engine applies to the processor's extracted rows;
- window-keyed PARTIALS (distinct-count registers, latency
  histograms, top-k tool counts): these are per-shard partial
  aggregates the driver merges across shards at window close
  (max / sum / sum), so any placement is lossless; they are
  redistributed by window hash and merged pairwise when two old
  shards land on the same new shard.

Because the engine checkpoints immediately after ``finalize`` (the
epoch barrier), every ``*_chunks`` staging list is empty in a
snapshot — rescale refuses to proceed otherwise rather than guess.
Disk-SPILLED state is first-class: segments referenced by the
checkpoint are re-routed to the new shard count with the same
per-section rules and rewritten into the new shards' spill dirs
(``_resplit_spill_segments``), so the jobs big enough to spill are
exactly the ones that can still resize.

The rewritten checkpoint keeps the same epoch and watermark; only
``config.n_shards`` and the state files change. Resuming with
``StreamingEngine(..., n_shards=M)`` then passes the config-mismatch
guard and continues the stream; committed output is identical to an
uninterrupted run (shard-count invariance is part of the engine's
determinism contract — pinned by ``tests/test_rescale.py``).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from dataflow_mm_ray.groupsum import group_sum_df
from dataflow_mm_ray.hashing import partition_ids
from dataflow_mm_ray.state.store import (
    _ShardState,
    read_state_snapshot,
    write_state_snapshot,
)

# (attribute, paired per-conv dict attributes) for the conv_id-keyed
# frames; dicts listed separately below
_CONV_FRAMES = (
    "windows", "swindows", "sessions", "inv", "tool",
    "asof_pending", "cep_pending", "alert_pending", "upsert_rev",
)
_CONV_DICTS = ("session_seq", "asof_last", "cep_ptr", "cep_seq", "alert_seq")


def _resplit_spill_segments(old_states, new_states, cfg, proc_route,
                            out_dir: str) -> None:
    """Re-route disk-spilled state to the new shard count.

    Segment rows follow the same per-section routing rules as resident
    state (the SPILL_BUILTIN table shared with the shard): conv-keyed
    sections by ``partition_ids(conv_id, M)``, windowed-dedup winners
    by ``dk1 % M``, plugin state by its ``route_key``. Each old segment
    is processed independently — one new segment per (old segment,
    target shard), written into the new shard's spill dir in the
    shard's own layout (bucket-sorted, bucket-sized row groups —
    ``spill_buckets`` is pinned in the config) with a sequence number
    continuing past any file already there, and referenced from the
    rewritten snapshot's ``spill_segments``. Peak memory is O(one
    segment): a spill-scale checkpoint is precisely one whose state
    does not fit resident, so the splitter must never hold it all. A
    crash mid-rescale leaves the new files as unreferenced orphans (the
    original checkpoint is untouched until the final atomic replace);
    the resumed shards' snapshot-time pruning reclaims them.

    Only ``prows:`` sections (mid-final-flush plugin rows) refuse —
    the engine never checkpoints in that state."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_mm_ray.state.store import SPILL_BUILTIN

    m = len(new_states)
    buckets = int(cfg.get("spill_buckets") or 16)

    def route(df: pd.DataFrame, section: str, k: int) -> np.ndarray:
        if section in SPILL_BUILTIN and SPILL_BUILTIN[section][2] == "dk":
            return (df["dk1"].to_numpy(dtype=np.int64).view(np.uint64)
                    % np.uint64(k)).astype(np.int64)
        if section.startswith("pstate:"):
            return partition_ids(
                df[proc_route[section[len("pstate:"):]]].to_numpy(), k)
        return partition_ids(df["conv_id"].to_numpy(), k)

    # one NEW segment per (old segment, target shard) — pieces are
    # never merged across old segments, so peak memory is O(one
    # segment), not O(total spilled state). A spill-scale checkpoint
    # is exactly one whose state does not fit resident; accumulating
    # it all on the rescale driver would OOM where the old refusal
    # failed cleanly. Segment-count growth is bounded (x M pieces per
    # old segment) and self-heals: resumed shards re-spill into
    # consolidated segments and prune the old ones.
    next_seq: dict[int, int] = {}

    def seq_for(i: int) -> int:
        if i not in next_seq:
            spill_dir = os.path.join(out_dir, "spill", f"shard{i}")
            os.makedirs(spill_dir, exist_ok=True)
            seqs = [int(mm.group(1)) for n in os.listdir(spill_dir)
                    if (mm := re.search(r"-(\d{6,})\.parquet$", n))]
            next_seq[i] = max(seqs, default=0)
        next_seq[i] += 1
        return next_seq[i]

    for st in old_states:
        for seg in st.spill_segments:
            section = seg["section"]
            if not (section in SPILL_BUILTIN or section.startswith("pstate:")):
                raise RuntimeError(
                    f"cannot rescale spill section {section!r} — the "
                    "checkpoint holds mid-flush state"
                )
            df = pq.read_table(seg["path"]).to_pandas().drop(
                columns=["__bucket"])
            ids = route(df, section, m)
            key_col = (SPILL_BUILTIN[section][0]
                       if section in SPILL_BUILTIN else "ts_us")
            for i in range(m):
                piece = df[ids == i]
                if not len(piece):
                    continue
                piece = piece.reset_index(drop=True)
                min_key = (int(piece[key_col].min())
                           if key_col in piece.columns else -(1 << 62))
                piece = piece.copy(deep=False)
                piece["__bucket"] = route(piece, section, buckets)
                piece = piece.sort_values(
                    "__bucket", kind="mergesort").reset_index(drop=True)
                path = os.path.join(
                    out_dir, "spill", f"shard{i}",
                    f"{section.replace(':', '_')}-{seq_for(i):06d}.parquet")
                pq.write_table(
                    pa.Table.from_pandas(piece, preserve_index=False), path,
                    row_group_size=max(1, -(-len(piece) // buckets)),
                )
                new_states[i].spill_segments.append(
                    {"section": section, "path": path, "min_key": min_key,
                     "n": len(piece)}
                )


def _latest_ckpt(checkpoint_dir: str) -> tuple[int, dict]:
    epochs = [
        int(n[len("ckpt-"):-len(".json")])
        for n in os.listdir(checkpoint_dir)
        if n.startswith("ckpt-") and n.endswith(".json")
    ]
    if not epochs:
        raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
    e = max(epochs)
    with open(os.path.join(checkpoint_dir, f"ckpt-{e}.json")) as f:
        return e, json.load(f)


def _split_frame(df: pd.DataFrame, ids: np.ndarray, m: int) -> list[pd.DataFrame]:
    if not len(df):
        return [df.iloc[:0].copy() for _ in range(m)]
    return [df[ids == i].reset_index(drop=True) for i in range(m)]


def rescale_checkpoint(out_dir: str, new_n_shards: int,
                       processors: list | None = None) -> dict:
    """Rewrite the latest checkpoint under ``out_dir/checkpoints`` for
    ``new_n_shards`` state shards. ``processors`` must be the same
    plugin list the run was started with (their ``route_key`` drives
    the state split); pass none when the run had none.

    Returns the rewritten checkpoint metadata.
    """
    if new_n_shards < 1:
        raise ValueError("new_n_shards must be >= 1")
    checkpoint_dir = os.path.join(out_dir, "checkpoints")
    epoch, meta = _latest_ckpt(checkpoint_dir)
    cfg = meta["config"]
    old_n = cfg["n_shards"]
    proc_route = {p.name: p.route_key for p in (processors or [])}
    cfg_procs = cfg.get("processors", [])
    if sorted(proc_route) != sorted(cfg_procs):
        raise ValueError(
            f"checkpoint was taken with processors {cfg_procs}; "
            f"rescale called with {sorted(proc_route)} — pass the same list"
        )

    # read_state_snapshot restores fresh (empty) chunk lists by
    # construction, and write_state_snapshot refuses mid-epoch state —
    # the old pickle-era staged-chunk audit is structural now
    old_states: list[_ShardState] = [
        read_state_snapshot(
            meta["state_files"][str(i)], cfg["width_s"], cfg["gap_s"],
            cfg["slide_width_s"], cfg["cep_within_s"],
            cfg["alert_deadline_s"],
        )
        for i in range(old_n)
    ]
    m = new_n_shards
    new_states = [
        _ShardState(
            cfg["width_s"], cfg["gap_s"], cfg["slide_width_s"],
            cfg["cep_within_s"], cfg["alert_deadline_s"],
        )
        for _ in range(m)
    ]

    for st in old_states:
        # --- conversation-keyed frames -------------------------------
        for attr in _CONV_FRAMES:
            df = getattr(st, attr)
            if not len(df):
                continue
            ids = partition_ids(df["conv_id"].to_numpy(), m)
            for i, piece in enumerate(_split_frame(df, ids, m)):
                if len(piece):
                    cur = getattr(new_states[i], attr)
                    setattr(
                        new_states[i], attr,
                        piece if not len(cur)
                        else pd.concat([cur, piece], ignore_index=True),
                    )
        # --- conversation-keyed dicts --------------------------------
        for attr in _CONV_DICTS:
            d = getattr(st, attr)
            if not d:
                continue
            keys = np.asarray(list(d), dtype=object)
            ids = partition_ids(keys, m)
            for k, i in zip(keys, ids):
                getattr(new_states[int(i)], attr)[k] = d[k]
        # --- content-keyed windowed-dedup winners (dshard rule) ------
        if len(st.dedup):
            ids = (st.dedup["dk1"].to_numpy(dtype=np.int64).view(np.uint64)
                   % np.uint64(m)).astype(np.int32)
            for i, piece in enumerate(_split_frame(st.dedup, ids, m)):
                if len(piece):
                    cur = new_states[i].dedup
                    new_states[i].dedup = (
                        piece if not len(cur)
                        else pd.concat([cur, piece], ignore_index=True)
                    )
        # --- window-keyed partials: redistribute + pairwise merge ----
        for w, regs in st.dcount.items():
            tgt = new_states[int(w) % m].dcount
            prev = tgt.get(w)
            tgt[w] = regs if prev is None else np.maximum(
                np.frombuffer(prev, dtype=np.uint8),
                np.frombuffer(regs, dtype=np.uint8),
            ).tobytes()
        for w, hist in st.wlat.items():
            tgt = new_states[int(w) % m].wlat
            prev = tgt.get(w)
            tgt[w] = hist if prev is None else (
                np.frombuffer(prev, dtype=np.int64)
                + np.frombuffer(hist, dtype=np.int64)
            ).tobytes()
        if len(st.wtopk):
            ids = (st.wtopk["window_start_us"].to_numpy(dtype=np.int64)
                   .view(np.uint64) % np.uint64(m)).astype(np.int32)
            for i, piece in enumerate(_split_frame(st.wtopk, ids, m)):
                if len(piece):
                    cur = new_states[i].wtopk
                    new_states[i].wtopk = group_sum_df(
                        pd.concat([cur, piece], ignore_index=True)
                        if len(cur) else piece,
                        ["window_start_us", "tool"], ["n_invocations"],
                    )
        # --- plugin processor state ----------------------------------
        for pname, state in st.proc_state.items():
            if not len(state):
                continue
            ids = partition_ids(state[proc_route[pname]].to_numpy(), m)
            for i, piece in enumerate(_split_frame(state, ids, m)):
                if len(piece):
                    cur = new_states[i].proc_state.get(pname)
                    new_states[i].proc_state[pname] = (
                        piece if cur is None or not len(cur)
                        else pd.concat([cur, piece], ignore_index=True)
                    )

    _resplit_spill_segments(old_states, new_states, cfg, proc_route, out_dir)

    # --- write the rewritten checkpoint (new file names — never clobber
    # the old shard files, so a crash mid-rescale leaves the original
    # checkpoint fully intact until the final atomic manifest replace)
    from dataflow_mm_ray.fsutil import fsync_dir

    state_files = {}
    for i, st in enumerate(new_states):
        p = os.path.join(checkpoint_dir,
                         f"state-{epoch}-shard{i}of{m}.parquet")
        write_state_snapshot(st, p)
        state_files[str(i)] = p
    new_meta = {
        "epoch": epoch,
        "watermark_us": meta["watermark_us"],
        "config": {**cfg, "n_shards": m},
        "state_files": state_files,
    }
    ckpt_path = os.path.join(checkpoint_dir, f"ckpt-{epoch}.json")
    tmp = ckpt_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ckpt_path)
    fsync_dir(checkpoint_dir)
    return new_meta
