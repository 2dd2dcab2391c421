"""Keyed state-store actors for the streaming engine.

One ``StateShard`` actor owns all per-conversation state for the
conversations hashing to its shard: window partials, open session
intervals, and pending tool-join state. This is the engine's
equivalent of the reference's per-worker persistent state (model pools
initialized once per process — ``audio_ctc...evaluator.py:46-53``; the
in-operator dedup caches of ``image_diversity_filter.py:17-26``) made
explicit, bounded, and snapshot-able.

State layout (the north-star "sorted runs"): every construct is held
as pandas frames — an *open* base frame plus append-only chunks from
``apply`` calls. ``apply`` is O(1) per call (list append); all merging
is vectorized at ``finalize`` (one consolidation per shard per epoch):

- windows/sliding: concat + groupby-sum, mask-split closable vs open;
- sessions: interval merge via grouped running-max-end + gap cumsum
  (the same vectorized kernel as the batch path);
- joins: the batch backward-fill kernel over (pending + new) events.

Watermark discipline (the determinism contract):

- lateness is decided *before* rows reach a shard (uniformly,
  ``ts < watermark`` at arrival); every row a shard applies has
  ``ts >= wm_prev``;
- ``finalize(wm)`` emits exactly the constructs no non-late row can
  still extend: windows with ``window_end <= wm``, sessions with
  ``session_end + gap < wm``, join matches whose response ``ts <= wm``;
- every emission is a pure function of (applied rows, wm), so replays
  after restore produce identical emissions. Applies within an epoch
  are commutative (sums / point inserts / event appends), so tasks may
  push to shards concurrently.

State is bounded: closed constructs are dropped, matched invocations
deleted, tool turns with ``ts <= wm`` garbage-collected (turn order ==
ts order within a conversation, so they can never serve a future
invocation).

Snapshots are dictionary-encoded Arrow/parquet files written by
``snapshot(path)`` and restored with ``restore(path)`` (layout:
``write_state_snapshot`` below); the engine commits them with its
checkpoint manifest. With ``stage_root`` set, ``finalize`` writes this
shard's emission parquet files itself (distributed 2PC staging) and
returns only file names + counts.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from dataflow_mm_ray.groupsum import group_sum, group_sum_df

US = 1_000_000
_DCOUNT_P = 12  # windowed-distinct HLL precision: 4 KiB/window, ~1.6% err

_WIN_COLS = ["conv_id", "window_start_us", "n_turns", "n_user_turns", "n_tool_calls", "sum_chars"]
_WTOPK_COLS = ["window_start_us", "tool", "n_invocations"]
_SLIDE_COLS = ["conv_id", "window_start_us", "n_turns", "sum_chars"]
_SESS_STATE_COLS = ["conv_id", "start_us", "end_us", "n_turns"]
_INV_COLS = ["conv_id", "turn_idx", "tool", "ts_us"]
_TOOL_COLS = ["conv_id", "turn_idx", "ts_us"]
_ASOF_COLS = ["conv_id", "turn_idx", "ts_us", "is_click"]


def _empty_asof() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype=object),
            "turn_idx": pd.Series([], dtype=np.int64),
            "ts_us": pd.Series([], dtype=np.int64),
            "is_click": pd.Series([], dtype=bool),
        }
    )


def _empty(cols) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=object if c in ("conv_id", "tool") else np.int64) for c in cols})


_CEP_COLS = ["conv_id", "turn_idx", "ts_us", "is_inv", "tool"]
_DEDUP_COLS = ["window_start_us", "dk1", "dk2", "ts_us", "conv_id", "turn_idx", "n_copies"]


def _empty_dedup() -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series([], dtype=object if c == "conv_id" else np.int64)
         for c in _DEDUP_COLS}
    )


def _empty_cep() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype=object),
            "turn_idx": pd.Series([], dtype=np.int64),
            "ts_us": pd.Series([], dtype=np.int64),
            "is_inv": pd.Series([], dtype=bool),
            "tool": pd.Series([], dtype=object),
        }
    )


class _ShardState:
    def __init__(self, width_s: int, gap_s: int, slide_width_s: int = 0,
                 cep_within_s: int | None = None,
                 alert_deadline_s: int | None = None):
        from dataflow_mm_ray.stages.cep import ROUNDTRIP_WITHIN_S

        self.cep_within_us = (ROUNDTRIP_WITHIN_S if cep_within_s is None
                              else cep_within_s) * US
        from dataflow_mm_ray.stages.cep import ALERT_DEADLINE_S

        self.alert_deadline_us = (ALERT_DEADLINE_S if alert_deadline_s is None
                                  else alert_deadline_s) * US
        self.width_us = width_s * US
        self.gap_us = gap_s * US
        self.slide_width_us = slide_width_s * US
        self.windows = _empty(_WIN_COLS)
        self.win_chunks: list[pd.DataFrame] = []
        self.swindows = _empty(_SLIDE_COLS)
        self.slide_chunks: list[pd.DataFrame] = []
        self.sessions = _empty(_SESS_STATE_COLS)
        self.sess_chunks: list[pd.DataFrame] = []
        self.session_seq: dict[str, int] = {}
        self.inv = _empty(_INV_COLS)
        self.inv_chunks: list[pd.DataFrame] = []
        self.tool = _empty(_TOOL_COLS)
        self.tool_chunks: list[pd.DataFrame] = []
        # as-of enrichment: buffered un-finalized turns + per-conv
        # carried (last finalized click turn_idx, its ts_us)
        self.asof_pending = _empty_asof()
        self.asof_chunks: list[pd.DataFrame] = []
        self.asof_last: dict[str, tuple[int, int]] = {}
        # windowed distinct-count sketch: per-open-window HLL register
        # partials (this shard's conversations only — the driver merges
        # shard partials at window close; registers merge by max, so
        # the split is lossless)
        self.dcount: dict[int, bytes] = {}
        self.dcount_chunks: list[pd.DataFrame] = []
        # streamed CEP (stages/cep.py advance_chain_automaton): buffered
        # invoke/response rows (bounded by the within window — pruned
        # every finalize), per-conv scan pointer + match counter
        self.cep_pending = _empty_cep()
        self.cep_chunks: list[pd.DataFrame] = []
        self.cep_ptr: dict[str, int] = {}
        self.cep_seq: dict[str, int] = {}
        # streamed absence detection (timeout alerts): same row layout,
        # separate buffer (different pruning policy) + per-conv counter
        self.alert_pending = _empty_cep()
        self.alert_chunks: list[pd.DataFrame] = []
        self.alert_seq: dict[str, int] = {}
        # update-mode changelog for tumbling windows: per-key emission
        # counter held as a FRAME (vectorized merges — a python dict of
        # tuple keys cost ~2x soak wall at 20M turns), GC'd when the
        # window closes (a closed window can never change again — late
        # rows are quarantined upstream)
        self.upsert_rev = _empty(["conv_id", "window_start_us", "revision"])
        # windowed top-k tool partials: this shard's exact per-(window,
        # tool) invocation counts, returned to the driver at window
        # close for the cross-shard merge + rank cut (wtopk stream).
        # State is open-windows x distinct-tools rows; for an unbounded
        # tool vocabulary cap with the Misra-Gries machinery of
        # stages/heavyhitters.py (documented trade: counts become
        # candidates needing a verify pass).
        self.wtopk = _empty(_WTOPK_COLS)
        self.wtopk_chunks: list[pd.DataFrame] = []
        # windowed exact dedup (dropDuplicates-within-watermark): the
        # current (window, key-hash) winner + copy count for this
        # shard's KEY-ROUTED rows (dshard, not conv shard); emitted and
        # dropped at window close
        self.dedup = _empty_dedup()
        self.dedup_chunks: list[pd.DataFrame] = []
        # windowed latency percentiles: per-RESPONSE-window mergeable
        # quarter-octave histogram of settled join latencies (keyed on
        # the response ts so window close is watermark-aligned: a
        # response settles strictly before its window closes). bytes =
        # int64[LAT_BINS]; shard partials sum at the driver.
        self.wlat: dict[int, bytes] = {}
        # plugin stateful processors (streaming/processor.py): state
        # frame + pending chunks per processor name. Lives HERE (not on
        # the actor) so checkpoint snapshot/restore covers plugins for
        # free.
        self.proc_state: dict[str, pd.DataFrame] = {}
        self.proc_chunks: dict[str, list[pd.DataFrame]] = {}
        # disk-spilled state segments (StateShard spill mode): each is
        # {"section": ..., "path": ..., "min_key": int, "n": int} — the
        # rows live in the parquet file, bucket-partitioned; part of
        # logical state, so snapshots carry the list and restore
        # reattaches it (the files are durable under out_dir)
        self.spill_segments: list[dict] = []


# ---------------------------------------------------------------------------
# Arrow state snapshots
#
# A snapshot is ONE parquet file of (section: string, n_rows: int64,
# ipc: binary) rows — each section is a state table serialized as an
# Arrow IPC stream with its own schema (string columns
# dictionary-encoded: conv_id/tool repeat heavily across open windows,
# and the north star calls for dictionary-layout state). Unlike the
# r1-r4 pickle layout this is Python/pandas-version independent,
# self-describing, and ~3-6x smaller on conversation-keyed state. A
# file-level metadata version guard refuses mismatched layouts loudly.

STATE_LAYOUT_VERSION = 1
_STATE_LAYOUT_KEY = b"dataflow_mm_ray_state_layout"

_STATE_FRAMES = (
    "windows", "swindows", "sessions", "inv", "tool",
    "asof_pending", "cep_pending", "alert_pending", "upsert_rev",
    "wtopk", "dedup",
)
_STATE_SEQ_DICTS = ("session_seq", "cep_ptr", "cep_seq", "alert_seq")
_STATE_BYTES_DICTS = ("dcount", "wlat")
_STATE_CHUNK_LISTS = (
    "win_chunks", "slide_chunks", "sess_chunks", "inv_chunks",
    "tool_chunks", "asof_chunks", "dcount_chunks", "cep_chunks",
    "alert_chunks", "wtopk_chunks", "dedup_chunks",
)


def _frame_to_ipc(df: pd.DataFrame) -> bytes:
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pa.Table.from_pandas(df, preserve_index=False)
    cols = []
    for col in t.columns:
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = pc.dictionary_encode(col.combine_chunks())
        cols.append(col)
    t = pa.table(dict(zip(t.column_names, cols)))
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def _ipc_to_frame(b: bytes) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pa.ipc.open_stream(pa.BufferReader(b)).read_all()
    cols = []
    for col in t.columns:
        if pa.types.is_dictionary(col.type):
            col = pc.cast(col, col.type.value_type)
        cols.append(col)
    return pa.table(dict(zip(t.column_names, cols))).to_pandas()


def _state_sections(s: "_ShardState") -> list[tuple[str, pd.DataFrame]]:
    sec: list[tuple[str, pd.DataFrame]] = []
    for attr in _STATE_FRAMES:
        df = getattr(s, attr)
        if len(df):
            sec.append((f"frame:{attr}", df))
    for attr in _STATE_SEQ_DICTS:
        d = getattr(s, attr)
        if d:
            sec.append((f"seq:{attr}", pd.DataFrame({
                "k": np.asarray(list(d.keys()), dtype=object),
                "v": np.fromiter(d.values(), dtype=np.int64, count=len(d)),
            })))
    if s.asof_last:
        ks = list(s.asof_last)
        sec.append(("asof_last", pd.DataFrame({
            "k": np.asarray(ks, dtype=object),
            "turn_idx": np.asarray([s.asof_last[k][0] for k in ks], dtype=np.int64),
            "ts_us": np.asarray([s.asof_last[k][1] for k in ks], dtype=np.int64),
        })))
    for attr in _STATE_BYTES_DICTS:
        d = getattr(s, attr)
        if d:
            sec.append((f"bytes:{attr}", pd.DataFrame({
                "w": np.fromiter(d.keys(), dtype=np.int64, count=len(d)),
                "b": np.asarray([bytes(v) for v in d.values()], dtype=object),
            })))
    for pname, df in s.proc_state.items():
        if len(df):
            sec.append((f"proc:{pname}", df))
    if s.spill_segments:
        sec.append(("spill_segments", pd.DataFrame({
            "section": np.asarray([g["section"] for g in s.spill_segments], dtype=object),
            "path": np.asarray([g["path"] for g in s.spill_segments], dtype=object),
            "min_key": np.asarray([g["min_key"] for g in s.spill_segments], dtype=np.int64),
            "n": np.asarray([g["n"] for g in s.spill_segments], dtype=np.int64),
        })))
    return sec


def write_state_snapshot(s: "_ShardState", path: str) -> None:
    """Serialize one shard's state to ``path`` (tmp + fsync + atomic
    replace: the checkpoint manifest that references this snapshot must
    never outlive its bytes). Engine checkpoints happen at the epoch
    barrier, where every ``*_chunks`` staging list is empty — refuse
    to snapshot mid-epoch rather than guess at chunk semantics."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    staged = [a for a in _STATE_CHUNK_LISTS if getattr(s, a)]
    if staged or any(len(v) for v in s.proc_chunks.values()):
        raise RuntimeError(
            f"state has staged chunks ({staged or 'processor chunks'}) — "
            "snapshots are taken at the epoch barrier only"
        )
    sections = _state_sections(s)
    t = pa.table({
        "section": pa.array([n for n, _ in sections], type=pa.string()),
        "n_rows": pa.array([len(df) for _, df in sections], type=pa.int64()),
        "ipc": pa.array([_frame_to_ipc(df) for _, df in sections],
                        type=pa.large_binary()),
    }).replace_schema_metadata({_STATE_LAYOUT_KEY: str(STATE_LAYOUT_VERSION)})
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    with open(tmp, "rb+") as f:
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    from dataflow_mm_ray.fsutil import fsync_dir

    fsync_dir(os.path.dirname(path))


def read_state_snapshot(path: str, width_s: int, gap_s: int,
                        slide_width_s: int = 0,
                        cep_within_s: int | None = None,
                        alert_deadline_s: int | None = None) -> "_ShardState":
    """Restore a shard state written by ``write_state_snapshot``. The
    config scalars come from the CALLER (the engine has already proved
    them equal to the checkpoint's config record); the file carries only
    state. Refuses loudly on any non-snapshot file (including legacy
    r1-r4 pickle snapshots) or a layout-version mismatch."""
    import pyarrow.parquet as pq

    try:
        t = pq.read_table(path)
        meta = t.schema.metadata or {}
    except Exception as e:
        raise ValueError(
            f"{path} is not an Arrow state snapshot (legacy pickle "
            f"checkpoints cannot be restored by this engine version — "
            f"re-run from the stream start or rescale from a fresh "
            f"checkpoint): {e}"
        ) from e
    ver = meta.get(_STATE_LAYOUT_KEY)
    if ver is None or int(ver) != STATE_LAYOUT_VERSION:
        raise ValueError(
            f"{path} has state layout {ver!r}; this engine reads layout "
            f"{STATE_LAYOUT_VERSION} — refusing a silent cross-layout restore"
        )
    st = _ShardState(width_s, gap_s, slide_width_s, cep_within_s,
                     alert_deadline_s)
    for section, n_rows, ipc in zip(
        t.column("section").to_pylist(), t.column("n_rows").to_pylist(),
        t.column("ipc").to_pylist(),
    ):
        df = _ipc_to_frame(ipc)
        if len(df) != n_rows:
            raise ValueError(
                f"{path} section {section}: {len(df)} rows, manifest says "
                f"{n_rows} — corrupt snapshot"
            )
        if section.startswith("frame:"):
            setattr(st, section[len("frame:"):], df)
        elif section.startswith("seq:"):
            setattr(st, section[len("seq:"):],
                    dict(zip(df["k"], (int(v) for v in df["v"]))))
        elif section == "asof_last":
            st.asof_last = {
                k: (int(ti), int(ts))
                for k, ti, ts in zip(df["k"], df["turn_idx"], df["ts_us"])
            }
        elif section.startswith("bytes:"):
            setattr(st, section[len("bytes:"):],
                    {int(w): bytes(b) for w, b in zip(df["w"], df["b"])})
        elif section.startswith("proc:"):
            st.proc_state[section[len("proc:"):]] = df
        elif section == "spill_segments":
            st.spill_segments = [
                {"section": s_, "path": p_, "min_key": int(mk), "n": int(n_)}
                for s_, p_, mk, n_ in zip(df["section"], df["path"],
                                          df["min_key"], df["n"])
            ]
        else:
            raise ValueError(f"{path}: unknown snapshot section {section!r}")
    return st


def merge_intervals(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Vectorized gap-rule interval merge. df: (conv_id, start_us,
    end_us, n_turns) sorted by (conv_id, start_us, end_us)."""
    if not len(df):
        return df
    conv = df["conv_id"].to_numpy()
    s = df["start_us"].to_numpy(dtype=np.int64)
    new_conv = np.ones(len(df), dtype=bool)
    new_conv[1:] = conv[1:] != conv[:-1]
    conv_grp = np.cumsum(new_conv)
    run_end = (
        pd.Series(df["end_us"].to_numpy(dtype=np.int64))
        .groupby(conv_grp).cummax().groupby(conv_grp).shift(1)
    )
    new_session = new_conv | ((s - run_end.to_numpy()) > gap_us)
    # merged sessions are contiguous runs of the sorted frame: aggregate
    # with boundary arithmetic, not a groupby (groupsum.py rationale)
    starts = np.flatnonzero(new_session)
    e = df["end_us"].to_numpy(dtype=np.int64)
    nt = df["n_turns"].to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {
            "conv_id": conv[starts],
            "start_us": s[starts],  # rows sorted by (conv, start_us)
            "end_us": np.maximum.reduceat(e, starts),
            "n_turns": np.add.reduceat(nt, starts),
        }
    )
    return out[_SESS_STATE_COLS]


# spill section -> (settle-key column, margin kind, bucket rule) —
# shared by the shard's spill machinery and the rescale splitter
SPILL_BUILTIN = {
    "inv": ("ts_us", "zero", "conv"),
    "tool": ("ts_us", "zero", "conv"),
    "asof_pending": ("ts_us", "zero", "conv"),
    "cep_pending": ("ts_us", "zero", "conv"),
    "alert_pending": ("ts_us", "zero", "conv"),
    "sessions": ("start_us", "gap", "conv"),
    "dedup": ("window_start_us", "width", "dk"),
}


@ray.remote
class StateShard:
    def __init__(self, shard_id: int, width_s: int, gap_s: int, slide_width_s: int = 0,
                 cep_within_s: int | None = None,
                 alert_deadline_s: int | None = None,
                 processors: list | None = None,
                 spill_dir: str | None = None,
                 spill_threshold_bytes: int | None = None,
                 spill_buckets: int = 16):
        self.shard_id = shard_id
        self._cfg = (width_s, gap_s, slide_width_s, cep_within_s,
                     alert_deadline_s)
        self.s = _ShardState(*self._cfg)
        self._spill_dir = spill_dir
        self._spill_threshold = spill_threshold_bytes
        self._spill_buckets = int(spill_buckets)
        self._spill_seq = 0
        # spill paths referenced by this shard's most recent snapshots;
        # files named there must outlive the checkpoints that point at
        # them (engine retains the latest + one prior epoch)
        self._snap_refs: list[set] = []
        if spill_dir is not None:
            import os
            import re

            os.makedirs(spill_dir, exist_ok=True)
            # continue the segment sequence past any file already on
            # disk: a resumed shard restarting at 0 would overwrite
            # segments a restored checkpoint still references — rows
            # silently lost or double-counted at flush, exactly-once
            # broken
            # {6,}: {:06d} grows PAST 6 digits — a 7-digit segment
            # invisible to the scan would be overwritten after restart
            seqs = [
                int(m.group(1))
                for n in os.listdir(spill_dir)
                if (m := re.search(r"-(\d{6,})\.parquet$", n))
            ]
            self._spill_seq = max(seqs, default=0)
        # plugin processors (streaming/processor.py) — instances are
        # CODE (pickled once at actor creation); their STATE lives in
        # self.s so snapshot/restore needs no special casing
        self.procs = {p.name: p for p in (processors or [])}
        # within-epoch apply dedup: a Ray Data map task retried after a
        # worker crash re-issues its apply calls; the deterministic
        # content-derived apply_id lets the shard drop the replay, so
        # state applies are idempotent, not just commutative (exactly-
        # once holds under intra-epoch task retry). Cleared at finalize
        # (the epoch barrier) and on restore (epoch replay after a
        # crash re-applies against the restored snapshot by design).
        self._seen_applies: set = set()

    # ------------------------------------------------------------------
    def apply(
        self,
        window_partials: pd.DataFrame | None,
        turns: pd.DataFrame | None,
        join_events: pd.DataFrame | None,
        sliding_partials: pd.DataFrame | None = None,
        asof_rows: pd.DataFrame | None = None,
        dcount_partials: pd.DataFrame | None = None,
        dedup_rows: pd.DataFrame | None = None,
        proc_rows: dict | None = None,
        apply_id=None,
    ) -> int:
        """Append one epoch's (pre-aggregated, non-late) rows — O(1);
        all consolidation happens at finalize."""
        if apply_id is not None:
            if apply_id in self._seen_applies:
                return 0
            self._seen_applies.add(apply_id)
        st = self.s
        n = 0
        if window_partials is not None and len(window_partials):
            n += len(window_partials)
            st.win_chunks.append(window_partials[_WIN_COLS])
        if sliding_partials is not None and len(sliding_partials):
            n += len(sliding_partials)
            st.slide_chunks.append(sliding_partials[_SLIDE_COLS])
        if turns is not None and len(turns):
            n += len(turns)
            ts = turns["ts_us"].to_numpy(dtype=np.int64)
            st.sess_chunks.append(
                pd.DataFrame(
                    {"conv_id": turns["conv_id"].to_numpy(), "start_us": ts,
                     "end_us": ts, "n_turns": np.int64(1)}
                )
            )
        if asof_rows is not None and len(asof_rows):
            n += len(asof_rows)
            st.asof_chunks.append(asof_rows[_ASOF_COLS])
        if dcount_partials is not None and len(dcount_partials):
            st.dcount_chunks.append(dcount_partials[["window_start_us", "reg_idx", "rank"]])
        if dedup_rows is not None and len(dedup_rows):
            st.dedup_chunks.append(dedup_rows[_DEDUP_COLS])
        if proc_rows:
            for pname, pdf in proc_rows.items():
                if len(pdf):
                    n += len(pdf)
                    st.proc_chunks.setdefault(pname, []).append(pdf)
        if join_events is not None and len(join_events):
            n += len(join_events)
            inv = join_events[join_events["kind"] == "inv"]
            tool = join_events[join_events["kind"] == "tool"]
            # the CEP chain + absence automata consume the SAME
            # invoke/response rows the join ships — no extra extract
            # traffic (buffers are separate: different pruning policies)
            cep_chunk = pd.DataFrame(
                {"conv_id": join_events["conv_id"].to_numpy(),
                 "turn_idx": join_events["turn_idx"].to_numpy(dtype=np.int64),
                 "ts_us": join_events["ts_us"].to_numpy(dtype=np.int64),
                 "is_inv": (join_events["kind"].to_numpy() == "inv"),
                 "tool": join_events["tool"].to_numpy()}
            )
            st.cep_chunks.append(cep_chunk)
            st.alert_chunks.append(cep_chunk)
            if len(inv):
                st.inv_chunks.append(
                    pd.DataFrame(
                        {"conv_id": inv["conv_id"].to_numpy(),
                         "turn_idx": inv["turn_idx"].to_numpy(dtype=np.int64),
                         "tool": inv["tool"].to_numpy(),
                         "ts_us": inv["ts_us"].to_numpy(dtype=np.int64)}
                    )
                )
                # windowed top-k tool partials ride the same inv rows
                # (combined per apply — a per-batch pre-aggregate)
                ius = inv["ts_us"].to_numpy(dtype=np.int64)
                st.wtopk_chunks.append(
                    group_sum(
                        {"window_start_us": (ius // st.width_us) * st.width_us,
                         "tool": inv["tool"].to_numpy()},
                        {"n_invocations": np.ones(len(inv), dtype=np.int64)},
                    )
                )
            if len(tool):
                st.tool_chunks.append(
                    pd.DataFrame(
                        {"conv_id": tool["conv_id"].to_numpy(),
                         "turn_idx": tool["turn_idx"].to_numpy(dtype=np.int64),
                         "ts_us": tool["ts_us"].to_numpy(dtype=np.int64)}
                    )
                )
        return n

    # ------------------------------------------------------------------
    @staticmethod
    def _consolidate(base: pd.DataFrame, chunks: list, cols, width_us: int,
                     wm_us: int, flush: bool):
        """Window consolidation: concat + groupby-sum, split closable."""
        frames = ([base] if len(base) else []) + chunks
        if not frames:
            return base, base  # both empty
        allw = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        agg = group_sum_df(allw, ["conv_id", "window_start_us"], cols[2:])
        if flush:
            closed = agg.sort_values(["conv_id", "window_start_us"], kind="mergesort")
            return closed.reset_index(drop=True)[cols], _empty(cols)
        m = (agg["window_start_us"].to_numpy(dtype=np.int64) + width_us) <= wm_us
        closed = agg[m].sort_values(["conv_id", "window_start_us"], kind="mergesort")
        return closed.reset_index(drop=True)[cols], agg[~m].reset_index(drop=True)[cols]

    @staticmethod
    def _window_upserts(st, win_chunks: list, win_closed: pd.DataFrame) -> pd.DataFrame:
        """Update-mode changelog for the tumbling windows (the engine's
        other output mode — the ``windows`` stream is append-on-close).
        Emits one row per window whose aggregate CHANGED this epoch
        (its current running value), plus a final row when the window
        closes (``is_final=True``, same values as the ``windows``
        emission). ``revision`` counts the key's emissions, so a
        consumer materializes the latest state per
        ``(conv_id, window_start_us)`` by max revision; the is_final
        rows alone reproduce the append-mode stream exactly."""
        keycols = ["conv_id", "window_start_us"]
        if not win_chunks and not len(win_closed):
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "window_start_us": pd.Series([], dtype=np.int64),
                    "n_turns": pd.Series([], dtype=np.int64),
                    "n_user_turns": pd.Series([], dtype=np.int64),
                    "n_tool_calls": pd.Series([], dtype=np.int64),
                    "sum_chars": pd.Series([], dtype=np.int64),
                    "revision": pd.Series([], dtype=np.int64),
                    "is_final": pd.Series([], dtype=bool),
                }
            )
        if win_chunks:
            ck = (
                pd.concat(win_chunks, ignore_index=True)
                if len(win_chunks) > 1 else win_chunks[0]
            )[keycols].drop_duplicates()
        else:
            ck = win_closed[keycols].iloc[:0]
        closed_keys = win_closed[keycols]
        # emission keys = changed ∪ closed; values come from the two
        # disjoint consolidated halves (closed, open) — merge each half
        # instead of concatenating the (large, growing) open state
        keys = pd.concat([ck, closed_keys], ignore_index=True).drop_duplicates()
        up_closed = keys.merge(win_closed, on=keycols, how="inner")
        up_closed["is_final"] = True
        up_open = keys.merge(st.windows, on=keycols, how="inner") if len(st.windows) else (
            win_closed.iloc[:0].copy()
        )
        up_open["is_final"] = False
        up = pd.concat([up_closed, up_open], ignore_index=True)
        up = up.sort_values(keycols, kind="mergesort").reset_index(drop=True)
        # vectorized revision counter: left-merge the carried rev frame,
        # bump, then carry forward the still-open keys only
        up = up.merge(st.upsert_rev, on=keycols, how="left")
        rev = up["revision"].to_numpy(dtype=np.float64)
        rev = np.where(np.isnan(rev), 0.0, rev).astype(np.int64) + 1
        up["revision"] = rev
        is_final = up["is_final"].to_numpy(dtype=bool)
        carried = up.loc[~is_final, ["conv_id", "window_start_us", "revision"]]
        if len(st.upsert_rev):
            untouched = st.upsert_rev.merge(keys, on=keycols, how="left", indicator=True)
            untouched = untouched.loc[untouched["_merge"] == "left_only",
                                      ["conv_id", "window_start_us", "revision"]]
            st.upsert_rev = pd.concat([untouched, carried], ignore_index=True)
        else:
            st.upsert_rev = carried.reset_index(drop=True)
        out = up[_WIN_COLS].copy(deep=False)
        out["revision"] = up["revision"].to_numpy(dtype=np.int64)
        out["is_final"] = is_final
        return out

    def finalize(self, wm_us: int, flush: bool = False,
                 stage_root: str | None = None, epoch: int | None = None) -> dict:
        """Emit closed constructs (vectorized). With ``stage_root``, the
        shard writes its own emission parquet files and returns file
        names + row counts (distributed 2PC staging).

        With spill enabled (``spill_dir``), state paged to disk is read
        back first wherever the watermark could now settle it (so
        emissions are identical to the never-spilled run), the flush
        epoch is processed one key-bucket at a time (bounded memory —
        equivalent to running the final epoch at ``spill_buckets`` x
        the shard count, which shard-count invariance already pins),
        and any still-unsettleable state is re-spilled afterwards."""
        # epoch barrier: retries of this epoch's apply tasks are done
        self._seen_applies.clear()
        if self.s.spill_segments:
            if flush:
                return self._bucketed_flush(wm_us, stage_root, epoch)
            self._unspill(wm_us)
        out = self._finalize_state(self.s, wm_us, flush, stage_root, epoch)
        if not flush:
            self._maybe_spill()
        return out

    def _finalize_state(self, st: "_ShardState", wm_us: int, flush: bool,
                        stage_root: str | None, epoch: int | None,
                        part_tag: str = "") -> dict:
        win_chunks = st.win_chunks
        win_closed, st.windows = self._consolidate(
            st.windows, win_chunks, _WIN_COLS, st.width_us, wm_us, flush
        )
        st.win_chunks = []
        upserts_out = self._window_upserts(st, win_chunks, win_closed)
        slide_closed, st.swindows = self._consolidate(
            st.swindows, st.slide_chunks, _SLIDE_COLS, st.slide_width_us, wm_us, flush
        )
        st.slide_chunks = []

        # --- sessions: vectorized interval merge, closed = prefix ---
        frames = ([st.sessions] if len(st.sessions) else []) + st.sess_chunks
        st.sess_chunks = []
        if frames:
            pts = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            pts = pts.sort_values(["conv_id", "start_us", "end_us"], kind="mergesort")
            merged = merge_intervals(pts, st.gap_us)
        else:
            merged = _empty(_SESS_STATE_COLS)
        if flush:
            closed_m = np.ones(len(merged), dtype=bool)
        else:
            closed_m = (merged["end_us"].to_numpy(dtype=np.int64) + st.gap_us) < wm_us
        closed_sess = merged[closed_m].sort_values(["conv_id", "start_us"], kind="mergesort").reset_index(drop=True)
        st.sessions = merged[~closed_m].reset_index(drop=True)
        # ordinal session ids continue per conversation
        if len(closed_sess):
            base = closed_sess["conv_id"].map(lambda c: st.session_seq.get(c, 0)).to_numpy()
            ordinal = closed_sess.groupby("conv_id", sort=False).cumcount().to_numpy()
            sids = (base + ordinal).astype(np.int32)
            for c, k in closed_sess.groupby("conv_id", sort=False).size().items():
                st.session_seq[c] = st.session_seq.get(c, 0) + int(k)
        else:
            sids = np.empty(0, dtype=np.int32)
        sessions_out = pd.DataFrame(
            {
                "conv_id": closed_sess["conv_id"].to_numpy(),
                "session_id": sids,
                "n_turns": closed_sess["n_turns"].to_numpy(dtype=np.int64),
                "start_us": closed_sess["start_us"].to_numpy(dtype=np.int64),
                "end_us": closed_sess["end_us"].to_numpy(dtype=np.int64),
                "duration_us": (
                    closed_sess["end_us"].to_numpy(dtype=np.int64)
                    - closed_sess["start_us"].to_numpy(dtype=np.int64)
                ),
            }
        )

        # --- joins: batch backward-fill kernel over pending + new ---
        inv_frames = ([st.inv] if len(st.inv) else []) + st.inv_chunks
        st.inv_chunks = []
        tool_frames = ([st.tool] if len(st.tool) else []) + st.tool_chunks
        st.tool_chunks = []
        inv = (pd.concat(inv_frames, ignore_index=True) if len(inv_frames) > 1
               else (inv_frames[0] if inv_frames else _empty(_INV_COLS)))
        tools = (pd.concat(tool_frames, ignore_index=True) if len(tool_frames) > 1
                 else (tool_frames[0] if tool_frames else _empty(_TOOL_COLS)))
        if len(inv):
            ev = pd.concat(
                [
                    inv.assign(__is_tool=False),
                    tools.assign(tool=None, __is_tool=True),
                ],
                ignore_index=True,
            ).sort_values(["conv_id", "turn_idx", "__is_tool"], kind="mergesort")
            is_tool = ev["__is_tool"].to_numpy()
            ng = ev.groupby("conv_id", sort=False).ngroup()
            t_idx = pd.Series(np.where(is_tool, ev["turn_idx"].to_numpy(dtype=np.float64), np.nan))
            t_ts = pd.Series(np.where(is_tool, ev["ts_us"].to_numpy(dtype=np.float64), np.nan))
            nxt_idx = t_idx.groupby(ng.values).shift(-1).groupby(ng.values).bfill().to_numpy()
            nxt_ts = t_ts.groupby(ng.values).shift(-1).groupby(ng.values).bfill().to_numpy()
            inv_m = ~is_tool
            inv_rows = ev[inv_m]
            n_idx, n_ts = nxt_idx[inv_m], nxt_ts[inv_m]
            # ts == wm is NOT settled: lateness is ts < wm, so a turn
            # at exactly the watermark can still arrive in a later
            # epoch (and an earlier tool response at ts == wm could
            # displace this match) — only strictly-passed responses
            # are final
            matched = ~np.isnan(n_ts) & (flush | (n_ts < wm_us))
            emit = matched | flush
            join_out = pd.DataFrame(
                {
                    "conv_id": inv_rows["conv_id"].to_numpy()[emit],
                    "invoke_idx": inv_rows["turn_idx"].to_numpy(dtype=np.int64)[emit].astype(np.int32),
                    "tool": inv_rows["tool"].to_numpy()[emit],
                    # float64/NaN — the canonical nullable representation,
                    # matching the batch join kernel (stages/join.py).
                    "response_idx": np.where(matched, n_idx, np.nan)[emit].astype(np.float64),
                    "latency_us": np.where(
                        matched, n_ts - inv_rows["ts_us"].to_numpy(dtype=np.float64), np.nan
                    )[emit].astype(np.float64),
                }
            ).sort_values(["conv_id", "invoke_idx"], kind="mergesort").reset_index(drop=True)
            st.inv = inv_rows[~emit][_INV_COLS].reset_index(drop=True)
            # windowed-latency partials: settled matches land in the
            # histogram of their RESPONSE-ts window (accumulated BEFORE
            # the close split below — a match always settles no later
            # than the finalize that closes its window)
            if matched.any():
                from dataflow_mm_ray.stages.sketch import LAT_BINS, lat_bins

                rts = n_ts[matched].astype(np.int64)
                lats = (n_ts[matched]
                        - inv_rows["ts_us"].to_numpy(dtype=np.float64)[matched]).astype(np.int64)
                wks = (rts // st.width_us) * st.width_us
                bins = lat_bins(lats)
                for w in np.unique(wks):
                    h = np.zeros(LAT_BINS, dtype=np.int64)
                    np.add.at(h, bins[wks == w], 1)
                    prev = st.wlat.get(int(w))
                    if prev is not None:
                        h += np.frombuffer(prev, dtype=np.int64)
                    st.wlat[int(w)] = h.tobytes()
        else:
            join_out = pd.DataFrame(
                {"conv_id": pd.Series([], dtype=object), "invoke_idx": pd.Series([], dtype=np.int32),
                 "tool": pd.Series([], dtype=object), "response_idx": pd.Series([], dtype=np.float64),
                 "latency_us": pd.Series([], dtype=np.float64)}
            )
            st.inv = inv
        # GC tool turns the watermark has STRICTLY passed (ts == wm
        # rows are not late and may still serve a future invocation
        # arriving at the same timestamp)
        st.tool = tools[tools["ts_us"].to_numpy(dtype=np.int64) >= wm_us][_TOOL_COLS].reset_index(drop=True)

        # --- as-of enrichment: running prior-click over settled turns ---
        # A turn is settled once the watermark STRICTLY passes its ts
        # (a same-ts lower-idx click could still arrive non-late at
        # ts == wm — the same tie rule as the join's response match).
        # Settled turns are enriched with the latest strictly-prior
        # click turn of their conversation: a segmented running max
        # over click positions, seeded from the carried per-conv state;
        # every remaining pending turn has ts >= wm > any settled
        # click's ts, so carrying only (last click idx, ts) per conv is
        # lossless.
        asof_frames = ([st.asof_pending] if len(st.asof_pending) else []) + st.asof_chunks
        st.asof_chunks = []
        if asof_frames:
            allr = (pd.concat(asof_frames, ignore_index=True)
                    if len(asof_frames) > 1 else asof_frames[0])
        else:
            allr = _empty_asof()
        if flush:
            settle = np.ones(len(allr), dtype=bool)
        else:
            settle = allr["ts_us"].to_numpy(dtype=np.int64) < wm_us
        emit_r = allr[settle].sort_values(["conv_id", "turn_idx"], kind="mergesort")
        st.asof_pending = allr[~settle].reset_index(drop=True)
        if len(emit_r):
            from dataflow_mm_ray.stages.temporal import latest_prior_match

            conv = emit_r["conv_id"].to_numpy()
            safe, valid = latest_prior_match(conv, emit_r["is_click"].to_numpy())
            idx_arr = emit_r["turn_idx"].to_numpy(dtype=np.int64)
            ts_arr = emit_r["ts_us"].to_numpy(dtype=np.int64)
            p_idx = np.where(valid, idx_arr[safe].astype(np.float64), np.nan)
            p_ts = np.where(valid, ts_arr[safe].astype(np.float64), np.nan)
            inv_m = ~valid
            if inv_m.any():
                seed = pd.Series(conv[inv_m]).map(st.asof_last)
                has = seed.notna().to_numpy()
                sv = np.array(
                    [s if isinstance(s, tuple) else (np.nan, np.nan) for s in seed],
                    dtype=np.float64,
                ).reshape(-1, 2)
                p_idx[inv_m] = np.where(has, sv[:, 0], np.nan)
                p_ts[inv_m] = np.where(has, sv[:, 1], np.nan)
            asof_out = pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": idx_arr.astype(np.int32),
                    "prior_click_turn_idx": p_idx,
                    "prior_click_ts_us": p_ts,
                }
            ).reset_index(drop=True)
            clicks = emit_r[emit_r["is_click"].to_numpy()]
            if len(clicks):
                last = clicks.groupby("conv_id", sort=False).tail(1)
                for c, i, t in zip(last["conv_id"], last["turn_idx"], last["ts_us"]):
                    st.asof_last[c] = (int(i), int(t))
        else:
            asof_out = pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "turn_idx": pd.Series([], dtype=np.int32),
                    "prior_click_turn_idx": pd.Series([], dtype=np.float64),
                    "prior_click_ts_us": pd.Series([], dtype=np.float64),
                }
            )

        # --- windowed distinct-count sketch: densify this epoch's
        # sparse (window, register, rank) triples in ONE vectorized
        # maximum.at, max-merge with the carried per-window registers,
        # close windows the watermark has passed; closed registers are
        # RETURNED (not staged) — the driver max-merges them across
        # shards before estimating and committing.
        from dataflow_mm_ray.stages.sketch import registers_from_triples

        if st.dcount_chunks or st.dcount:
            frames = st.dcount_chunks
            st.dcount_chunks = []
            if frames:
                tri = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
                nk, nr = registers_from_triples(
                    tri["window_start_us"].to_numpy(dtype=np.int64),
                    tri["reg_idx"].to_numpy(), tri["rank"].to_numpy(), _DCOUNT_P,
                )
            else:
                nk, nr = np.empty(0, dtype=np.int64), []
            merged = dict(st.dcount)
            for k, r in zip(nk, nr):
                k = int(k)
                prev = merged.get(k)
                merged[k] = r if prev is None else np.maximum(
                    np.frombuffer(prev, dtype=np.uint8),
                    np.frombuffer(r, dtype=np.uint8),
                ).tobytes()
            mk = np.asarray(sorted(merged), dtype=np.int64)
            closed_m = np.ones(len(mk), dtype=bool) if flush else (mk + st.width_us) <= wm_us
            st.dcount = {int(k): merged[int(k)] for k, c in zip(mk, closed_m) if not c}
            dcount_out = pd.DataFrame(
                {"window_start_us": mk[closed_m],
                 "__regs": [merged[int(k)] for k, c in zip(mk, closed_m) if c]}
            )
        else:
            dcount_out = pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "__regs": pd.Series([], dtype=object)}
            )

        # --- windowed top-k tool partials: consolidate this shard's
        # per-(window, tool) counts, return the closed-window rows to
        # the driver (NOT staged — the rank cut needs the cross-shard
        # sum; the partial table is tiny: windows x tools)
        wt_frames = ([st.wtopk] if len(st.wtopk) else []) + st.wtopk_chunks
        st.wtopk_chunks = []
        if wt_frames:
            allt = (pd.concat(wt_frames, ignore_index=True)
                    if len(wt_frames) > 1 else wt_frames[0])
            tagg = group_sum_df(allt, ["window_start_us", "tool"], ["n_invocations"])
            tm = (np.ones(len(tagg), dtype=bool) if flush
                  else (tagg["window_start_us"].to_numpy(dtype=np.int64) + st.width_us) <= wm_us)
            wtopk_partials = (
                tagg[tm].sort_values(["window_start_us", "tool"], kind="mergesort")
                .reset_index(drop=True)[_WTOPK_COLS]
            )
            st.wtopk = tagg[~tm].reset_index(drop=True)[_WTOPK_COLS]
        else:
            wtopk_partials = _empty(_WTOPK_COLS)

        # --- windowed exact dedup: consolidate the (window, key) winner
        # state (min over (ts, conv_id, turn_idx), summed copy counts),
        # emit and drop the windows the watermark has closed
        dd_frames = ([st.dedup] if len(st.dedup) else []) + st.dedup_chunks
        st.dedup_chunks = []
        if dd_frames:
            alld = (pd.concat(dd_frames, ignore_index=True)
                    if len(dd_frames) > 1 else dd_frames[0])
            alld = alld.sort_values(["ts_us", "conv_id", "turn_idx"], kind="mergesort")
            grp = alld.groupby(["window_start_us", "dk1", "dk2"], sort=False)
            dagg = grp.agg(
                ts_us=("ts_us", "first"), conv_id=("conv_id", "first"),
                turn_idx=("turn_idx", "first"), n_copies=("n_copies", "sum"),
            ).reset_index()
            dm = (np.ones(len(dagg), dtype=bool) if flush
                  else (dagg["window_start_us"].to_numpy(dtype=np.int64) + st.width_us) <= wm_us)
            closed_dd = dagg[dm].sort_values(["conv_id", "turn_idx"], kind="mergesort")
            dedup_out = pd.DataFrame(
                {
                    "window_start_us": closed_dd["window_start_us"].to_numpy(dtype=np.int64),
                    "conv_id": closed_dd["conv_id"].to_numpy(),
                    "turn_idx": closed_dd["turn_idx"].to_numpy(dtype=np.int64).astype(np.int32),
                    "ts_us": closed_dd["ts_us"].to_numpy(dtype=np.int64),
                    "n_copies": closed_dd["n_copies"].to_numpy(dtype=np.int64),
                }
            ).reset_index(drop=True)
            st.dedup = dagg[~dm].reset_index(drop=True)[_DEDUP_COLS]
        else:
            dedup_out = pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "conv_id": pd.Series([], dtype=object),
                 "turn_idx": pd.Series([], dtype=np.int32),
                 "ts_us": pd.Series([], dtype=np.int64),
                 "n_copies": pd.Series([], dtype=np.int64)}
            )

        # --- windowed latency histograms: return closed-window partials
        # (driver sums them across shards before the quantile read-out)
        if st.wlat:
            lk = np.asarray(sorted(st.wlat), dtype=np.int64)
            lclosed = np.ones(len(lk), dtype=bool) if flush else (lk + st.width_us) <= wm_us
            wlat_partials = pd.DataFrame(
                {"window_start_us": lk[lclosed],
                 "__hist": [st.wlat[int(k)] for k, c in zip(lk, lclosed) if c]}
            )
            st.wlat = {int(k): st.wlat[int(k)] for k, c in zip(lk, lclosed) if not c}
        else:
            wlat_partials = pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "__hist": pd.Series([], dtype=object)}
            )

        # --- streamed CEP: decide every candidate the watermark has
        # passed (stages/cep.py advance_chain_automaton), prune buffer
        from dataflow_mm_ray.stages.cep import advance_chain_automaton

        cep_frames = ([st.cep_pending] if len(st.cep_pending) else []) + st.cep_chunks
        st.cep_chunks = []
        if cep_frames:
            cep_rows = (pd.concat(cep_frames, ignore_index=True)
                        if len(cep_frames) > 1 else cep_frames[0])
            cep_rows = cep_rows.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            cep_out, st.cep_pending = advance_chain_automaton(
                cep_rows.reset_index(drop=True), st.cep_ptr, st.cep_seq,
                wm_us, st.cep_within_us, flush=flush,
            )
        else:
            from dataflow_mm_ray.stages.cep import _empty_cep_emissions

            cep_out = _empty_cep_emissions()

        # --- streamed absence detection: alert every invocation the
        # watermark has timed out (stages/cep.py advance_absence_automaton)
        from dataflow_mm_ray.stages.cep import (
            _empty_alerts,
            advance_absence_automaton,
        )

        al_frames = ([st.alert_pending] if len(st.alert_pending) else []) + st.alert_chunks
        st.alert_chunks = []
        if al_frames:
            al_rows = (pd.concat(al_frames, ignore_index=True)
                       if len(al_frames) > 1 else al_frames[0])
            al_rows = al_rows.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            alerts_out, st.alert_pending = advance_absence_automaton(
                al_rows.reset_index(drop=True), st.alert_seq,
                wm_us, st.alert_deadline_us, flush=flush,
            )
        else:
            alerts_out = _empty_alerts()

        frames_out = {
            "windows": win_closed,
            "sessions": sessions_out,
            "joins": join_out,
            "sliding": slide_closed,
            "asof": asof_out,
            "cep": cep_out,
            "alerts": alerts_out,
            "upserts": upserts_out,
            "wdedup": dedup_out,
        }

        # --- plugin processors: consolidate chunks into state, let the
        # processor emit what the watermark settled (see
        # streaming/processor.py for the merge/on_watermark contract)
        for pname, proc in self.procs.items():
            chunks = st.proc_chunks.pop(pname, [])
            state = st.proc_state.get(pname)
            if state is None:
                state = proc.init_state()
            if chunks:
                rows = (pd.concat(chunks, ignore_index=True)
                        if len(chunks) > 1 else chunks[0])
                state = proc.merge(state, rows)
            emit, state = proc.on_watermark(state, wm_us, flush)
            st.proc_state[pname] = state
            frames_out[pname] = emit
        if stage_root is None:
            frames_out["wdistinct_partials"] = dcount_out
            frames_out["wtopk_partials"] = wtopk_partials
            frames_out["wlat_partials"] = wlat_partials
            return frames_out

        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        out: dict[str, dict] = {"files": {}, "rows": {}}
        for stream, df in frames_out.items():
            out["rows"][stream] = int(len(df))
            if not len(df):
                out["files"][stream] = []
                continue
            d = os.path.join(stage_root, "staging", stream, f"epoch={epoch}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-shard{self.shard_id:05d}{part_tag}.parquet")
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
            # the manifest the driver commits must never outlive this data
            from dataflow_mm_ray.fsutil import fsync_file_and_dir

            fsync_file_and_dir(path)
            out["files"][stream] = [os.path.relpath(path, stage_root)]
        out["wdistinct_partials"] = dcount_out  # small: merged driver-side
        out["wtopk_partials"] = wtopk_partials  # small: merged driver-side
        out["wlat_partials"] = wlat_partials  # small: merged driver-side
        return out

    # ------------------------------------------------------------------
    def snapshot(self, path: str) -> None:
        write_state_snapshot(self.s, path)
        self._prune_spill_files()

    def _prune_spill_files(self) -> None:
        """Delete spill segments nothing can reference anymore.

        Retained = currently-live segments + everything the last two
        snapshots named (the engine keeps the latest checkpoint plus one
        prior epoch). A freshly resumed shard has no snapshot history,
        so it prunes nothing until two snapshots of its own have
        superseded the on-disk checkpoints it cannot introspect —
        conservative, and bounded: after two epochs the old files are
        reclaimed. Without this, a spilled long run grows
        O(n_epochs x spilled state) on disk.
        """
        if self._spill_dir is None:
            return
        import os

        # compare REAL paths: segment paths restored from a checkpoint
        # carry the spelling of the run that wrote them (./out vs out);
        # raw-string comparison would classify every live segment as
        # unreferenced and delete it
        live = {os.path.realpath(g["path"]) for g in self.s.spill_segments}
        self._snap_refs.append(live)
        if len(self._snap_refs) < 3:
            return
        self._snap_refs = self._snap_refs[-2:]
        keep = live | self._snap_refs[0] | self._snap_refs[1]
        for name in os.listdir(self._spill_dir):
            p = os.path.realpath(os.path.join(self._spill_dir, name))
            if name.endswith(".parquet") and p not in keep:
                try:
                    os.remove(p)
                except OSError:
                    pass

    def restore(self, path: str) -> None:
        self.s = read_state_snapshot(path, *self._cfg)
        # epoch replay re-applies against the restored snapshot
        self._seen_applies.clear()

    # -- state spill (bounded memory for the adversarial arrival drill) --
    #
    # The O(input) state under hash-arrival + infinite lateness is the
    # EVENT buffers (pending joins, as-of, CEP/alert rows, session
    # intervals, windowed-dedup winners, plugin pending) — everything
    # else is O(keys). Spill pages exactly those to bucket-partitioned
    # parquet segments once their resident bytes pass a threshold, with
    # one invariant: any row the watermark could settle is read back
    # BEFORE processing (each segment records the min of its
    # settle-key column; a settleable row implies its segment's min is
    # below wm + margin), so emissions are bit-identical to the
    # never-spilled run and the threshold is content-transparent. The
    # flush epoch — where the r4 100M-turn hash/infinity soak died past
    # 128 GiB — is processed one key-bucket at a time, which is
    # semantically the shard-count-invariance property the test suite
    # already pins (a bucket == a virtual shard). Segment files are
    # kept until the engine's terminal cleanup so checkpoints that
    # reference them stay restorable.

    # section -> (settle-key column, margin kind, bucket rule); the
    # table itself lives at module level (SPILL_BUILTIN) so the rescale
    # splitter shares ONE definition with the shard
    _SPILL_BUILTIN = SPILL_BUILTIN
    _SPILL_CHUNK_OF = {
        "inv": "inv_chunks", "tool": "tool_chunks",
        "asof_pending": "asof_chunks", "cep_pending": "cep_chunks",
        "alert_pending": "alert_chunks", "sessions": "sess_chunks",
        "dedup": "dedup_chunks",
    }
    _CONV_DICTS = ("session_seq", "cep_ptr", "cep_seq", "alert_seq")

    def _spill_margin_us(self, section: str) -> int:
        kind = (self._SPILL_BUILTIN[section][1]
                if section in self._SPILL_BUILTIN else "zero")
        if kind == "gap":
            return self.s.gap_us
        if kind == "width":
            return self.s.width_us
        return 0

    def _bucket_ids(self, df: pd.DataFrame, section: str) -> np.ndarray:
        from dataflow_mm_ray.hashing import partition_ids

        k = self._spill_buckets
        rule = (self._SPILL_BUILTIN[section][2]
                if section in self._SPILL_BUILTIN else "proc")
        if rule == "conv":
            return partition_ids(df["conv_id"].to_numpy(), k)
        if rule == "dk":
            return (df["dk1"].to_numpy(dtype=np.int64).view(np.uint64)
                    % np.uint64(k)).astype(np.int64)
        pname = section.split(":", 1)[1]
        return partition_ids(df[self.procs[pname].route_key].to_numpy(), k)

    @staticmethod
    def _est_bytes(df: pd.DataFrame) -> int:
        n = df.memory_usage(index=False, deep=False).sum()
        # object columns report pointer size only; ~56 B/str is the
        # measured conv_id/tool average — an estimate is all the
        # threshold needs
        n += 56 * len(df) * sum(df.dtypes == object)
        return int(n)

    def _spill_frame(self, section: str, df: pd.DataFrame) -> None:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        key_col = (self._SPILL_BUILTIN[section][0]
                   if section in self._SPILL_BUILTIN else "ts_us")
        min_key = (int(df[key_col].min()) if key_col in df.columns and len(df)
                   else -(1 << 62))
        df = df.copy(deep=False)
        df["__bucket"] = self._bucket_ids(df, section)
        df = df.sort_values("__bucket", kind="mergesort").reset_index(drop=True)
        self._spill_seq += 1
        path = os.path.join(
            self._spill_dir,
            f"{section.replace(':', '_')}-{self._spill_seq:06d}.parquet",
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), path,
            row_group_size=max(1, -(-len(df) // self._spill_buckets)),
        )
        self.s.spill_segments.append(
            {"section": section, "path": path, "min_key": min_key,
             "n": len(df)}
        )

    def _spillable_proc_states(self) -> list[str]:
        # a plugin's state is spill-eligible when it carries the ts_us
        # settle column (the watermark contract: decisions depend only
        # on rows with ts < wm); anything else stays resident
        return [
            p for p, df in self.s.proc_state.items()
            if len(df) and "ts_us" in df.columns
        ]

    def _maybe_spill(self, force: bool = False) -> None:
        if self._spill_dir is None or self._spill_threshold is None:
            return
        st = self.s
        items: list[tuple[int, str]] = []  # (est bytes, section)
        for attr in self._SPILL_BUILTIN:
            df = getattr(st, attr)
            if len(df):
                items.append((self._est_bytes(df), attr))
        for p in self._spillable_proc_states():
            items.append((self._est_bytes(st.proc_state[p]), f"pstate:{p}"))
        total = sum(e for e, _ in items)
        if not force and total <= self._spill_threshold:
            return
        # largest first, stop once resident fits — small buffers (tool
        # carries, near-empty pendings) then avoid the write/read churn
        for est, section in sorted(items, reverse=True):
            if section.startswith("pstate:"):
                p = section[len("pstate:"):]
                self._spill_frame(section, st.proc_state[p])
                st.proc_state[p] = self.procs[p].init_state()
            else:
                df = getattr(st, section)
                self._spill_frame(section, df)
                setattr(st, section, df.iloc[0:0].reset_index(drop=True))
            total -= est
            if not force and total <= self._spill_threshold:
                break

    def _unspill(self, wm_us: int) -> None:
        """Read back every segment the watermark could now settle into
        (or that has no settle key) — BEFORE processing, so spilling is
        invisible to emissions."""
        st = self.s
        keep = []
        for seg in st.spill_segments:
            if seg["min_key"] >= wm_us + self._spill_margin_us(seg["section"]):
                keep.append(seg)
                continue
            df = self._read_segment(seg["path"])
            self._attach(st, seg["section"], df)
        st.spill_segments = keep

    @staticmethod
    def _read_segment(path: str, bucket: int | None = None) -> pd.DataFrame:
        import pyarrow.parquet as pq

        filters = [("__bucket", "=", bucket)] if bucket is not None else None
        t = pq.read_table(path, filters=filters)
        return t.drop_columns(["__bucket"]).to_pandas()

    def _attach(self, st: "_ShardState", section: str, df: pd.DataFrame) -> None:
        if not len(df):
            return
        if section in self._SPILL_BUILTIN:
            cur = getattr(st, section)
            setattr(st, section,
                    df if not len(cur)
                    else pd.concat([cur, df], ignore_index=True))
        elif section.startswith("pstate:"):
            p = section[len("pstate:"):]
            cur = st.proc_state.get(p)
            # state frames union by concat — the same recombination
            # contract rescale relies on (streaming/rescale.py)
            st.proc_state[p] = (df if cur is None or not len(cur)
                                else pd.concat([cur, df], ignore_index=True))
        elif section.startswith("prows:"):
            st.proc_chunks.setdefault(section[len("prows:"):], []).append(df)
        else:
            raise ValueError(f"unknown spill section {section!r}")

    def _bucketed_flush(self, wm_us: int, stage_root: str | None,
                        epoch: int | None) -> dict:
        from dataflow_mm_ray.hashing import partition_ids

        st = self.s
        # fold the final epoch's staged chunks into the spillable frames
        for attr, chunk_attr in self._SPILL_CHUNK_OF.items():
            chunks = getattr(st, chunk_attr)
            if chunks:
                frames = ([getattr(st, attr)] if len(getattr(st, attr)) else []) + chunks
                setattr(st, attr,
                        pd.concat(frames, ignore_index=True)
                        if len(frames) > 1 else frames[0])
                setattr(st, chunk_attr, [])
        for pname, chunks in list(st.proc_chunks.items()):
            if chunks:
                rows = (pd.concat(chunks, ignore_index=True)
                        if len(chunks) > 1 else chunks[0])
                self._spill_frame(f"prows:{pname}", rows)
        st.proc_chunks = {}
        # move every remaining spillable row to bucket-partitioned
        # segments, then flush one bucket at a time
        self._maybe_spill(force=True)
        k = self._spill_buckets
        dict_ids = {
            d: (np.asarray(list(getattr(st, d)), dtype=object),
                partition_ids(np.asarray(list(getattr(st, d)), dtype=object), k))
            for d in self._CONV_DICTS + ("asof_last",)
            if getattr(st, d)
        }
        union = _ShardState(*self._cfg)
        merged: dict | None = None
        # conv-keyed resident aggregates (window/sliding partials,
        # upsert revision carries) are bucket-SLICED like the spilled
        # buffers — consolidating 10^8 partial rows in one sub-run was
        # the remaining flush memory spike; window-keyed partials and
        # non-ts plugin state (both O(small)) go to bucket 0 whole
        conv_sliced: dict[str, tuple] = {}
        for attr in ("windows", "swindows", "upsert_rev"):
            frames = [getattr(st, attr)]
            if attr == "windows":
                frames += st.win_chunks
                st.win_chunks = []
            elif attr == "swindows":
                frames += st.slide_chunks
                st.slide_chunks = []
            frames = [f for f in frames if len(f)]
            if not frames:
                continue
            df = (pd.concat(frames, ignore_index=True)
                  if len(frames) > 1 else frames[0])
            conv_sliced[attr] = (df, partition_ids(df["conv_id"].to_numpy(), k))
        for b in range(k):
            sub = _ShardState(*self._cfg)
            if b == 0:
                for attr in ("wtopk", "wtopk_chunks", "dcount",
                             "dcount_chunks", "wlat"):
                    setattr(sub, attr, getattr(st, attr))
                # after the force-spill every spill-eligible plugin
                # state is empty; whatever is still resident (no ts_us
                # settle column) is processed once, here
                for pname, pdf in st.proc_state.items():
                    if len(pdf):
                        sub.proc_state[pname] = pdf
            for attr, (df, ids) in conv_sliced.items():
                piece = df[ids == b]
                if len(piece):
                    setattr(sub, attr, piece.reset_index(drop=True))
            for seg in st.spill_segments:
                self._attach(sub, seg["section"],
                             self._read_segment(seg["path"], bucket=b))
            for d, (keys, ids) in dict_ids.items():
                src = getattr(st, d)
                setattr(sub, d, {kk: src[kk] for kk in keys[ids == b]})
            out_b = self._finalize_state(sub, wm_us, True, stage_root, epoch,
                                         part_tag=f"-b{b:03d}")
            merged = self._merge_out(merged, out_b)
            # fold sub leftovers (post-flush residue + updated dicts)
            for attr in _STATE_FRAMES:
                leftover = getattr(sub, attr)
                if len(leftover):
                    cur = getattr(union, attr)
                    setattr(union, attr,
                            leftover if not len(cur)
                            else pd.concat([cur, leftover], ignore_index=True))
            for d in self._CONV_DICTS + ("asof_last",):
                getattr(union, d).update(getattr(sub, d))
            union.dcount.update(sub.dcount)
            union.wlat.update(sub.wlat)
            for pname, pdf in sub.proc_state.items():
                cur = union.proc_state.get(pname)
                union.proc_state[pname] = (
                    pdf if cur is None or not len(cur)
                    else pd.concat([cur, pdf], ignore_index=True))
        self.s = union
        return merged

    @staticmethod
    def _merge_out(a: dict | None, b: dict) -> dict:
        if a is None:
            return b
        for key, v in b.items():
            if key == "files":
                for s_, fl in v.items():
                    a["files"].setdefault(s_, []).extend(fl)
            elif key == "rows":
                for s_, n_ in v.items():
                    a["rows"][s_] = a["rows"].get(s_, 0) + n_
            else:
                prev = a.get(key)
                if prev is None or not len(prev):
                    a[key] = v
                elif len(v):
                    a[key] = pd.concat([prev, v], ignore_index=True)
        return a

    def stats(self) -> dict:
        st = self.s
        return {
            "open_windows": int(len(st.windows)) + sum(len(c) for c in st.win_chunks),
            "open_sliding": int(len(st.swindows)) + sum(len(c) for c in st.slide_chunks),
            "open_sessions": int(len(st.sessions)) + sum(len(c) for c in st.sess_chunks),
            "pending_inv": int(len(st.inv)) + sum(len(c) for c in st.inv_chunks),
            "pending_tool": int(len(st.tool)) + sum(len(c) for c in st.tool_chunks),
            "pending_asof": int(len(st.asof_pending)) + sum(len(c) for c in st.asof_chunks),
            "pending_cep": int(len(st.cep_pending)) + sum(len(c) for c in st.cep_chunks),
            "pending_alerts": int(len(st.alert_pending)) + sum(len(c) for c in st.alert_chunks),
            "open_dcount_windows": int(len(st.dcount)) + sum(len(c) for c in st.dcount_chunks),
            "open_wtopk_rows": int(len(st.wtopk)) + sum(len(c) for c in st.wtopk_chunks),
            "open_wlat_windows": int(len(st.wlat)),
            "open_dedup_keys": int(len(st.dedup)) + sum(len(c) for c in st.dedup_chunks),
        } | (
            {
                "open_proc_rows": {
                    p: int(len(st.proc_state.get(p, ())))
                    + sum(len(c) for c in st.proc_chunks.get(p, ()))
                    for p in self.procs
                }
            }
            if self.procs
            else {}
        )
