"""User-extensible stateful stream processors (the engine's
``mapGroupsWithState`` analog).

The built-in output streams (windows, sessions, joins, CEP, ...) are
fixed pipelines compiled into the engine. A :class:`StatefulProcessor`
is the same machinery exposed as a plugin: a keyed, watermark-driven
state transform that rides the engine's distributed extract -> shard
apply -> finalize -> exactly-once 2PC commit path, with its state
snapshotted into every checkpoint (resume is automatic, nothing extra
to implement).

Contract (all frames are pandas, all callables must be deterministic
and VECTORIZED — a processor that loops rows in ``extract`` will be
the slowest stage of the epoch):

- ``name``       — the output stream name; becomes a first-class sink
  stream (``staging/<name>/epoch=K`` + manifests). Must not collide
  with a built-in stream.
- ``route_key``  — column OF THE EXTRACTED FRAME whose stable hash
  routes rows to state shards. Everything with equal ``route_key``
  lands on one shard (that is the co-location guarantee the merge can
  rely on); pick the coarsest key that still co-locates your state
  (conv_id for per-conversation state, window_start_us for global
  per-window state, a content hash for dedup-like state).
- ``extract(rows)``   — runs INSIDE the distributed epoch-scan map
  task on the engine's extract frame (columns: conv_id, turn_idx,
  role, tool, ts_us, text_len, is_click, window_start_us — never raw
  text; hash content upstream like the wdedup stream if you need
  identity). Acts as the per-batch combiner: return pre-aggregated
  rows, not raw turns, whenever the state is additive.
- ``init_state()``    — the empty state frame (stable schema).
- ``merge(state, rows)`` — fold newly-arrived extracted rows into
  state. Within an epoch, applies are unordered and may be split
  across many batches: merge MUST be commutative+associative over row
  multisets (sums, min/max, set-union — not "latest seen").
- ``on_watermark(state, wm_us, flush)`` — called once per epoch after
  the barrier with the advanced watermark; returns
  ``(emit, new_state)``. Emit everything the watermark has settled
  (and everything at ``flush=True``, the end-of-stream tick); rows
  kept in ``new_state`` may still change. Emitted frames must be
  deterministically ordered (sort by your key) — committed bytes are
  compared across reruns and resumes.

Exactly-once: the engine stamps every shipped row-group with a
content-derived apply id (replays from retried map tasks are dropped
by the shard) and commits emissions through the per-epoch 2PC sink,
so a processor inherits the same guarantees as the built-in streams
without doing anything. Checkpoint/restore writes the state frame as
an Arrow section of the shard snapshot (state/store.py
write_state_snapshot); a resumed run replays the in-flight epoch
against the restored state (idempotent by the apply-id dedup).

Reference anchor: this generalizes DataFlow-MM's FunctionalRefiner UDF
hook (operators/general_text/refine/functional_refiner.py) from a
stateless per-row map to keyed, watermark-driven state — the operator
surface its pipelines lack for continuous queries.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.groupsum import group_sum, group_sum_df

US = 1_000_000


class StatefulProcessor:
    """Base class; subclass and pass instances to
    ``StreamingEngine(processors=[...])``."""

    #: output stream name (unique, not a built-in stream)
    name: str
    #: column of the EXTRACTED frame to shard-route on
    route_key: str = "conv_id"

    def extract(self, rows: pd.DataFrame) -> pd.DataFrame:
        """Map one scan batch's non-late extract rows to the rows this
        processor ships to its shards (per-batch combiner)."""
        raise NotImplementedError

    def init_state(self) -> pd.DataFrame:
        raise NotImplementedError

    def merge(self, state: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError

    def on_watermark(
        self, state: pd.DataFrame, wm_us: int, flush: bool
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Shipped processors — both demos AND the API's conformance fixtures
# (tests/test_processors.py pins them frame-equal to batch kernels).
# ---------------------------------------------------------------------------


class GlobalDedupFirst(StatefulProcessor):
    """Global (non-windowed) exact dedup as a continuous query — the
    ``dropDuplicates``-without-watermark shape: emit the FIRST event-time
    occurrence of every content key, exactly once, across the whole
    stream.

    Complements the built-in windowed ``wdedup`` stream (first per
    (window, key)) and the batch ``dedup_exact`` query (first per key in
    (conv_id, turn_idx) order): here the winner is the minimum
    ``(ts_us, conv_id, turn_idx)`` per content key, because event time is
    the only order a watermark can settle. Batch twin:
    ``dedup_first_event_time`` (SQL-oracled).

    Mechanics: routes on the engine-computed content-key hash ``dk1``
    (the extract frame ships 2x64-bit hashes of the id-stripped text,
    never strings — engine._extract), so all copies of a key co-locate.
    A key's winner candidate is emitted once ``ts_us < watermark``:
    later epochs quarantine rows below the watermark, so no applied row
    can ever beat a strictly-settled candidate (ties at ``ts == wm``
    are held one more epoch). State keeps one row per key seen —
    candidates until settled, then tombstones (``emitted=True``) so a
    key never re-emits; memory is O(distinct keys), the semantic floor
    of global dedup (cap the horizon with the windowed ``wdedup``
    stream when the key universe is unbounded)."""

    name = "gdedup"
    route_key = "dk1"
    _COLS = ("dk1", "dk2", "conv_id", "turn_idx", "ts_us")
    _ORDER = ["dk1", "dk2", "emitted", "ts_us", "conv_id", "turn_idx"]
    _ASC = [True, True, False, True, True, True]

    def _empty(self, with_emitted: bool = True) -> pd.DataFrame:
        d = {
            "dk1": pd.Series([], dtype=np.int64),
            "dk2": pd.Series([], dtype=np.int64),
            "conv_id": pd.Series([], dtype=object),
            "turn_idx": pd.Series([], dtype=np.int32),
            "ts_us": pd.Series([], dtype=np.int64),
        }
        if with_emitted:
            d["emitted"] = pd.Series([], dtype=bool)
        return pd.DataFrame(d)

    def extract(self, rows: pd.DataFrame) -> pd.DataFrame:
        cand = pd.DataFrame(
            {
                "dk1": rows["dk1"].to_numpy(dtype=np.int64),
                "dk2": rows["dk2"].to_numpy(dtype=np.int64),
                "conv_id": rows["conv_id"].to_numpy(),
                "turn_idx": rows["turn_idx"].to_numpy(dtype=np.int32),
                "ts_us": rows["ts_us"].to_numpy(dtype=np.int64),
            }
        )
        cand["emitted"] = False
        # per-batch combiner: one candidate (the local winner) per key
        return cand.sort_values(
            self._ORDER, ascending=self._ASC, kind="mergesort"
        ).drop_duplicates(["dk1", "dk2"], keep="first")

    def init_state(self) -> pd.DataFrame:
        return self._empty()

    def merge(self, state: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([state, rows], ignore_index=True) if len(state) else rows
        # per key: an emitted tombstone beats everything (emitted sorts
        # first), else the lexicographic-min candidate wins — a pure
        # min-reduce, commutative over row multisets
        return (
            both.sort_values(self._ORDER, ascending=self._ASC, kind="mergesort")
            .drop_duplicates(["dk1", "dk2"], keep="first")
            .reset_index(drop=True)
        )

    def on_watermark(self, state, wm_us, flush):
        if not len(state):
            return self._empty(with_emitted=False), state
        settled = ~state["emitted"].to_numpy(dtype=bool)
        if not flush:
            settled &= state["ts_us"].to_numpy(dtype=np.int64) < wm_us
        emit = (
            state[settled]
            .sort_values(["dk1", "dk2"], kind="mergesort")
            .reset_index(drop=True)[list(self._COLS)]
        )
        new_state = state.assign(
            emitted=state["emitted"].to_numpy(dtype=bool) | settled
        )
        return emit, new_state.reset_index(drop=True)


class WindowRoleCounts(StatefulProcessor):
    """Per-(tumbling window, role) turn counts, emitted at window close.

    Routes on ``window_start_us`` — a GLOBAL per-window aggregate (not
    per-conversation), so all of a window's rows must co-locate; with
    hour-wide windows the key space is large enough that shards stay
    balanced. State is at most (open windows x roles) rows."""

    name = "wroles"
    route_key = "window_start_us"
    _COLS = ("window_start_us", "role", "n_turns")

    def __init__(self, width_s: int = 3600):
        self.width_us = width_s * US

    def _empty(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start_us": pd.Series([], dtype=np.int64),
                "role": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
            }
        )

    def extract(self, rows: pd.DataFrame) -> pd.DataFrame:
        return group_sum(
            {
                "window_start_us": rows["window_start_us"].to_numpy(dtype=np.int64),
                "role": rows["role"].to_numpy(),
            },
            {"n_turns": np.ones(len(rows), dtype=np.int64)},
        )

    def init_state(self) -> pd.DataFrame:
        return self._empty()

    def merge(self, state: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([state, rows], ignore_index=True) if len(state) else rows
        return group_sum_df(both, ["window_start_us", "role"], ["n_turns"])

    def on_watermark(self, state, wm_us, flush):
        if not len(state):
            return self._empty(), state
        closed = (
            np.ones(len(state), dtype=bool)
            if flush
            else (state["window_start_us"].to_numpy(dtype=np.int64) + self.width_us)
            <= wm_us
        )
        emit = (
            state[closed]
            .sort_values(["window_start_us", "role"], kind="mergesort")
            .reset_index(drop=True)[list(self._COLS)]
        )
        return emit, state[~closed].reset_index(drop=True)


class ConvSpan(StatefulProcessor):
    """Per-conversation lifetime span: first/last event-time and turn
    count, emitted once at end-of-stream (``flush``).

    The flush-only shape: state is one row per live conversation for
    the whole run (min/max/sum merges — commutative), nothing settles
    before the stream ends because any conversation may still grow."""

    name = "convspan"
    route_key = "conv_id"
    _COLS = ("conv_id", "first_ts_us", "last_ts_us", "n_turns", "span_us")

    def _empty_state(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "first_ts_us": pd.Series([], dtype=np.int64),
                "last_ts_us": pd.Series([], dtype=np.int64),
                "n_turns": pd.Series([], dtype=np.int64),
            }
        )

    @staticmethod
    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("conv_id", sort=False)
            .agg(
                first_ts_us=("first_ts_us", "min"),
                last_ts_us=("last_ts_us", "max"),
                n_turns=("n_turns", "sum"),
            )
            .reset_index()
        )

    def extract(self, rows: pd.DataFrame) -> pd.DataFrame:
        ts = rows["ts_us"].to_numpy(dtype=np.int64)
        return self._agg(
            pd.DataFrame(
                {
                    "conv_id": rows["conv_id"].to_numpy(),
                    "first_ts_us": ts,
                    "last_ts_us": ts,
                    "n_turns": np.ones(len(rows), dtype=np.int64),
                }
            )
        )

    def init_state(self) -> pd.DataFrame:
        return self._empty_state()

    def merge(self, state: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([state, rows], ignore_index=True) if len(state) else rows
        return self._agg(both)

    def on_watermark(self, state, wm_us, flush):
        if not flush:
            return (
                pd.DataFrame(
                    {
                        "conv_id": pd.Series([], dtype=object),
                        "first_ts_us": pd.Series([], dtype=np.int64),
                        "last_ts_us": pd.Series([], dtype=np.int64),
                        "n_turns": pd.Series([], dtype=np.int64),
                        "span_us": pd.Series([], dtype=np.int64),
                    }
                ),
                state,
            )
        emit = state.sort_values("conv_id", kind="mergesort").reset_index(drop=True)
        emit = emit.assign(
            span_us=emit["last_ts_us"].to_numpy(dtype=np.int64)
            - emit["first_ts_us"].to_numpy(dtype=np.int64)
        )[list(self._COLS)]
        return emit, self._empty_state()


class IncidentIntervalCount(StatefulProcessor):
    """Streamed stream-stream INTERVAL JOIN (the Flink interval-join /
    Spark range-join shape): every settled turn is emitted exactly once
    with the number of open incident intervals
    ``[error_ts, error_ts + width_s)`` of its own conversation that
    contain the turn's event time. Both sides are the same keyed stream
    (an ``error``-typed turn opens an interval AND is itself a probe),
    routed on ``conv_id`` so probes meet every interval they can match.

    Batch twin: the SQL-oracled ``range_join_incidents`` query
    (stages/temporal.py incident_count_kernel — the same merged
    boundary sweep run per hash(user_id) partition). Reference anchor:
    DataFlow-MM has no temporal join; this is the continuous form of
    the engine's own batch operator (SURVEY §2.7).

    Watermark argument for exactly-once correctness: a probe settles at
    the first watermark with ``ts < wm``. Any non-late incident with
    ``start <= ts`` has ``start < wm`` too, so it was applied in this or
    an earlier epoch (later arrivals below the watermark are quarantined
    as late before reaching any shard). Incidents retire from state once
    ``start + width <= wm`` — every unsettled probe has ``ts >= wm``, so
    a retired interval can never contain one. State is therefore
    O(open intervals + in-flight probes), independent of stream length.

    ``needs = ("is_error",)``: the scan ships a boolean next to the
    extract columns (text prefix ``'error '`` — equal to the events
    table's ``event_type = 'error'`` whenever props is non-null, which
    the synthetic tables guarantee; a NULL text is falsy on both sides).
    """

    name = "rjoin"
    route_key = "conv_id"
    needs = ("is_error",)
    _EMIT_COLS = ("conv_id", "turn_idx", "n_open_incidents")

    def __init__(self, width_s: int = 1800):
        self.width_us = int(width_s) * US

    @staticmethod
    def _empty_state() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "ts_us": pd.Series([], dtype=np.int64),
                # kind 0 = interval source (error turn), 1 = probe
                "kind": pd.Series([], dtype=np.int8),
            }
        )

    @classmethod
    def _empty_emit(cls) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "n_open_incidents": pd.Series([], dtype=np.int64),
            }
        )[list(cls._EMIT_COLS)]

    def extract(self, rows: pd.DataFrame) -> pd.DataFrame:
        conv = rows["conv_id"].to_numpy()
        turn = rows["turn_idx"].to_numpy(dtype=np.int32)
        ts = rows["ts_us"].to_numpy(dtype=np.int64)
        err = rows["is_error"].to_numpy(dtype=bool)
        probes = pd.DataFrame(
            {"conv_id": conv, "turn_idx": turn, "ts_us": ts,
             "kind": np.ones(len(rows), dtype=np.int8)}
        )
        if not err.any():
            return probes
        sources = pd.DataFrame(
            {"conv_id": conv[err], "turn_idx": turn[err], "ts_us": ts[err],
             "kind": np.zeros(int(err.sum()), dtype=np.int8)}
        )
        return pd.concat([sources, probes], ignore_index=True)

    def init_state(self) -> pd.DataFrame:
        return self._empty_state()

    def merge(self, state: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        # pure multiset union; the sweep happens at the watermark
        both = pd.concat([state, rows], ignore_index=True) if len(state) else rows
        return both.reset_index(drop=True)

    def on_watermark(self, state, wm_us, flush):
        if not len(state):
            return self._empty_emit(), state
        kind = state["kind"].to_numpy(dtype=np.int8)
        ts_all = state["ts_us"].to_numpy(dtype=np.int64)
        is_probe = kind == 1
        settled = is_probe if flush else is_probe & (ts_all < wm_us)
        newly = state[settled]
        # interval retention: start + width > wm can still contain a
        # future probe (every unsettled probe has ts >= wm); flush ends
        # the stream, nothing survives
        keep_src = (
            np.zeros(len(state), dtype=bool)
            if flush
            else (~is_probe) & (ts_all + self.width_us > wm_us)
        )
        new_state = state[keep_src | (is_probe & ~settled)].reset_index(drop=True)
        if not len(newly):
            return self._empty_emit(), new_state

        src = state[~is_probe]
        ni, npr = len(src), len(newly)
        i_ts = src["ts_us"].to_numpy(dtype=np.int64)
        p_ts = newly["ts_us"].to_numpy(dtype=np.int64)
        # merged boundary sweep, segmented per conversation (the batch
        # kernel's layout: boundaries kind 0 apply their delta before
        # any equal-time read -> start <= ts inclusive, ts < end
        # exclusive)
        conv_cat = np.concatenate(
            [src["conv_id"].to_numpy()] * 2 + [newly["conv_id"].to_numpy()]
        )
        codes, _ = pd.factorize(conv_cat, sort=False)
        m_t = np.concatenate([i_ts, i_ts + self.width_us, p_ts])
        m_kind = np.concatenate(
            [np.zeros(2 * ni, dtype=np.int8), np.ones(npr, dtype=np.int8)]
        )
        m_delta = np.concatenate(
            [np.ones(ni, dtype=np.int64), -np.ones(ni, dtype=np.int64),
             np.zeros(npr, dtype=np.int64)]
        )
        m_qidx = np.concatenate(
            [np.full(2 * ni, -1, dtype=np.int64), np.arange(npr, dtype=np.int64)]
        )
        order = np.lexsort((m_kind, m_t, codes))
        s_codes, s_delta, s_qidx = codes[order], m_delta[order], m_qidx[order]
        cum = np.cumsum(s_delta)
        starts = np.empty(len(s_codes), dtype=bool)
        starts[0] = True
        starts[1:] = s_codes[1:] != s_codes[:-1]
        base = (cum - s_delta)[starts]
        seg = cum - base[np.cumsum(starts) - 1]
        q = s_qidx >= 0
        counts = np.zeros(npr, dtype=np.int64)
        counts[s_qidx[q]] = seg[q]

        emit = pd.DataFrame(
            {
                "conv_id": newly["conv_id"].to_numpy(),
                "turn_idx": newly["turn_idx"].to_numpy(dtype=np.int32),
                "n_open_incidents": counts,
            }
        )
        emit = emit.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )[list(self._EMIT_COLS)]
        return emit, new_state


class SimhashNearDupFirst(StatefulProcessor):
    """Streaming NEAR-duplicate detection: emit, exactly once, every
    turn that is within ``max_hamming`` SimHash bits of its band
    bucket's event-time-FIRST turn — the continuous-query complement of
    the batch ``simhash_dedup`` first-wins scan (stages/neardup.py), and
    the near-dup extension of :class:`GlobalDedupFirst` (hamming 0 over
    an exact key there; small edit distances collapse here).

    Contract (the honest streamable unit): the 64-bit signature splits
    into 4x16-bit bands; a turn is routed once per band to the shard
    owning that (band, bucket) — near-dup pairs share at least one band
    for hamming <= 3 (pigeonhole), so every such pair meets on some
    shard. Per bucket the state keeps ONE winner (minimum
    (ts_us, conv_id, turn_idx), fixed forever once settled — any later
    applied row has ts >= the settling watermark); every other settled
    turn in the bucket emits one edge row to that winner iff the full
    64-bit Hamming distance <= ``max_hamming``. A pair colliding in
    several bands emits one edge per colliding band (bands live on
    different shards; consumers dedupe on the pair columns when a
    band-agnostic edge set is wanted — the batch twin
    ``simhash_neardup_first`` has the same per-band contract).

    Requires the engine to ship ``sh64`` (``needs``): the SimHash of
    the id-stripped text, computed in the scan next to dk1/dk2. State
    is O(#buckets + in-flight rows); emissions are O(near-dup rows x
    colliding bands)."""

    name = "sdup"
    route_key = "bb"
    needs = ("sh64",)
    _EMIT_COLS = ("band", "bucket", "winner_conv_id", "winner_turn_idx",
                  "winner_ts_us", "conv_id", "turn_idx", "ts_us", "hamming")

    def __init__(self, max_hamming: int = 3):
        self.max_hamming = int(max_hamming)

    @staticmethod
    def _empty_state() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bb": pd.Series([], dtype=np.int64),
                "sh64": pd.Series([], dtype=np.int64),
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "ts_us": pd.Series([], dtype=np.int64),
                "is_winner": pd.Series([], dtype=bool),
            }
        )

    @classmethod
    def _empty_emit(cls) -> pd.DataFrame:
        d = {
            "band": pd.Series([], dtype=np.int32),
            "bucket": pd.Series([], dtype=np.int64),
            "winner_conv_id": pd.Series([], dtype=object),
            "winner_turn_idx": pd.Series([], dtype=np.int32),
            "winner_ts_us": pd.Series([], dtype=np.int64),
            "conv_id": pd.Series([], dtype=object),
            "turn_idx": pd.Series([], dtype=np.int32),
            "ts_us": pd.Series([], dtype=np.int64),
            "hamming": pd.Series([], dtype=np.int64),
        }
        return pd.DataFrame(d)[list(cls._EMIT_COLS)]

    def extract(self, rows: pd.DataFrame) -> pd.DataFrame:
        sig = rows["sh64"].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(rows)
        conv = rows["conv_id"].to_numpy()
        turn = rows["turn_idx"].to_numpy(dtype=np.int32)
        ts = rows["ts_us"].to_numpy(dtype=np.int64)
        parts = []
        for band in range(4):
            slice_ = ((sig >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {
                        "bb": (np.int64(band) << np.int64(16)) | slice_,
                        "sh64": sig.view(np.int64),
                        "conv_id": conv,
                        "turn_idx": turn,
                        "ts_us": ts,
                        "is_winner": np.zeros(n, dtype=bool),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def init_state(self) -> pd.DataFrame:
        return self._empty_state()

    def merge(self, state: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        # pure multiset union — every pending row is a potential edge
        # emission, the reduction happens at the watermark
        both = pd.concat([state, rows], ignore_index=True) if len(state) else rows
        return both.reset_index(drop=True)

    def on_watermark(self, state, wm_us, flush):
        from dataflow_mm_ray.stages.neardup import _popcount64

        if not len(state):
            return self._empty_emit(), state
        is_w = state["is_winner"].to_numpy(dtype=bool)
        pending = state[~is_w]
        winners = state[is_w]
        if flush:
            newly, still = pending, pending.iloc[0:0]
        else:
            m = pending["ts_us"].to_numpy(dtype=np.int64) < wm_us
            newly, still = pending[m], pending[~m]
        if not len(newly):
            return self._empty_emit(), state.reset_index(drop=True)

        # crown a winner for every bucket that lacks one: the minimum
        # (ts, conv, turn) among the newly-settled rows (an existing
        # winner always predates them — it settled under a smaller wm)
        cand = newly.sort_values(["bb", "ts_us", "conv_id", "turn_idx"],
                                 kind="mergesort")
        first = cand.drop_duplicates("bb", keep="first")
        crowns = first[~first["bb"].isin(winners["bb"])].assign(is_winner=True)
        all_w = (pd.concat([winners, crowns], ignore_index=True)
                 if len(crowns) else winners)

        wcols = all_w[["bb", "sh64", "conv_id", "turn_idx", "ts_us"]].rename(
            columns={"sh64": "w_sh64", "conv_id": "winner_conv_id",
                     "turn_idx": "winner_turn_idx", "ts_us": "winner_ts_us"}
        )
        j = newly.merge(wcols, on="bb", how="left")
        self_mask = (
            (j["conv_id"] == j["winner_conv_id"]).to_numpy(dtype=bool)
            & (j["turn_idx"].to_numpy(dtype=np.int64)
               == j["winner_turn_idx"].to_numpy(dtype=np.int64))
            & (j["ts_us"].to_numpy(dtype=np.int64)
               == j["winner_ts_us"].to_numpy(dtype=np.int64))
        )
        losers = j[~self_mask]
        ham = _popcount64(
            losers["sh64"].to_numpy(dtype=np.int64).view(np.uint64)
            ^ losers["w_sh64"].to_numpy(dtype=np.int64).view(np.uint64)
        )
        keep = ham <= self.max_hamming
        close = losers[keep]
        bb = close["bb"].to_numpy(dtype=np.int64)
        emit = pd.DataFrame(
            {
                "band": (bb >> 16).astype(np.int32),
                "bucket": (bb & np.int64(0xFFFF)).astype(np.int64),
                "winner_conv_id": close["winner_conv_id"].to_numpy(),
                "winner_turn_idx": close["winner_turn_idx"].to_numpy(dtype=np.int32),
                "winner_ts_us": close["winner_ts_us"].to_numpy(dtype=np.int64),
                "conv_id": close["conv_id"].to_numpy(),
                "turn_idx": close["turn_idx"].to_numpy(dtype=np.int32),
                "ts_us": close["ts_us"].to_numpy(dtype=np.int64),
                "hamming": ham[keep].astype(np.int64),
            }
        )
        emit = emit.sort_values(list(self._EMIT_COLS), kind="mergesort").reset_index(
            drop=True
        )[list(self._EMIT_COLS)]
        new_state = pd.concat([all_w, still], ignore_index=True).reset_index(drop=True)
        return emit, new_state
