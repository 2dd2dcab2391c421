"""Keyed state-store actors for the streaming engine.

One ``StateShard`` actor owns all per-conversation state for the
conversations hashing to its shard: tumbling-window partials, open
session intervals, and pending tool-join state. This is the engine's
equivalent of the reference's per-worker persistent state (model pools
initialized once per process — ``audio_ctc...evaluator.py:46-53``; the
in-operator dedup caches of ``image_diversity_filter.py:17-26``) made
explicit, bounded, and snapshot-able.

Watermark discipline (the determinism contract):

- lateness is decided *before* rows reach a shard (uniformly,
  ``ts < watermark`` at arrival — the engine quarantines late rows
  vectorized in map_batches); every row a shard applies has
  ``ts >= wm_prev``;
- ``finalize(wm)`` emits exactly the constructs no non-late row can
  still extend: windows with ``window_end <= wm``, sessions with
  ``session_end + gap < wm``, join matches whose response ``ts <= wm``;
- every emission is a pure function of (applied rows, wm), so replays
  after restore produce identical emissions.

State is bounded: finalized windows/sessions are deleted, matched
invocations are deleted, and tool-response turns with ``ts <= wm`` are
garbage-collected after finalize (no future invocation can precede
them — turn_idx order equals ts order within a conversation).

Snapshots are pickle files written by ``snapshot(path)`` and restored
with ``restore(path)``; the engine commits them together with its
checkpoint manifest.
"""
from __future__ import annotations

import pickle
from bisect import insort

import numpy as np
import pandas as pd
import ray

US = 1_000_000


class _ShardState:
    """Plain-python state container (separable from the actor for
    unit tests and snapshot round-trips)."""

    def __init__(self, width_s: int, gap_s: int, slide_width_s: int = 0):
        self.width_us = width_s * US
        self.gap_us = gap_s * US
        self.slide_width_us = slide_width_s * US  # 0 -> sliding disabled
        # (conv_id, window_start_us) -> [n_turns, n_user, n_tool, sum_chars]
        self.windows: dict[tuple[str, int], list[int]] = {}
        # sliding replicas: (conv_id, window_start_us) -> [n_turns, sum_chars]
        self.swindows: dict[tuple[str, int], list[int]] = {}
        # conv_id -> sorted list of open sessions [start_us, end_us, n_turns]
        self.sessions: dict[str, list[list[int]]] = {}
        # conv_id -> number of sessions already finalized (session_id base)
        self.session_seq: dict[str, int] = {}
        # conv_id -> {"inv": [[turn_idx, tool, ts_us]], "tool": [[turn_idx, ts_us]]}
        self.join: dict[str, dict[str, list]] = {}


@ray.remote
class StateShard:
    def __init__(self, shard_id: int, width_s: int, gap_s: int, slide_width_s: int = 0):
        self.shard_id = shard_id
        self.s = _ShardState(width_s, gap_s, slide_width_s)

    # ------------------------------------------------------------------
    def apply(
        self,
        window_partials: pd.DataFrame | None,
        turns: pd.DataFrame | None,
        join_events: pd.DataFrame | None,
        sliding_partials: pd.DataFrame | None = None,
    ) -> int:
        """Apply one epoch's (pre-aggregated, non-late) rows.
        Returns rows applied (for engine metrics)."""
        st = self.s
        n = 0

        if window_partials is not None and len(window_partials):
            n += len(window_partials)
            for row in window_partials.itertuples(index=False):
                key = (row.conv_id, int(row.window_start_us))
                acc = st.windows.get(key)
                if acc is None:
                    st.windows[key] = [int(row.n_turns), int(row.n_user_turns),
                                       int(row.n_tool_calls), int(row.sum_chars)]
                else:
                    acc[0] += int(row.n_turns)
                    acc[1] += int(row.n_user_turns)
                    acc[2] += int(row.n_tool_calls)
                    acc[3] += int(row.sum_chars)

        if sliding_partials is not None and len(sliding_partials):
            n += len(sliding_partials)
            for row in sliding_partials.itertuples(index=False):
                key = (row.conv_id, int(row.window_start_us))
                acc = st.swindows.get(key)
                if acc is None:
                    st.swindows[key] = [int(row.n_turns), int(row.sum_chars)]
                else:
                    acc[0] += int(row.n_turns)
                    acc[1] += int(row.sum_chars)

        if turns is not None and len(turns):
            n += len(turns)
            for conv, g in turns.groupby("conv_id", sort=False):
                sess = st.sessions.setdefault(conv, [])
                for t in np.sort(g["ts_us"].to_numpy()):
                    self._insert_session(sess, int(t))

        if join_events is not None and len(join_events):
            n += len(join_events)
            for row in join_events.itertuples(index=False):
                j = st.join.setdefault(row.conv_id, {"inv": [], "tool": []})
                if row.kind == "inv":
                    insort(j["inv"], [int(row.turn_idx), row.tool, int(row.ts_us)])
                else:
                    insort(j["tool"], [int(row.turn_idx), int(row.ts_us)])
        return n

    @staticmethod
    def _insert_session(sess: list[list[int]], t: int) -> None:
        """Insert a turn as a unit interval; intervals are merged lazily
        (gap rule) at the start of every finalize, so the per-epoch cost
        is one sort + one linear merge per conversation."""
        insort(sess, [t, t, 1])

    # ------------------------------------------------------------------
    def finalize(self, wm_us: int, flush: bool = False) -> dict:
        st = self.s
        gap = st.gap_us

        # --- merge session intervals (gap rule), emit closed ones ---
        closed_rows = []
        for conv in sorted(st.sessions):
            merged: list[list[int]] = []
            for iv in st.sessions[conv]:
                if merged and iv[0] - merged[-1][1] <= gap:
                    merged[-1][1] = max(merged[-1][1], iv[1])
                    merged[-1][2] += iv[2]
                else:
                    merged.append(list(iv))
            keep = []
            for iv in merged:
                if flush or iv[1] + gap < wm_us:
                    sid = st.session_seq.get(conv, 0)
                    st.session_seq[conv] = sid + 1
                    closed_rows.append((conv, sid, iv[2], iv[0], iv[1], iv[1] - iv[0]))
                else:
                    keep.append(iv)
            if keep:
                st.sessions[conv] = keep
            else:
                st.sessions.pop(conv, None)

        # --- finalize windows ---
        win_rows = []
        for key in sorted(st.windows):
            conv, ws = key
            if flush or ws + st.width_us <= wm_us:
                a = st.windows.pop(key)
                win_rows.append((conv, ws, a[0], a[1], a[2], a[3]))

        # --- finalize sliding windows ---
        swin_rows = []
        for key in sorted(st.swindows):
            conv, ws = key
            if flush or ws + st.slide_width_us <= wm_us:
                a = st.swindows.pop(key)
                swin_rows.append((conv, ws, a[0], a[1]))

        # --- join matches ---
        join_rows = []
        for conv in sorted(st.join):
            j = st.join[conv]
            tools = j["tool"]
            remaining_inv = []
            for inv in j["inv"]:
                idx, tool, ts = inv
                match = None
                for t in tools:
                    if t[0] > idx:
                        match = t
                        break
                if match is not None and (flush or match[1] <= wm_us):
                    join_rows.append((conv, idx, tool, match[0], match[1] - ts))
                elif flush:
                    join_rows.append((conv, idx, tool, None, None))
                else:
                    remaining_inv.append(inv)
            j["inv"] = remaining_inv
            # GC: tool turns at/below the watermark can't serve any
            # future invocation (ts order == turn_idx order)
            j["tool"] = [t for t in tools if t[1] > wm_us]
            if not j["inv"] and not j["tool"]:
                st.join.pop(conv, None)

        return {
            "windows": pd.DataFrame(
                win_rows,
                columns=["conv_id", "window_start_us", "n_turns", "n_user_turns",
                         "n_tool_calls", "sum_chars"],
            ),
            "sessions": pd.DataFrame(
                closed_rows,
                columns=["conv_id", "session_id", "n_turns", "start_us", "end_us", "duration_us"],
            ),
            "joins": pd.DataFrame(
                join_rows,
                columns=["conv_id", "invoke_idx", "tool", "response_idx", "latency_us"],
            ),
            "sliding": pd.DataFrame(
                swin_rows,
                columns=["conv_id", "window_start_us", "n_turns", "sum_chars"],
            ),
        }

    # ------------------------------------------------------------------
    def snapshot(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.s, f)

    def restore(self, path: str) -> None:
        with open(path, "rb") as f:
            self.s = pickle.load(f)

    def stats(self) -> dict:
        return {
            "open_windows": len(self.s.windows),
            "open_sliding": len(self.s.swindows),
            "open_sessions": sum(len(v) for v in self.s.sessions.values()),
            "pending_inv": sum(len(v["inv"]) for v in self.s.join.values()),
            "pending_tool": sum(len(v["tool"]) for v in self.s.join.values()),
        }
