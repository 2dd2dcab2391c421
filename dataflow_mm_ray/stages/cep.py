"""MATCH_RECOGNIZE-style CEP pattern matching over keyed event streams.

Detects ordered step sequences per conversation — "a tool invocation,
followed by the first tool response, followed by the first user
follow-up, all within T" — the classic complex-event-processing
primitive the reference's operator set has no counterpart for (its
closest shapes are the chunk merge loop,
``dataflow/operators/core_vision/generate/
timestamp_chunk_row_generator.py``, and the conversation walkers in
``conversation_to_message.py`` — both per-row, neither a sequence
automaton). Engine-original operator.

Semantics (deterministic, partition-count invariant):

- A *pattern* is an ordered list of named step predicates. Step 0 may
  match at-or-after the scan pointer; each later step matches at the
  FIRST row strictly after the previous step's row within the same
  conversation ("followed by" = skip-till-next-match, as in Flink CEP
  and SQL MATCH_RECOGNIZE with greedy single-row variables).
- ``within_us`` bounds the whole match: ts(last step) - ts(step 0).
- ``policy="all"``: every step-0 row is an independent candidate
  (overlapping matches allowed) — fully vectorized, no scan state.
- ``policy="skip_past"``: AFTER MATCH SKIP PAST LAST ROW. Candidates
  are tried in row order; a completed match resumes scanning after its
  last row, a timed-out candidate resumes at the next step-0 row after
  the failed one. Implemented as a *rounds automaton*: per-round state
  is one pointer per conversation and every round advances all active
  conversations at once with vectorized searchsorted chains — the
  Python loop is over rounds (max matches per conversation), never
  over rows or conversations.

Both policies need every row of a conversation co-located and
row-ordered: one hash-partitioned shuffle (``partition_map``), or zero
extra shuffles when fused into ``transcripts_partitioned``.

Scale note: a conversation's rows must fit in one reduce task — the
same contract every conv-keyed kernel in this engine has (windows,
sessions, joins); hot-key splitting belongs upstream (salting.py) and
would break "first next occurrence" semantics if applied here.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

US = 1_000_000

# (name, vectorized predicate over the partition frame -> bool ndarray)
Step = tuple[str, Callable[[pd.DataFrame], np.ndarray]]


def _segments(conv: np.ndarray):
    """Contiguous per-conversation segments of a (conv, order)-sorted
    frame -> (starts, ends, run_id)."""
    n = len(conv)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = conv[1:] != conv[:-1]
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    ends = np.append(starts[1:], n)
    return starts, ends, run_id


def _next_at_or_after(pos: np.ndarray, frm: np.ndarray, n: int) -> np.ndarray:
    """First element of sorted ``pos`` >= frm (vectorized); ``n`` when
    none. Valid across conversations because segments are disjoint and
    ascending — callers re-check the result against the conv's end."""
    idx = np.searchsorted(pos, frm, side="left")
    if pos.size == 0:
        return np.full(len(frm), n, dtype=np.int64)
    return np.where(idx < pos.size, pos[np.minimum(idx, pos.size - 1)], n)


#: active-conversation count below which the skip_past rounds loop
#: hands the remainder to the scalar bisect tail
_TAIL_ACTIVE = 16


def _scalar_skip_past(c, starts, ends, pos, ts_us, p0, seq0, n_pos,
                      within_us, negated, acc_rows, acc_seq) -> None:
    """Finish ONE conversation's skip_past scan with a tight bisect
    loop (the vectorized rounds loop costs ~60us/round of numpy-call
    overhead once only a handful of conversations remain active — a
    single hot conversation with k matches would pay it k times).
    Emits into acc_rows/acc_seq exactly like a vectorized round."""
    from bisect import bisect_left

    s0, e0 = int(starts[c]), int(ends[c])
    cpos = [ps[np.searchsorted(ps, s0):np.searchsorted(ps, e0)].tolist()
            for ps in pos]
    neg = cpos[n_pos] if negated else None
    out: list[list[int]] = [[] for _ in range(n_pos)]
    seqs: list[int] = []
    pr, sq = p0, seq0
    while True:
        ii = bisect_left(cpos[0], pr)
        if ii == len(cpos[0]):
            break
        i0 = cpos[0][ii]
        rowlist = [i0]
        cur = i0
        ok_chain = True
        for s in range(1, n_pos):
            jj = bisect_left(cpos[s], cur + 1)
            if jj == len(cpos[s]):
                ok_chain = False
                break
            cur = cpos[s][jj]
            rowlist.append(cur)
        if not ok_chain:
            break  # no later candidate can complete either
        last = rowlist[-1]
        if negated:
            kk = bisect_left(neg, last + 1)
            violated = (kk < len(neg)
                        and int(ts_us[neg[kk]]) <= int(ts_us[last]) + within_us)
            m = not violated
        else:
            m = (within_us is None
                 or int(ts_us[last]) - int(ts_us[i0]) <= within_us)
        if m:
            for s in range(n_pos):
                out[s].append(rowlist[s])
            seqs.append(sq)
            sq += 1
            pr = last + 1
        else:
            pr = i0 + 1
    if seqs:
        for s in range(n_pos):
            acc_rows[s].append(np.asarray(out[s], dtype=np.int64))
        acc_seq.append(np.asarray(seqs, dtype=np.int64))


def match_pattern_kernel(
    part: pd.DataFrame,
    steps: Sequence[Step],
    within_us: int | None = None,
    policy: str = "all",
    carry: Sequence[str] = (),
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Run the pattern over ONE hash partition (whole conversations,
    sorted by (conv, order)). Returns one row per match:

    conv_id, match_seq, <name>_turn_idx per step, <carry cols from the
    step-0 row>, ts_start, ts_end, span_us.

    Step markers: ``(name, fn, "+")`` — Kleene-collect, see above;
    ``(name, fn, "!")`` on the FINAL step — absence detection: the
    match succeeds iff NO fn-row occurs within ``within_us`` after the
    last positive step's row (``within_us`` is the waited-out deadline,
    not a span bound; the negated step emits no columns).
    """
    if policy not in ("all", "skip_past"):
        raise ValueError(f"unknown policy {policy!r}")
    # a step is (name, fn) or (name, fn, "+"): the "+" (Kleene-collect)
    # quantifier anchors the chain at the FIRST match, then collects
    # every further match before the next step's row — emitted as
    # <name>_count and <name>_last_<idx> alongside the first-row column
    norm: list[tuple] = []
    negated = False  # final-step absence marker ("!")
    for si, st in enumerate(steps):
        nm, fn = st[0], st[1]
        marker = st[2] if len(st) > 2 else None
        if marker in ("!", "absent"):
            if si != len(steps) - 1:
                raise ValueError("the '!' (absence) marker applies to the "
                                 "final step only")
            if within_us is None:
                raise ValueError("absence detection needs within_us (the "
                                 "deadline the match waits out)")
            negated = True
            norm.append((nm, fn, False))
            continue
        coll = marker in ("+", "collect", True)
        norm.append((nm, fn, coll))
    if len(norm) < 2:
        raise ValueError("a pattern needs at least 2 steps")
    # the negated step is looked up for absence, never chained/emitted
    n_pos = len(norm) - 1 if negated else len(norm)
    names = [nm for nm, _, _ in norm[:n_pos]]
    collect = [c for _, _, c in norm[:n_pos]]
    if collect[0] or collect[-1]:
        raise ValueError("the '+' quantifier needs a following step to "
                         "terminate the collection (middle steps only)")

    def empty() -> pd.DataFrame:
        cols: dict = {
            conv_col: pd.Series([], dtype=object),
            "match_seq": pd.Series([], dtype=np.int64),
        }
        for nm, coll in zip(names, collect):
            cols[f"{nm}_{idx_col}"] = pd.Series([], dtype=np.int64)
            if coll:
                cols[f"{nm}_count"] = pd.Series([], dtype=np.int64)
                cols[f"{nm}_last_{idx_col}"] = pd.Series([], dtype=np.int64)
        for c in carry:
            cols[c] = pd.Series([], dtype=part[c].dtype if len(part) else object)
        cols["ts_start"] = pd.Series([], dtype="datetime64[us]")
        cols["ts_end"] = pd.Series([], dtype="datetime64[us]")
        cols["span_us"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(cols)

    n = len(part)
    if n == 0:
        return empty()

    conv = part[conv_col].to_numpy()
    ts_us = part[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
    starts, ends, run_id = _segments(conv)
    pos = [np.flatnonzero(np.asarray(fn(part), dtype=bool)) for _, fn, _ in norm]

    if policy == "all":
        a = pos[0]
        if a.size == 0:
            return empty()
        end_a = ends[run_id[a]]
        rows = [a]
        ok = np.ones(a.size, dtype=bool)
        cur = a
        for s in range(1, n_pos):
            nxt = _next_at_or_after(pos[s], cur + 1, n)
            ok &= nxt < end_a  # stays in step-0's conversation
            rows.append(nxt)
            cur = nxt
        # rows past a failed step cascade through foreign conversations;
        # harmless — ok is already False for those candidates
        last = np.where(ok, rows[-1], rows[0])
        span = ts_us[last] - ts_us[rows[0]]
        if negated:
            # absence: match iff NO negated-step row lands within the
            # deadline after the last positive row
            j = _next_at_or_after(pos[-1], last + 1, n)
            jc = np.minimum(j, n - 1)
            violated = (j < end_a) & (ts_us[jc] <= ts_us[last] + within_us)
            ok &= ~violated
        elif within_us is not None:
            ok &= span <= within_us
        rows = [r[ok] for r in rows]
        span = span[ok]
        # match_seq: rank among surviving candidates per conversation
        # (step-0 rows are ascending, so segment-relative cumcount)
        if rows[0].size:
            rid = run_id[rows[0]]
            chg = np.empty(rid.size, dtype=bool)
            chg[0] = True
            chg[1:] = rid[1:] != rid[:-1]
            seq = np.arange(rid.size) - np.flatnonzero(chg)[np.cumsum(chg) - 1]
        else:
            seq = np.array([], dtype=np.int64)
    else:  # skip_past
        nconv = len(starts)
        p = starts.astype(np.int64).copy()
        endc_all = ends.astype(np.int64)
        active = np.ones(nconv, dtype=bool)
        seq_state = np.zeros(nconv, dtype=np.int64)
        acc_rows: list[list[np.ndarray]] = [[] for _ in range(n_pos)]
        acc_seq: list[np.ndarray] = []
        while active.any():
            ac = np.flatnonzero(active)
            if ac.size <= _TAIL_ACTIVE:
                # few conversations left: the per-round numpy overhead
                # dominates (a single hot conversation would otherwise
                # pay ~60us per match) — finish them in the scalar
                # bisect tail (~1us per match)
                for c in ac:
                    _scalar_skip_past(
                        int(c), starts, ends, pos, ts_us, int(p[c]),
                        int(seq_state[c]), n_pos, within_us, negated,
                        acc_rows, acc_seq,
                    )
                break
            endc = endc_all[ac]
            i0 = _next_at_or_after(pos[0], p[ac], n)
            chain_ok = i0 < endc
            rowmat = [i0]
            cur = i0
            for s in range(1, n_pos):
                nx = _next_at_or_after(pos[s], cur + 1, n)
                chain_ok &= nx < endc
                rowmat.append(nx)
                cur = nx
            # rowmat holds the sentinel n where the chain broke — clamp
            # to row 0 for the span lookup (chain_ok is False there)
            last = np.where(chain_ok, rowmat[-1], 0)
            first = np.where(chain_ok, rowmat[0], 0)
            span = ts_us[last] - ts_us[first]
            if negated:
                j = _next_at_or_after(pos[-1], last + 1, n)
                jc = np.minimum(j, n - 1)
                violated = (j < endc) & (ts_us[jc] <= ts_us[last] + within_us)
                matched = chain_ok & ~violated
            else:
                matched = chain_ok & (span <= within_us
                                      if within_us is not None
                                      else np.ones(len(ac), dtype=bool))
            timeout = chain_ok & ~matched
            if matched.any():
                for s in range(n_pos):
                    acc_rows[s].append(rowmat[s][matched])
                acc_seq.append(seq_state[ac[matched]])
                seq_state[ac[matched]] += 1
                p[ac[matched]] = rowmat[-1][matched] + 1
            p[ac[timeout]] = rowmat[0][timeout] + 1
            # no step-0 left, or some later step has no occurrence in
            # the remaining suffix -> none for any later candidate either
            active[ac[~chain_ok]] = False
        if not acc_seq:
            return empty()
        rows = [np.concatenate(acc_rows[s]) for s in range(n_pos)]
        seq = np.concatenate(acc_seq)
        order = np.lexsort((rows[0], run_id[rows[0]]))
        rows = [r[order] for r in rows]
        seq = seq[order]
        span = ts_us[rows[-1]] - ts_us[rows[0]]

    a = rows[0]
    out = {conv_col: conv[a], "match_seq": seq.astype(np.int64)}
    idx_vals = part[idx_col].to_numpy()
    for s, (nm, r) in enumerate(zip(names, rows)):
        out[f"{nm}_{idx_col}"] = idx_vals[r].astype(np.int64)
        if collect[s]:
            # every step-s match in [first, next step's row): count and
            # last via two searchsorteds on the step's position array
            lo = np.searchsorted(pos[s], r)
            hi = np.searchsorted(pos[s], rows[s + 1])
            out[f"{nm}_count"] = (hi - lo).astype(np.int64)
            out[f"{nm}_last_{idx_col}"] = (
                idx_vals[pos[s][np.maximum(hi - 1, 0)]].astype(np.int64)
                if pos[s].size else np.zeros(len(r), dtype=np.int64)
            )
    for c in carry:
        out[c] = part[c].to_numpy()[a]
    out["ts_start"] = part[ts_col].to_numpy()[a]
    out["ts_end"] = part[ts_col].to_numpy()[rows[-1]]
    out["span_us"] = span.astype(np.int64)
    return pd.DataFrame(out)


def match_pattern(
    ds,
    steps: Sequence[Step],
    within_us: int | None = None,
    policy: str = "all",
    carry: Sequence[str] = (),
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    order_by: Sequence[str] | None = None,
    num_partitions=None,
):
    """Pattern-match a Dataset of keyed, indexed events: ONE hash
    shuffle on ``conv_col`` (whole conversations co-located), kernel
    vectorized per partition. ``order_by`` sets the within-key event
    order when it is not the ``idx_col`` itself (e.g. ``("ts",
    "event_id")`` for a raw event table); ``idx_col`` then only names
    the per-step output columns."""
    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

    return partition_map(
        ds,
        conv_col,
        lambda part: match_pattern_kernel(
            part, steps, within_us=within_us, policy=policy, carry=carry,
            conv_col=conv_col, idx_col=idx_col, ts_col=ts_col,
        ),
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
        sort_by=[conv_col, *(order_by or (idx_col,))],
    )


# --- the flagship transcript pattern -------------------------------------

#: tool invocation -> first tool response -> first user follow-up
TOOL_ROUNDTRIP_STEPS: tuple[Step, ...] = (
    ("invoke", lambda df: (df["role"].to_numpy() == "assistant")
                          & df["tool"].notna().to_numpy()),
    ("response", lambda df: df["role"].to_numpy() == "tool"),
    ("followup", lambda df: df["role"].to_numpy() == "user"),
)

#: invocation -> first response -> NEXT invocation: a multi-tool chain.
#: Unlike the roundtrip, chain candidates OVERLAP in the fixture's
#: role cycle (each invoke is both the end of one chain and the start
#: of the next), so the two match policies genuinely diverge on it.
TOOL_CHAIN_STEPS: tuple[Step, ...] = (
    ("invoke", TOOL_ROUNDTRIP_STEPS[0][1]),
    ("response", TOOL_ROUNDTRIP_STEPS[1][1]),
    ("reinvoke", TOOL_ROUNDTRIP_STEPS[0][1]),
)

#: whole-match time bound (seconds) for the registered queries — sized
#: so the sf fixtures exercise BOTH outcomes (median candidate span at
#: sf0.001 is ~97k s: roughly half match, half time out).
ROUNDTRIP_WITHIN_S = 100_000


def tool_roundtrip_kernel(t: pd.DataFrame, policy: str) -> pd.DataFrame:
    """Per-partition kernel for the fused transcripts path (fast=True:
    predicates read role/tool only, never text)."""
    return match_pattern_kernel(
        t, TOOL_ROUNDTRIP_STEPS, within_us=ROUNDTRIP_WITHIN_S * US,
        policy=policy, carry=("tool",),
    )


def tool_chain_kernel(t: pd.DataFrame, policy: str) -> pd.DataFrame:
    return match_pattern_kernel(
        t, TOOL_CHAIN_STEPS, within_us=ROUNDTRIP_WITHIN_S * US,
        policy=policy, carry=("tool",),
    )


# --- streaming (watermarked, incremental) skip_past chain -----------------

CEP_EMIT_COLS = ("conv_id", "match_seq", "invoke_turn_idx",
                 "response_turn_idx", "reinvoke_turn_idx", "tool",
                 "ts_start_us", "ts_end_us", "span_us")


def _empty_cep_emissions() -> pd.DataFrame:
    out = {}
    for c in CEP_EMIT_COLS:
        if c in ("conv_id", "tool"):
            out[c] = pd.Series([], dtype=object)
        else:
            out[c] = pd.Series([], dtype=np.int64)
    return pd.DataFrame(out)


def advance_pattern_automaton(
    rows: pd.DataFrame,
    steps: Sequence[Step],
    ptrs: dict,
    seqs: dict,
    wm_us: int,
    within_us: int,
    flush: bool = False,
    carry: Sequence[str] = (),
):
    """One watermark advance of a streamed skip_past pattern scan —
    the incremental twin of ``match_pattern_kernel(policy="skip_past")``
    for any chain of positive steps.

    ``rows``: this shard's buffered step-relevant rows, sorted by
    (conv_id, turn_idx), columns conv_id/turn_idx/ts_us + whatever the
    step predicates and ``carry`` read. ``ptrs``/``seqs``:
    per-conversation scan pointer (turn space) and match counter,
    mutated in place.

    Decidability: turn order == ts order within a conversation (the
    derivation breaks ts ties by event_id), and every future non-late
    arrival has ts >= wm. A candidate step-0 row i is decidable once
    ``ts_i + within < wm`` — all rows that could beat the within bound
    have arrived, and a chain step missing from the stable set
    (ts < wm) can only be supplied by a row with ts >= wm >
    ts_i + within, i.e. a timeout either way. Candidates are therefore
    decided strictly in order (skip_past is sequential); the scan stops
    at the first undecided one. Emissions are a pure function of
    (applied rows, wm), so checkpoint replay reproduces them exactly,
    and the final output equals the batch kernel over all applied rows
    (mid-stream "missing step" timeouts retry where batch deactivates,
    but a conversation with a missing step can never match again, so
    the emission sets coincide).

    Hot conversations hand off to the same scalar bisect tail as the
    batch kernel once at most ``_TAIL_ACTIVE`` conversations remain
    active.

    Returns (emissions, kept_rows): emissions sorted by (conv_id,
    step-0 turn_idx) with columns conv_id, match_seq,
    <name>_turn_idx per step, <carry cols from the step-0 row>,
    ts_start_us, ts_end_us, span_us; kept_rows = the pruned buffer —
    unstable rows (ts >= wm) plus stable rows at-or-after the first
    undecided candidate. State is thus bounded by the within window
    per conversation.
    """
    names = [nm for nm, _ in steps]
    K = len(names)
    if K < 2:
        raise ValueError("a pattern needs at least 2 steps")

    def empty() -> pd.DataFrame:
        out: dict = {"conv_id": pd.Series([], dtype=object),
                     "match_seq": pd.Series([], dtype=np.int64)}
        for nm in names:
            out[f"{nm}_turn_idx"] = pd.Series([], dtype=np.int64)
        for c in carry:
            out[c] = pd.Series([], dtype=object)
        out["ts_start_us"] = pd.Series([], dtype=np.int64)
        out["ts_end_us"] = pd.Series([], dtype=np.int64)
        out["span_us"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(out)

    if not len(rows):
        return empty(), rows

    conv = rows["conv_id"].to_numpy()
    tix = rows["turn_idx"].to_numpy(dtype=np.int64)
    ts = rows["ts_us"].to_numpy(dtype=np.int64)
    n = len(rows)
    stable = np.ones(n, dtype=bool) if flush else ts < wm_us
    starts, ends, run_id = _segments(conv)
    nconv = len(starts)
    conv_names = conv[starts]
    pos = [np.flatnonzero(np.asarray(fn(rows), dtype=bool) & stable)
           for _, fn in steps]

    ptr_arr = np.array([ptrs.get(c, 0) for c in conv_names], dtype=np.int64)
    seq_arr = np.array([seqs.get(c, 0) for c in conv_names], dtype=np.int64)
    # row-space pointer: first row of the conv with turn_idx >= ptr
    # (composite key: segments are conv-major, turn_idx ascending within)
    key = run_id.astype(np.int64) * (1 << 32) + tix
    p_row = np.searchsorted(
        key, np.arange(nconv, dtype=np.int64) * (1 << 32) + np.minimum(ptr_arr, (1 << 32) - 1)
    ).astype(np.int64)

    HUGE = np.int64(1 << 62)
    active = np.ones(nconv, dtype=bool)
    thr = np.full(nconv, HUGE, dtype=np.int64)  # stable-prune threshold (turn space)
    acc_rows: list[list[np.ndarray]] = [[] for _ in range(K)]
    acc_c: list[np.ndarray] = []
    acc_s: list[np.ndarray] = []

    def scalar_tail(c: int) -> None:
        # same scalar bisect tail as the batch kernel (hot-conversation
        # fix), with the streamed rules: undecided stop, mid-stream
        # missing-step = timeout retry, flush missing-step = dead
        from bisect import bisect_left

        s0, e0 = int(starts[c]), int(ends[c])
        cpos = [ps[np.searchsorted(ps, s0):np.searchsorted(ps, e0)].tolist()
                for ps in pos]
        out: list[list[int]] = [[] for _ in range(K)]
        osq: list[int] = []
        pr = int(p_row[c])
        sq = int(seq_arr[c])
        while True:
            ii = bisect_left(cpos[0], pr)
            if ii == len(cpos[0]):
                break
            i0s = cpos[0][ii]
            if not flush and int(ts[i0s]) + within_us >= wm_us:
                thr[c] = tix[i0s]
                break
            rowlist = [i0s]
            cur = i0s
            ok_chain = True
            for s in range(1, K):
                jj = bisect_left(cpos[s], cur + 1)
                if jj == len(cpos[s]):
                    ok_chain = False
                    break
                cur = cpos[s][jj]
                rowlist.append(cur)
            if not ok_chain:
                if flush:
                    ptr_arr[c] = HUGE
                    break
                ptr_arr[c] = tix[i0s] + 1
                pr = i0s + 1
                continue
            if int(ts[cur]) - int(ts[i0s]) <= within_us:
                for s in range(K):
                    out[s].append(rowlist[s])
                osq.append(sq)
                sq += 1
                ptr_arr[c] = tix[cur] + 1
                pr = cur + 1
            else:
                ptr_arr[c] = tix[i0s] + 1
                pr = i0s + 1
        seq_arr[c] = sq
        if osq:
            acc_c.append(np.full(len(osq), c, dtype=np.int64))
            acc_s.append(np.asarray(osq, dtype=np.int64))
            for s in range(K):
                acc_rows[s].append(np.asarray(out[s], dtype=np.int64))

    while active.any():
        ac = np.flatnonzero(active)
        if ac.size <= _TAIL_ACTIVE:
            for c in ac:
                scalar_tail(int(c))
            break
        endc = ends[ac]
        i0 = _next_at_or_after(pos[0], p_row[ac], n)
        has0 = i0 < endc
        i0c = np.where(has0, i0, 0)
        # NB: `not flush`, never `~flush` — bitwise NOT of a Python
        # bool is -1 and would silently make these INTEGER masks
        if flush:
            undec = np.zeros(len(ac), dtype=bool)
        else:
            undec = has0 & (ts[i0c] + within_us >= wm_us)
        thr[ac[undec]] = tix[i0c[undec]]
        stop = undec | ~has0
        if stop.any():
            active[ac[stop]] = False
        go = ~stop
        if not go.any():
            break
        agc = ac[go]
        i0g = i0[go]
        endg = endc[go]
        rowmat = [i0g]
        cur = i0g
        chain_ok = np.ones(len(agc), dtype=bool)
        for s in range(1, K):
            nx = _next_at_or_after(pos[s], np.minimum(cur + 1, n), n)
            chain_ok &= nx < endg
            rowmat.append(nx)
            cur = nx
        last = np.where(chain_ok, rowmat[-1], 0)
        span = ts[last] - ts[np.where(chain_ok, i0g, 0)]
        matched = chain_ok & (span <= within_us)
        # mid-stream a missing stable step is a timeout (any unseen row
        # has ts >= wm > ts_i + within); at flush it is terminal
        dead = ~chain_ok & flush
        timeout = ~matched & ~dead
        if matched.any():
            acc_c.append(agc[matched])
            acc_s.append(seq_arr[agc[matched]].copy())
            for s in range(K):
                acc_rows[s].append(rowmat[s][matched])
            seq_arr[agc[matched]] += 1
            p_row[agc[matched]] = rowmat[-1][matched] + 1
            ptr_arr[agc[matched]] = tix[rowmat[-1][matched]] + 1
        p_row[agc[timeout]] = i0g[timeout] + 1
        ptr_arr[agc[timeout]] = tix[i0g[timeout]] + 1
        if dead.any():
            ptr_arr[agc[dead]] = HUGE
            active[agc[dead]] = False

    for c, pv, sv in zip(conv_names, ptr_arr, seq_arr):
        ptrs[c] = int(pv)
        seqs[c] = int(sv)

    if acc_c:
        ci = np.concatenate(acc_c)
        mats = [np.concatenate(acc_rows[s]) for s in range(K)]
        sq = np.concatenate(acc_s)
        order = np.lexsort((mats[0], ci))
        ci = ci[order]
        mats = [m[order] for m in mats]
        sq = sq[order]
        out = {"conv_id": conv_names[ci], "match_seq": sq.astype(np.int64)}
        for nm, m in zip(names, mats):
            out[f"{nm}_turn_idx"] = tix[m]
        for c in carry:
            out[c] = rows[c].to_numpy()[mats[0]]
        out["ts_start_us"] = ts[mats[0]]
        out["ts_end_us"] = ts[mats[-1]]
        out["span_us"] = ts[mats[-1]] - ts[mats[0]]
        emissions = pd.DataFrame(out)
    else:
        emissions = empty()

    keep = (~stable) | (tix >= thr[run_id])
    kept = rows[keep].reset_index(drop=True)
    return emissions, kept


#: the streamed TOOL_CHAIN steps over the shard buffer's row layout
#: (conv_id/turn_idx/ts_us/is_inv/tool)
_STREAM_CHAIN_STEPS: tuple[Step, ...] = (
    ("invoke", lambda r: r["is_inv"].to_numpy(dtype=bool)),
    ("response", lambda r: ~r["is_inv"].to_numpy(dtype=bool)),
    ("reinvoke", lambda r: r["is_inv"].to_numpy(dtype=bool)),
)


def advance_chain_automaton(
    rows: pd.DataFrame,
    ptrs: dict,
    seqs: dict,
    wm_us: int,
    within_us: int,
    flush: bool = False,
):
    """The TOOL_CHAIN instance of ``advance_pattern_automaton`` (the
    engine's ``cep`` stream): invoke -> first response -> next invoke,
    within bound, tool carried from the invoke."""
    return advance_pattern_automaton(
        rows, _STREAM_CHAIN_STEPS, ptrs, seqs, wm_us, within_us,
        flush=flush, carry=("tool",),
    )


# --- streaming absence detection (timeout alerts) --------------------------

ALERT_COLS = ("conv_id", "alert_seq", "invoke_turn_idx", "tool",
              "ts_invoke_us", "deadline_us")

#: default response deadline (seconds) — ONE definition shared by the
#: batch '!' query (cep_unanswered_invocations), the streamed alerts
#: stream and their parity tests (CLAUDE.md twin rule)
ALERT_DEADLINE_S = 30_000


def _empty_alerts() -> pd.DataFrame:
    out = {}
    for c in ALERT_COLS:
        out[c] = pd.Series([], dtype=object if c in ("conv_id", "tool")
                           else np.int64)
    return pd.DataFrame(out)


def advance_absence_automaton(
    rows: pd.DataFrame,
    seqs: dict,
    wm_us: int,
    deadline_us: int,
    flush: bool = False,
):
    """One watermark advance of streamed absence detection: emit every
    invocation whose first response did not arrive within
    ``deadline_us`` (the streamed twin of the batch '!' marker).

    ``rows``: buffered invoke/response rows sorted by (conv_id,
    turn_idx) — same layout as the chain automaton's buffer. An invoke
    i is decidable once ``ts_i + deadline < wm`` (every row that could
    answer it has ts <= ts_i + deadline < wm, hence has arrived); it
    alerts iff no response with turn_idx > i has ts <= ts_i + deadline.
    Candidates are independent (policy 'all') — no scan pointer.

    Returns (alerts, kept_rows): kept = undecided invokes plus
    responses inside the trailing deadline window (``ts > wm -
    deadline``) — state bounded by the deadline window per conversation.
    """
    if not len(rows):
        return _empty_alerts(), rows

    conv = rows["conv_id"].to_numpy()
    tix = rows["turn_idx"].to_numpy(dtype=np.int64)
    ts = rows["ts_us"].to_numpy(dtype=np.int64)
    is_inv = rows["is_inv"].to_numpy(dtype=bool)
    n = len(rows)
    starts, ends, run_id = _segments(conv)

    inv_rows = np.flatnonzero(is_inv)
    pos_resp = np.flatnonzero(~is_inv)
    if flush:
        decidable = np.ones(inv_rows.size, dtype=bool)
    else:
        decidable = ts[inv_rows] + deadline_us < wm_us
    dec = inv_rows[decidable]
    j = _next_at_or_after(pos_resp, dec + 1, n)
    jc = np.minimum(j, n - 1)
    answered = (j < ends[run_id[dec]]) & (ts[jc] <= ts[dec] + deadline_us)
    alert_rows = dec[~answered]

    if alert_rows.size:
        # per-conv continuation of alert_seq, in turn order (alert_rows
        # ascending => segment-relative cumcount)
        rid = run_id[alert_rows]
        chg = np.empty(rid.size, dtype=bool)
        chg[0] = True
        chg[1:] = rid[1:] != rid[:-1]
        rel = np.arange(rid.size) - np.flatnonzero(chg)[np.cumsum(chg) - 1]
        conv_names = conv[alert_rows]
        base = np.array([seqs.get(c, 0) for c in conv_names], dtype=np.int64)
        seq = base + rel
        for c, k in zip(conv[starts][np.unique(rid)],
                        np.bincount(rid, minlength=len(starts))[np.unique(rid)]):
            seqs[c] = seqs.get(c, 0) + int(k)
        alerts = pd.DataFrame(
            {
                "conv_id": conv_names,
                "alert_seq": seq,
                "invoke_turn_idx": tix[alert_rows],
                "tool": rows["tool"].to_numpy()[alert_rows],
                "ts_invoke_us": ts[alert_rows],
                "deadline_us": ts[alert_rows] + deadline_us,
            }
        )
    else:
        alerts = _empty_alerts()

    # prune: undecided invokes + responses in the trailing window
    undecided = np.zeros(n, dtype=bool)
    undecided[inv_rows[~decidable]] = True
    if flush:
        keep = np.zeros(n, dtype=bool)
    else:
        keep = undecided | ((~is_inv) & (ts > wm_us - deadline_us))
    return alerts, rows[keep].reset_index(drop=True)
