"""CEP pattern matching: vectorized kernel vs a naive per-conversation
automaton, edge cases, and partition-count invariance."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.stages.cep import (
    ROUNDTRIP_WITHIN_S,
    TOOL_ROUNDTRIP_STEPS,
    US,
    match_pattern_kernel,
)


def naive_match(df, steps, within_us, policy):
    """Straight transcription of the documented semantics: per-conv
    Python loops, first-next-occurrence chaining."""
    out = []
    for cid, g in df.groupby("conv_id", sort=True):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        masks = [np.asarray(fn(g), dtype=bool) for _, fn in steps]
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)

        def chain(start_at):
            """candidate from first step-0 row >= start_at; None if no
            step-0 row, 'dead' if a later step has no occurrence."""
            i0s = [i for i in range(start_at, len(g)) if masks[0][i]]
            if not i0s:
                return None
            rows = [i0s[0]]
            for s in range(1, len(steps)):
                nxt = [i for i in range(rows[-1] + 1, len(g)) if masks[s][i]]
                if not nxt:
                    return "dead"
                rows.append(nxt[0])
            return rows

        def emit(rows, seq):
            out.append(
                (cid, seq) + tuple(int(g["turn_idx"][r]) for r in rows)
                + (int(ts[rows[-1]] - ts[rows[0]]),)
            )

        if policy == "all":
            seq = 0
            for i in range(len(g)):
                if not masks[0][i]:
                    continue
                rows = [i]
                ok = True
                for s in range(1, len(steps)):
                    nxt = [j for j in range(rows[-1] + 1, len(g)) if masks[s][j]]
                    if not nxt:
                        ok = False
                        break
                    rows.append(nxt[0])
                if ok and (within_us is None or ts[rows[-1]] - ts[rows[0]] <= within_us):
                    emit(rows, seq)
                    seq += 1
        else:
            p, seq = 0, 0
            while True:
                rows = chain(p)
                if rows is None or rows == "dead":
                    break
                if within_us is None or ts[rows[-1]] - ts[rows[0]] <= within_us:
                    emit(rows, seq)
                    seq += 1
                    p = rows[-1] + 1
                else:
                    p = rows[0] + 1
    cols = ["conv_id", "match_seq"] + [f"{nm}_turn_idx" for nm, _ in steps] + ["span_us"]
    return pd.DataFrame(out, columns=cols)


def random_transcript(rng, n_convs, max_turns):
    frames = []
    for c in range(n_convs):
        n = rng.integers(1, max_turns + 1)
        roles = rng.choice(["user", "assistant", "tool"], size=n)
        tool = np.where(rng.random(n) < 0.5, "tool_x", None)
        ts = np.sort(rng.integers(0, 10_000, size=n)).astype("datetime64[s]").astype("datetime64[us]")
        frames.append(pd.DataFrame({
            "conv_id": f"conv-{c:06d}",
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": roles, "tool": tool, "ts": ts,
        }))
    return pd.concat(frames, ignore_index=True)


STEPS2 = TOOL_ROUNDTRIP_STEPS[:2]
STEPS4 = TOOL_ROUNDTRIP_STEPS + (
    ("second_invoke", TOOL_ROUNDTRIP_STEPS[0][1]),
)


@pytest.mark.parametrize("policy", ["all", "skip_past"])
@pytest.mark.parametrize("steps", [STEPS2, TOOL_ROUNDTRIP_STEPS, STEPS4],
                         ids=["k2", "k3", "k4"])
@pytest.mark.parametrize("within_s", [None, 50, 2000])
def test_kernel_matches_naive(policy, steps, within_s):
    rng = np.random.default_rng(hash((policy, len(steps), within_s or 0)) % 2**32)
    df = random_transcript(rng, n_convs=25, max_turns=60)
    within_us = None if within_s is None else within_s * US
    got = match_pattern_kernel(df, steps, within_us=within_us, policy=policy)
    want = naive_match(df, steps, within_us, policy)
    keep = list(want.columns)
    got_c = got[keep].sort_values(keep).reset_index(drop=True)
    want_c = want.sort_values(keep).reset_index(drop=True).astype(
        {c: np.int64 for c in keep if c != "conv_id"})
    pd.testing.assert_frame_equal(got_c, want_c, check_exact=True)


def test_skip_past_is_subset_nonoverlapping():
    rng = np.random.default_rng(7)
    df = random_transcript(rng, n_convs=10, max_turns=80)
    sp = match_pattern_kernel(df, TOOL_ROUNDTRIP_STEPS,
                              within_us=2000 * US, policy="skip_past")
    # non-overlap: within a conversation, each match starts after the
    # previous match's last row
    for _, g in sp.groupby("conv_id"):
        g = g.sort_values("match_seq")
        assert (g["invoke_turn_idx"].to_numpy()[1:]
                > g["followup_turn_idx"].to_numpy()[:-1]).all()
        assert (g["match_seq"].to_numpy() == np.arange(len(g))).all()


def test_kernel_edges():
    empty = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                          "turn_idx": pd.Series([], dtype=np.int32),
                          "role": pd.Series([], dtype=object),
                          "tool": pd.Series([], dtype=object),
                          "ts": pd.Series([], dtype="datetime64[us]")})
    for policy in ("all", "skip_past"):
        out = match_pattern_kernel(empty, TOOL_ROUNDTRIP_STEPS, policy=policy)
        assert len(out) == 0 and "invoke_turn_idx" in out.columns
    # one conv, no step-0 occurrences at all
    df = pd.DataFrame({"conv_id": ["c"] * 3, "turn_idx": np.arange(3, dtype=np.int32),
                       "role": ["user"] * 3, "tool": [None] * 3,
                       "ts": pd.to_datetime([0, 1, 2], unit="s").astype("datetime64[us]")})
    for policy in ("all", "skip_past"):
        assert len(match_pattern_kernel(df, TOOL_ROUNDTRIP_STEPS, policy=policy)) == 0
    # bad inputs
    with pytest.raises(ValueError):
        match_pattern_kernel(df, TOOL_ROUNDTRIP_STEPS, policy="nope")
    with pytest.raises(ValueError):
        match_pattern_kernel(df, TOOL_ROUNDTRIP_STEPS[:1])


def test_carry_and_ts_columns():
    df = pd.DataFrame({
        "conv_id": ["c"] * 4,
        "turn_idx": np.arange(4, dtype=np.int32),
        "role": ["assistant", "tool", "user", "user"],
        "tool": ["tool_a", "tool_a", None, None],
        "ts": pd.to_datetime([10, 20, 30, 40], unit="s").astype("datetime64[us]"),
    })
    out = match_pattern_kernel(df, TOOL_ROUNDTRIP_STEPS, within_us=None,
                               policy="all", carry=("tool",))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["tool"], r["invoke_turn_idx"], r["response_turn_idx"],
            r["followup_turn_idx"]) == ("tool_a", 0, 1, 2)
    assert r["span_us"] == 20 * US
    assert r["ts_start"] == pd.Timestamp("1970-01-01 00:00:10")
    assert r["ts_end"] == pd.Timestamp("1970-01-01 00:00:30")


@pytest.mark.parametrize("policy", ["all", "skip_past"])
def test_partition_count_invariance(ray_session, policy):
    import ray

    from dataflow_mm_ray.stages.cep import match_pattern

    rng = np.random.default_rng(11)
    df = random_transcript(rng, n_convs=40, max_turns=30)
    ds = ray.data.from_pandas(df).repartition(7)
    outs = []
    for np_ in (3, 13):
        out = match_pattern(ds, TOOL_ROUNDTRIP_STEPS, within_us=500 * US,
                            policy=policy, carry=("tool",),
                            num_partitions=np_).to_pandas()
        cols = list(out.columns)
        outs.append(out.sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    assert len(outs[0]) > 0


def test_streamed_automaton_equals_batch_over_random_epochs():
    """advance_chain_automaton across arbitrary epoch splits and
    watermark advances == the batch skip_past kernel over the rows that
    were ever applied (late rows dropped at arrival, engine-style)."""
    from dataflow_mm_ray.stages.cep import advance_chain_automaton

    for trial in range(12):
        rng = np.random.default_rng(trial)
        frames = []
        for c in range(10):
            n = rng.integers(2, 50)
            is_inv = rng.random(n) < 0.5
            ts = np.sort(rng.integers(0, 5000, size=n)).astype(np.int64) * US
            frames.append(pd.DataFrame({
                "conv_id": f"c{c:03d}", "turn_idx": np.arange(n, dtype=np.int64),
                "ts_us": ts, "is_inv": is_inv,
                "tool": np.where(is_inv, "tool_x", None),
            }))
        allrows = pd.concat(frames, ignore_index=True)
        within_us = int(rng.integers(50, 2000)) * US
        epoch_of = rng.integers(0, 5, size=len(allrows))

        ptrs, seqs = {}, {}
        pending = allrows.iloc[0:0]
        emitted, applied_parts = [], []
        wm = -(1 << 62)
        for e in range(5):
            arrive = allrows[epoch_of == e]
            arrive = arrive[arrive["ts_us"].to_numpy() >= wm]  # late quarantine
            applied_parts.append(arrive)
            rows = (pd.concat([pending, arrive], ignore_index=True)
                    .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
            if len(arrive):
                wm = max(wm, int(arrive["ts_us"].max()))
            em, pending = advance_chain_automaton(
                rows, ptrs, seqs, wm, within_us, flush=(e == 4))
            emitted.append(em)
        got = pd.concat(emitted, ignore_index=True)

        applied = (pd.concat(applied_parts)
                   .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
        t = applied.copy()
        t["role"] = np.where(t["is_inv"], "assistant", "tool")
        t["ts"] = t["ts_us"].astype("datetime64[us]")
        from dataflow_mm_ray.stages.cep import TOOL_CHAIN_STEPS
        want = match_pattern_kernel(t, TOOL_CHAIN_STEPS, within_us=within_us,
                                    policy="skip_past", carry=("tool",))
        cols = ["conv_id", "match_seq", "invoke_turn_idx",
                "response_turn_idx", "reinvoke_turn_idx", "span_us"]
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True).astype(
            {c: np.int64 for c in cols if c != "conv_id"})
        pd.testing.assert_frame_equal(g, w, check_exact=True), trial


@pytest.mark.parametrize("policy", ["all", "skip_past"])
@pytest.mark.parametrize("within_s", [None, 300, 3000])
def test_collect_quantifier_matches_naive(policy, within_s):
    """A B+ C: B+ anchors at the first B and collects every B before
    the next step's row — pinned to a per-conv Python transcription."""
    rng = np.random.default_rng(42 + (within_s or 0))
    frames = []
    for c in range(30):
        n = rng.integers(2, 60)
        typ = rng.choice(["a", "b", "c", "x"], size=n, p=[0.2, 0.4, 0.2, 0.2])
        ts = np.sort(rng.integers(0, 10_000, size=n)).astype("datetime64[s]").astype("datetime64[us]")
        frames.append(pd.DataFrame({
            "conv_id": f"c{c:03d}", "turn_idx": np.arange(n, dtype=np.int64),
            "typ": typ, "ts": ts}))
    df = pd.concat(frames, ignore_index=True)
    within_us = None if within_s is None else within_s * US

    def is_t(t):
        return lambda d: d["typ"].to_numpy() == t

    got = match_pattern_kernel(
        df, (("a", is_t("a")), ("b", is_t("b"), "+"), ("c", is_t("c"))),
        within_us=within_us, policy=policy)

    # naive transcription
    rows = []
    for cid, g in df.groupby("conv_id", sort=True):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        typ = g["typ"].to_numpy()
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        p, seq = 0, 0
        cand_from = range(len(g)) if policy == "all" else None
        def chain(i):
            b1 = next((x for x in range(i + 1, len(g)) if typ[x] == "b"), None)
            if b1 is None:
                return None
            k = next((x for x in range(b1 + 1, len(g)) if typ[x] == "c"), None)
            if k is None:
                return None
            bs = [x for x in range(i + 1, k) if typ[x] == "b"]
            return b1, bs, k
        if policy == "all":
            seq = 0
            for i in range(len(g)):
                if typ[i] != "a":
                    continue
                r = chain(i)
                if r and (within_us is None or ts[r[2]] - ts[i] <= within_us):
                    rows.append((cid, seq, i, r[0], len(r[1]), r[1][-1], r[2],
                                 int(ts[r[2]] - ts[i])))
                    seq += 1
        else:
            while True:
                i = next((x for x in range(p, len(g)) if typ[x] == "a"), None)
                if i is None:
                    break
                r = chain(i)
                if r is None:
                    break
                if within_us is None or ts[r[2]] - ts[i] <= within_us:
                    rows.append((cid, seq, i, r[0], len(r[1]), r[1][-1], r[2],
                                 int(ts[r[2]] - ts[i])))
                    seq += 1
                    p = r[2] + 1
                else:
                    p = i + 1
    want = pd.DataFrame(rows, columns=[
        "conv_id", "match_seq", "a_turn_idx", "b_turn_idx", "b_count",
        "b_last_turn_idx", "c_turn_idx", "span_us"])
    cols = list(want.columns)
    assert len(want) > 0
    g2 = got[cols].sort_values(cols).reset_index(drop=True)
    w2 = want.sort_values(cols).reset_index(drop=True).astype(
        {c: np.int64 for c in cols if c != "conv_id"})
    pd.testing.assert_frame_equal(g2, w2, check_exact=True)


def test_collect_quantifier_rejects_edges():
    with pytest.raises(ValueError):
        match_pattern_kernel(
            pd.DataFrame({"conv_id": [], "turn_idx": [], "role": [], "tool": [], "ts": []}),
            (("a", lambda d: d["role"] == "x", "+"), ("b", lambda d: d["role"] == "y")))
    with pytest.raises(ValueError):
        match_pattern_kernel(
            pd.DataFrame({"conv_id": [], "turn_idx": [], "role": [], "tool": [], "ts": []}),
            (("a", lambda d: d["role"] == "x"), ("b", lambda d: d["role"] == "y", "+")))


@pytest.mark.parametrize("policy", ["all", "skip_past"])
def test_negation_matches_naive(policy):
    """A !B within T: emit A iff no B lands within T after it."""
    rng = np.random.default_rng(5)
    frames = []
    for c in range(30):
        n = rng.integers(2, 60)
        typ = rng.choice(["a", "b", "x"], size=n, p=[0.35, 0.35, 0.3])
        ts = np.sort(rng.integers(0, 10_000, size=n)).astype("datetime64[s]").astype("datetime64[us]")
        frames.append(pd.DataFrame({
            "conv_id": f"c{c:03d}", "turn_idx": np.arange(n, dtype=np.int64),
            "typ": typ, "ts": ts}))
    df = pd.concat(frames, ignore_index=True)
    T = 400 * US

    def is_t(t):
        return lambda d: d["typ"].to_numpy() == t

    got = match_pattern_kernel(
        df, (("a", is_t("a")), ("b", is_t("b"), "!")),
        within_us=T, policy=policy)

    rows = []
    for cid, g in df.groupby("conv_id", sort=True):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        typ = g["typ"].to_numpy()
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        seq = 0
        for i in range(len(g)):
            if typ[i] != "a":
                continue
            j = next((x for x in range(i + 1, len(g)) if typ[x] == "b"), None)
            unanswered = j is None or ts[j] > ts[i] + T
            if unanswered:
                rows.append((cid, seq, i))
                seq += 1
        # for a single positive step both policies coincide (the match
        # consumes only row i; the pointer advances identically)
    want = pd.DataFrame(rows, columns=["conv_id", "match_seq", "a_turn_idx"])
    assert len(want) > 0
    cols = list(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want.sort_values(cols).reset_index(drop=True).astype(
            {c: np.int64 for c in cols if c != "conv_id"}),
        check_exact=True)


def test_negation_validation():
    df = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0], "typ": ["a"],
                       "ts": pd.to_datetime([0], unit="s").astype("datetime64[us]")})
    f = lambda d: d["typ"].to_numpy() == "a"
    with pytest.raises(ValueError):  # '!' not on the final step
        match_pattern_kernel(df, (("a", f, "!"), ("b", f)), within_us=US)
    with pytest.raises(ValueError):  # needs within_us
        match_pattern_kernel(df, (("a", f), ("b", f, "!")))


def test_streamed_absence_equals_batch_over_random_epochs():
    """advance_absence_automaton across arbitrary epoch splits ==
    the batch absence rule over the rows that were ever applied."""
    from dataflow_mm_ray.stages.cep import advance_absence_automaton

    for trial in range(10):
        rng = np.random.default_rng(trial)
        frames = []
        for c in range(10):
            n = rng.integers(2, 50)
            is_inv = rng.random(n) < 0.5
            ts = np.sort(rng.integers(0, 5000, size=n)).astype(np.int64) * US
            frames.append(pd.DataFrame({
                "conv_id": f"c{c:03d}", "turn_idx": np.arange(n, dtype=np.int64),
                "ts_us": ts, "is_inv": is_inv,
                "tool": np.where(is_inv, "tool_x", None)}))
        allrows = pd.concat(frames, ignore_index=True)
        T = int(rng.integers(50, 2000)) * US
        epoch_of = rng.integers(0, 5, size=len(allrows))

        seqs = {}
        pending = allrows.iloc[0:0]
        emitted, applied_parts = [], []
        wm = -(1 << 62)
        for e in range(5):
            arrive = allrows[epoch_of == e]
            arrive = arrive[arrive["ts_us"].to_numpy() >= wm]
            applied_parts.append(arrive)
            rows = pd.concat([pending, arrive], ignore_index=True).sort_values(
                ["conv_id", "turn_idx"]).reset_index(drop=True)
            if len(arrive):
                wm = max(wm, int(arrive["ts_us"].max()))
            al, pending = advance_absence_automaton(rows, seqs, wm, T, flush=(e == 4))
            emitted.append(al)
        got = pd.concat(emitted, ignore_index=True)

        applied = pd.concat(applied_parts).sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        rows_t = []
        for cid, g in applied.groupby("conv_id", sort=True):
            g = g.reset_index(drop=True)
            seq = 0
            for i in range(len(g)):
                if not g["is_inv"][i]:
                    continue
                ans = any((not g["is_inv"][x]) and g["ts_us"][x] <= g["ts_us"][i] + T
                          for x in range(i + 1, len(g)))
                if not ans:
                    rows_t.append((cid, seq, int(g["turn_idx"][i]), int(g["ts_us"][i])))
                    seq += 1
        want = pd.DataFrame(rows_t, columns=[
            "conv_id", "alert_seq", "invoke_turn_idx", "ts_invoke_us"])
        cols = list(want.columns)
        g2 = got[cols].sort_values(cols).reset_index(drop=True)
        w2 = want.sort_values(cols).reset_index(drop=True).astype(
            {c: np.int64 for c in cols if c != "conv_id"})
        pd.testing.assert_frame_equal(g2, w2, check_exact=True), trial


def test_hot_conversation_scalar_tail_correct():
    """One conversation with 8k turns drives the scalar bisect tail
    (active count 1 from round one) — output must equal the naive scan
    (kept small: the naive reference is quadratic)."""
    n = 8_000
    role = np.where(np.arange(n) % 2 == 0, "assistant", "tool")
    df = pd.DataFrame({
        "conv_id": "hot", "turn_idx": np.arange(n, dtype=np.int64),
        "role": role, "tool": np.where(role == "assistant", "tool_x", None),
        "ts": (np.arange(n, dtype=np.int64) * US).astype("datetime64[us]"),
    })
    from dataflow_mm_ray.stages.cep import TOOL_CHAIN_STEPS
    got = match_pattern_kernel(df, TOOL_CHAIN_STEPS, within_us=None,
                               policy="skip_past")
    # alternating I R I R ...: matches are (4m, 4m+1, 4m+2)*? -> verify
    # against the generic naive transcription (subset columns)
    want = naive_match(df, TOOL_CHAIN_STEPS, None, "skip_past")
    cols = list(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want.sort_values(cols).reset_index(drop=True).astype(
            {c: np.int64 for c in cols if c != "conv_id"}),
        check_exact=True)
    assert len(got) == n // 4
