"""Benchmark harness (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default sf0.1) under
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns_per_sec": ...}

`python bench.py --scaling` runs the same benchmark twice in fresh
processes (num_cpus=8 then 32) and prints one JSON line with both
throughputs + scaling efficiency (recorded in BASELINE.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _warm_cache(sf_dir: str) -> None:
    for name in ("events", "documents", "embeddings"):
        with open(os.path.join(sf_dir, f"{name}.parquet"), "rb") as f:
            while f.read(1 << 24):
                pass


def _host_health() -> dict:
    """Sample host contention (this sandbox is co-tenant: wall times
    swing 2-3x — see BASELINE.md). Recorded inline so every BENCH
    snapshot carries its own measurement conditions."""
    with open("/proc/stat") as f:
        a = list(map(int, f.readline().split()[1:]))
    t0 = time.perf_counter()
    s, i = 0, 0
    while time.perf_counter() - t0 < 0.3:
        s += i * i
        i += 1
    spin_mops = round(i / (time.perf_counter() - t0) / 1e6, 1)
    time.sleep(1.2)
    with open("/proc/stat") as f:
        b = list(map(int, f.readline().split()[1:]))
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return {
        "spin_mops": spin_mops,  # single-thread Python ops/s (millions)
        "sys_pct": round(100 * d[2] / tot, 1),
        "idle_pct": round(100 * d[3] / tot, 1),
        "steal_pct": round(100 * d[7] / tot, 1) if len(d) > 7 else 0.0,
    }


def _consume(res) -> int:
    """Fully execute a query result; return its row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    return res.count()  # ray Dataset: triggers full pipeline execution


BENCH_QUERIES = [
    # CEP core over the transcript stream (the north-star shape)
    "transcripts",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "tool_join",
    "dedup_exact",
    "conversation_digest",
    "hot_conversations",
    "late_events",
    "scene_segments",
    "asof_enrich",
    "range_join_incidents",
    "cep_tool_roundtrip",
    "cep_tool_chain_nonoverlap",
    # text analysis over documents
    "rule_filter",
    "text_stats",
    # similarity / dedup / selection over embeddings + documents
    "topk_cosine",
    "knn_percentile",
    "embedding_neardup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "datatailor_select",
    # composed end-to-end document prep (filter -> annotate -> exact
    # dedup -> near-dup -> quality cut)
    "docprep_pipeline",
    # round-3 operators: rotation/dual-branch MCQ refine (16 prompts per
    # doc), deterministic math QA synthesis, full 5-branch reward eval
    "visual_dependency_refine",
    "multimodal_math",
    "answer_reward",
]

CEP_QUERIES = {
    "transcripts", "tumbling_window", "sliding_window", "session_window",
    "tool_join", "dedup_exact", "conversation_digest", "hot_conversations",
    "late_events", "scene_segments", "asof_enrich", "range_join_incidents",
    "cep_tool_roundtrip", "cep_tool_chain_nonoverlap",
}


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from dataflow_mm_ray.queries import registry

    reg = registry()
    _warm_cache(sf_dir)

    # untimed warm-up: spin up the FULL ray worker pool + JIT module
    # imports so the first timed query measures steady-state compute,
    # not cold start / fork storms. The range() pass forces one task per
    # CPU slot so every worker process exists before timing begins.
    import ray.data as rd

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b, batch_format="pandas"
    ).count()
    rd.read_parquet(os.path.join(sf_dir, "events.parquet")).map_batches(
        lambda b: b, batch_format="pandas"
    ).count()

    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows

    health_pre = _host_health()

    # min-of-N repeats, interleaved across queries (CLAUDE.md: this host
    # swings wall times 2-3x — never trust single runs). Repeat 1 is a
    # full pass, repeat 2 re-times everything after the host has settled;
    # per-query minima are reported.
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    from dataflow_mm_ray.pipelines.flagship import flagship_pipeline

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _rep in range(repeats):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            rows[name] = _consume(reg[name].fn(sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

        # streaming flagship: windowed agg + stateful join + filter with
        # watermarks + exactly-once commits
        t0 = time.perf_counter()
        fl = flagship_pipeline(sf_dir, n_epochs=4, lateness_s=10**9)
        dt = round(time.perf_counter() - t0, 3)
        timings["streaming_flagship"] = min(timings.get("streaming_flagship", dt), dt)
        rows["streaming_flagship"] = len(fl)

    total = round(sum(timings.values()), 3)
    cep_sec = sum(v for k, v in timings.items() if k in CEP_QUERIES) + timings["streaming_flagship"]
    out = {
        "metric": "headline pipeline wall time (CEP + text + similarity + streaming flagship)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns * (1 + len(CEP_QUERIES)) / cep_sec, 1),
        "rows": rows,
        "host": {"pre": health_pre, "post": _host_health()},
    }
    ray.shutdown()
    return out


# Replication for the scaling measurement: compute must dominate the
# ~2s per-query fixed overhead for the efficiency ratio to measure the
# ENGINE rather than the constant costs. 100x -> 10M turns, 500k docs,
# 40k vectors (embeddings use factor/5: the knn workload is O(n^2)).
SCALE_FACTOR = 100


def scaling_input(sf_dir: str, factor: int = SCALE_FACTOR) -> str:
    """Deterministically replicate the events table ``factor``x (each
    copy gets distinct conversations via shifted user/event ids) so the
    scaling run measures compute, not fixed overhead. Cached in /tmp."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_scale_{tag}_x{factor}"
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT event_id + c.i * 100000000 AS event_id, ts,
                 user_id + c.i * 1000000 AS user_id, event_type, value, props
          FROM read_parquet('{sf_dir}/events.parquet')
          CROSS JOIN (SELECT unnest(range({factor})) AS i) c
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT doc_id + c.i * 10000000 AS doc_id, text, lang, source, n_chars
          FROM read_parquet('{sf_dir}/documents.parquet')
          CROSS JOIN (SELECT unnest(range({factor})) AS i) c
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT vec_id + c.i * 10000000 AS vec_id, embedding, label
          FROM read_parquet('{sf_dir}/embeddings.parquet')
          CROSS JOIN (SELECT unnest(range({max(1, factor // 5)})) AS i) c
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 4096)
        """
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


# The scaling criterion (BASELINE.json north_rule) is defined on the
# windowed-agg + stateful-join + filter pipeline over the transcript
# stream — exactly these queries. Text/similarity stages are benched in
# the plain run and reported separately in BASELINE.md (they are
# memory-bandwidth-bound on this host, not CPU-bound).
CEP_SCALE_QUERIES = [
    "transcripts", "tumbling_window", "sliding_window", "session_window",
    "tool_join", "conversation_digest", "hot_conversations", "late_events",
]


def run_cep_scale() -> dict:
    """The scaling workload: the CEP pipeline over the 2M-turn input."""
    sf_dir = os.environ["GRAFT_SCALE_DIR"]
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from dataflow_mm_ray.queries import registry

    reg = registry()
    import ray.data as rd

    rd.read_parquet(os.path.join(sf_dir, "events.parquet")).map_batches(
        lambda b: b, batch_format="pandas"
    ).count()  # warm workers + page cache

    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows
    timings = {}
    for name in CEP_SCALE_QUERIES:
        t0 = time.perf_counter()
        _consume(reg[name].fn(sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    out = {
        "value": total,
        "unit": "sec",
        "queries": timings,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns * len(CEP_SCALE_QUERIES) / total, 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    base_sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("GRAFT_SCALE_FACTOR", str(SCALE_FACTOR)))
    scale_dir = scaling_input(base_sf, factor=factor)

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SCALE_DIR=scale_dir,
            BENCH_MODE="cep_scale",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N. This sandbox's CPUs are contended (a pure-CPU spin test
    # measures only 0.59 efficiency going 8->32 processes, 0.87 at
    # 2->8, and the MEMORY-BANDWIDTH ceiling at any pair collapses to
    # 0.6-0.7 in co-tenant windows), so the default pair sits below
    # the contention knee at 1->4 — the methodology BASELINE.md
    # documents; always read the efficiency against the bracketing
    # `--ceilings`. Override with GRAFT_SCALE_CPUS="8,32".
    # Host noise swings single runs 2-3x, so each level runs twice
    # (interleaved) and the per-query minimum is used.
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALE_CPUS", "1,4").split(","))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))

    def min_run(runs: list[dict]) -> dict:
        best = dict(runs[0])
        best["queries"] = {
            q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
        }
        best["value"] = round(sum(best["queries"].values()), 3)
        best["turns_per_sec"] = round(
            best["turns"] * len(best["queries"]) / best["value"], 1
        )
        return best

    r_lo, r_hi = min_run(runs_lo), min_run(runs_hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": f"scaling efficiency (num_cpus {lo} vs {hi}, same {r_lo['turns']}-turn input)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "turns": r_lo["turns"],
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
    }


def run_engine_scaling() -> dict:
    """The north-rule criterion measured LITERALLY: the whole streaming
    job (`jobs/run_streaming.py` — extract, shard state, exactly-once
    2PC commit of every output stream, checkpoints) run end-to-end at
    two cluster sizes on the same input, fresh Ray session each.

    Cluster-size emulation: a NODE contributes one Ray Data task slot
    (1 num_cpus) AND one state-shard actor, so the 4N level has 4x the
    task slots and 4x the shards of the N level — exactly how the job
    deploys on a real cluster (`--shards` sized to the node count).
    Scaling only num_cpus while holding shards fixed is NOT a valid
    emulation in local mode: shard actors reserve 0 running CPUs, so
    the N level would silently borrow the 4N level's cores for every
    apply/finalize (measured: that setup reads 0.38 "efficiency" that
    is really Amdahl over borrowed cores). Committed counts are
    asserted identical across all levels/repeats — output is
    shard-count-invariant by design.

    Interleaved repeats, min per level (host swings 2-3x)."""
    base_sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("GRAFT_ENGINE_SCALE_FACTOR", "20"))
    scale_dir = scaling_input(base_sf, factor=factor)
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALE_CPUS", "1,4").split(","))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "2"))
    epochs = int(os.environ.get("GRAFT_ENGINE_EPOCHS", "5"))
    # arrival mode + lateness: default = the adversarial hash/∞ drill;
    # GRAFT_ENGINE_ARRIVAL=by_ts GRAFT_ENGINE_LATENESS=7200 measures the
    # bounded-state production shape (see streaming/engine.py)
    arrival = os.environ.get("GRAFT_ENGINE_ARRIVAL", "hash")
    lateness = os.environ.get("GRAFT_ENGINE_LATENESS", "999999999")
    shards_env = os.environ.get("GRAFT_ENGINE_SHARDS", "")
    if shards_env:
        shards_of = dict(zip((lo, hi), (int(x) for x in shards_env.split(",")))) \
            if "," in shards_env else {lo: int(shards_env), hi: int(shards_env)}
    else:
        shards_of = {lo: lo, hi: hi}
    cli = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "jobs", "run_streaming.py")

    import shutil

    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(os.path.join(scale_dir, "events.parquet")).num_rows

    def one(ncpu: int) -> dict:
        out_dir = f"/tmp/graft_engine_scale_{ncpu}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        res = subprocess.run(
            [sys.executable, cli, "--sf-dir", scale_dir, "--out", out_dir,
             "--epochs", str(epochs), "--shards", str(shards_of[ncpu]),
             "--lateness-s", lateness, "--arrival", arrival,
             "--no-readback", "--num-cpus", str(ncpu)],
            capture_output=True, text=True, check=True,
        )
        dt = time.perf_counter() - t0
        summary = json.loads(res.stdout.strip().splitlines()[-1])
        shutil.rmtree(out_dir, ignore_errors=True)
        # sec = the streaming job itself (engine run: extract -> shard
        # state -> exactly-once 2PC commit). Interpreter+Ray boot and
        # the harness's epoch-partitioning of the input are reported as
        # wall but excluded from throughput — neither exists in a
        # sustained stream. Counts come from the sink manifests
        # (--no-readback), exact in every mode.
        return {"sec": summary["run_sec"], "wall": round(dt, 1),
                "committed": summary["committed_rows"]}

    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    # committed counts must be IDENTICAL at every level and repeat —
    # the determinism half of the criterion
    all_counts = [r["committed"] for r in runs_lo + runs_hi]
    assert all(c == all_counts[0] for c in all_counts), all_counts
    s_lo = min(r["sec"] for r in runs_lo)
    s_hi = min(r["sec"] for r in runs_hi)
    eff = (s_lo / s_hi) / (hi / lo)
    return {
        "metric": f"STREAMING-ENGINE scaling efficiency (node=1 task cpu + "
                  f"1 state shard; {lo} vs {hi} nodes = num_cpus {lo}/{hi} + "
                  f"shards {shards_of[lo]}/{shards_of[hi]}, {n_turns}-turn "
                  f"input, {epochs} epochs, arrival={arrival}, "
                  f"lateness_s={lateness}, every output stream committed "
                  "exactly-once)",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": s_lo, "sec_hi": s_hi,
        "wall_lo": min(r["wall"] for r in runs_lo),
        "wall_hi": min(r["wall"] for r in runs_hi),
        "turns": n_turns,
        "turns_per_sec_lo": round(n_turns / s_lo, 1),
        "turns_per_sec_hi": round(n_turns / s_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "committed_rows": all_counts[0],
    }


def _pool_time(fn, arg, procs: int, tasks: int = 8) -> float:
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(fn, [arg] * tasks)
    return time.perf_counter() - t0


def _spin(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def _stream(n: int) -> float:
    import numpy as np

    a = np.ones(n, dtype=np.float64)
    b = np.empty_like(a)
    for _ in range(8):
        np.copyto(b, a)
        a += 1.0
    return float(b[0])


def run_ceilings(lo: int = 1, hi: int = 4) -> dict:
    """Host capacity ceilings for the (lo, hi) CPU pair: pure-CPU
    (register-resident spin) and memory-bandwidth (array copy sweep).
    A scaling measurement below EITHER ceiling reflects the host, not
    the engine — round 3 observed cpu=0.97 with bandwidth=0.69 in one
    window (co-tenant memory traffic the spin test cannot see), which
    capped a bandwidth-heavy engine run at 0.58."""
    cpu = (min(_pool_time(_spin, 30_000_000, lo), _pool_time(_spin, 30_000_000, lo))
           / min(_pool_time(_spin, 30_000_000, hi), _pool_time(_spin, 30_000_000, hi))) / (hi / lo)
    bw = (min(_pool_time(_stream, 20_000_000, lo), _pool_time(_stream, 20_000_000, lo))
          / min(_pool_time(_stream, 20_000_000, hi), _pool_time(_stream, 20_000_000, hi))) / (hi / lo)
    return {"metric": f"host capacity ceilings {lo}->{hi}",
            "cpu_ceiling": round(cpu, 3), "bandwidth_ceiling": round(bw, 3)}


if __name__ == "__main__":
    if "--scaling-engine" in sys.argv:
        print(json.dumps(run_engine_scaling()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--ceilings" in sys.argv:
        lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALE_CPUS", "1,4").split(","))
        print(json.dumps(run_ceilings(lo, hi)))
    elif os.environ.get("BENCH_MODE") == "cep_scale":
        print(json.dumps(run_cep_scale()))
    else:
        print(json.dumps(run_bench()))
