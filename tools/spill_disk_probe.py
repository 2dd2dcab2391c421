"""Measure spill-directory disk usage across a spilled streaming run.

The r5 snapshot-time pruning claims a spilled run's disk stays O(live
state), not O(epochs x state). The churn regime that exercises it:
bounded lateness (by_ts arrival) with a persistent-state processor
(gdedup, O(distinct keys) with old timestamps) and spill_mb=0 — every
epoch reads the settleable segments back, re-spills the survivors to
NEW files, and the consumed files are reclaimable only by the
snapshot-time prune. Without pruning, bytes grow ~linearly with
epochs; with it, the series plateaus at ~live state x the two-snapshot
retention window.

Prints one JSON line with the per-epoch series, peak, and final state
— the number recorded in BASELINE.md.

Usage:
    PYTHONPATH=. python tools/spill_disk_probe.py [sf_dir] [factor]
"""
from __future__ import annotations

import json
import os
import sys
import time


def dir_usage(path: str) -> tuple[int, int]:
    total = files = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(root, n))
                files += 1
            except OSError:
                pass
    return total, files


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    epochs = int(os.environ.get("PROBE_EPOCHS", "10"))
    shards = int(os.environ.get("PROBE_SHARDS", "4"))
    spill_mb = int(os.environ.get("PROBE_SPILL_MB", "0"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import scaling_input
    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts
    from dataflow_mm_ray.streaming.processor import GlobalDedupFirst

    scale_dir = scaling_input(sf_dir, factor=factor)
    import shutil

    work = f"/tmp/graft_spill_probe_{factor}"
    shutil.rmtree(work, ignore_errors=True)
    tpath = prepare_transcripts(scale_dir, os.path.join(work, "transcripts"),
                                n_epochs=epochs, arrival="by_ts")
    out = os.path.join(work, "out")
    eng = StreamingEngine(tpath, out, n_epochs=epochs, n_shards=shards,
                          lateness_s=3600, spill_mb=spill_mb,
                          processors=[GlobalDedupFirst()])
    series = []
    t0 = time.perf_counter()
    for e in range(epochs):
        eng.run(stop_after=e)
        b, f = dir_usage(os.path.join(out, "spill"))
        series.append({"epoch": e, "spill_mib": round(b / 2**20, 1),
                       "spill_files": f})
    wall = round(time.perf_counter() - t0, 1)
    committed = {s: eng.sink.committed_rows(s) for s in eng.stream_names}
    print(json.dumps({
        "metric": "spill dir MiB per epoch (by_ts arrival, lateness=3600s, "
                  f"gdedup persistent state, spill_mb={spill_mb}, "
                  f"{shards} shards, {epochs} epochs, x{factor} input)",
        "series": series,
        "peak_mib": max(s["spill_mib"] for s in series),
        "final_mib": series[-1]["spill_mib"],
        "final_files": series[-1]["spill_files"],
        "committed_rows": committed,
        "run_sec": wall,
    }))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
