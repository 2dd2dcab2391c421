"""Cluster entry point for the streaming engine.

Local run (this sandbox):
    python jobs/run_streaming.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/stream-out --epochs 6 --lateness-s 86400

Cluster run (the north-rule deployment shape):
    ray job submit --working-dir . -- \
        python jobs/run_streaming.py --sf-dir s3://bucket/transcripts \
        --out s3://bucket/stream-out --epochs 96 --shards 256

The job owns its Ray session (guarded init); the engine itself never
calls ray.init. Resumability: re-running with the same --out continues
from the latest checkpoint; completed epochs are no-ops.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--width-s", type=int, default=3600)
    ap.add_argument("--gap-s", type=int, default=1800)
    ap.add_argument("--lateness-s", type=int, default=86400)
    ap.add_argument("--stop-after", type=int, default=None,
                    help="stop after this epoch index (simulated kill; "
                         "rerun with the same --out to resume)")
    ap.add_argument("--repair", action="store_true",
                    help="after the run, replay the late quarantine into "
                         "the windows_fix/sliding_fix additive correction "
                         "streams and recompute affected conversations into "
                         "sessions_fix (streaming/reprocess.py — exactly-"
                         "once, safe to re-run)")
    ap.add_argument("--processors", default="",
                    help="comma list of shipped StatefulProcessor streams "
                         "to run alongside the built-ins: "
                         "gdedup, sdup, rjoin, wroles, convspan")
    ap.add_argument("--arrival", choices=("hash", "by_ts"), default="hash",
                    help="simulated arrival order for the prepared input: "
                         "'hash' = event-time-uncorrelated worst case "
                         "(late-quarantine drills); 'by_ts' = event-time-"
                         "ordered epochs, the production shape where a "
                         "finite --lateness-s bounds shard state by the "
                         "disorder horizon instead of the stream length")
    ap.add_argument("--no-readback", action="store_true",
                    help="summarize committed rows from the sink manifests "
                         "instead of reading every stream back to the "
                         "driver — the soak/ops mode for outputs too big "
                         "to collect (counts are exact either way)")
    ap.add_argument("--spill-mb", type=int, default=None,
                    help="per-shard resident-state threshold (MiB) past "
                         "which event-buffer state pages to disk "
                         "segments; the flush epoch then runs one "
                         "key-bucket at a time (bounded memory for the "
                         "hash-arrival/infinite-lateness drill)")
    ap.add_argument("--finalize-waves", type=int, default=None,
                    help="consolidate at most N shards at once (caps the "
                         "per-epoch transient memory at big state; "
                         "default: all shards concurrently)")
    ap.add_argument("--object-store-gb", type=int, default=None,
                    help="cap ray object store (default: ray's 30%% of RAM)")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            **({"object_store_memory": args.object_store_gb << 30}
               if args.object_store_gb else {}),
        )

    from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts
    from dataflow_mm_ray.streaming.processor import (
        ConvSpan, GlobalDedupFirst, IncidentIntervalCount, SimhashNearDupFirst,
        WindowRoleCounts)

    shipped = {"gdedup": GlobalDedupFirst, "convspan": ConvSpan,
               "sdup": SimhashNearDupFirst, "rjoin": IncidentIntervalCount,
               "wroles": lambda: WindowRoleCounts(width_s=args.width_s)}
    procs = []
    for name in filter(None, (s.strip() for s in args.processors.split(","))):
        if name not in shipped:
            ap.error(f"unknown processor {name!r}; shipped: {sorted(shipped)}")
        procs.append(shipped[name]())

    import time

    t0 = time.perf_counter()
    tpath = prepare_transcripts(args.sf_dir, os.path.join(args.out, "transcripts"),
                                n_epochs=args.epochs, arrival=args.arrival)
    t1 = time.perf_counter()
    eng = StreamingEngine(
        tpath,
        args.out,
        n_epochs=args.epochs,
        n_shards=args.shards,
        width_s=args.width_s,
        gap_s=args.gap_s,
        lateness_s=args.lateness_s,
        processors=procs,
        spill_mb=args.spill_mb,
        finalize_waves=args.finalize_waves,
    )
    eng.run(stop_after=args.stop_after)
    t2 = time.perf_counter()
    repair_stats = None
    if args.repair:
        from dataflow_mm_ray.streaming.reprocess import repair, repair_sessions

        repair_stats = repair(args.out)
        repair_stats["sessions"] = repair_sessions(args.out, tpath)
    t3 = time.perf_counter()
    if args.no_readback:
        from dataflow_mm_ray.streaming.sink import EpochSink

        sink = EpochSink(args.out, eng.stream_names)
        committed = {s: sink.committed_rows(s) for s in eng.stream_names}
    else:
        committed = {k: int(len(v)) for k, v in eng.results().items()}
    summary = {
        "committed_rows": committed,
        "epochs": eng.n_epochs,
        "watermark_us": int(eng.watermark_us),
        # prep = epoch-partitioning the input (test-harness artifact; a
        # real deployment's stream source already arrives in epochs);
        # run = the streaming job itself (extract -> shard state -> 2PC
        # commit); results readback is verification, not the job.
        "prep_sec": round(t1 - t0, 3),
        "run_sec": round(t2 - t1, 3),
        "repair": repair_stats and {**repair_stats, "sec": round(t3 - t2, 3)},
        "metrics_tail": eng.metrics()[-1] if eng.metrics() else None,
    }
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
