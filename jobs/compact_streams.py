"""Maintenance job: compact a streaming out_dir's committed streams.

Local run (this sandbox):
    python jobs/compact_streams.py --out /tmp/stream-out

Cluster run (the maintenance companion to run_streaming.py):
    ray job submit --working-dir . -- \
        python jobs/compact_streams.py --out s3://bucket/stream-out \
        --target-rows 8000000

Safe to run while the engine appends (only already-committed epochs
are covered) and idempotent: a rerun over a fully-compacted out_dir is
a no-op. Exactly-once is preserved — epoch manifests are never
modified, so engine replay/resume semantics are unchanged (see
streaming/compact.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--stream", action="append", default=None,
                    help="compact only these streams (default: all)")
    ap.add_argument("--target-rows", type=int, default=4_000_000)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from dataflow_mm_ray.streaming.compact import compact_all

        summary = compact_all(args.out, streams=args.stream,
                              target_rows=args.target_rows)
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
