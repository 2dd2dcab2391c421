"""Rescale a streaming checkpoint to a different shard/node count.

Moves a job between cluster sizes (the north rule's N-node and 4N-node
deployments) without losing state or exactly-once guarantees:

    # job was running with --shards 4; migrate it to 16 nodes:
    python jobs/rescale_checkpoint.py --out /tmp/stream-out --shards 16
    python jobs/run_streaming.py --out /tmp/stream-out --shards 16 ...

The rewrite is offline and atomic (the original checkpoint stays valid
until the final manifest replace); resuming with the OLD shard count
afterwards is rejected by the engine's config guard, same as any other
config mismatch. Pass --processors with the same list the run was
started with — plugin state splits on each processor's route_key.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="the streaming job's --out directory")
    ap.add_argument("--shards", type=int, required=True,
                    help="new state-shard count (size to the node count)")
    ap.add_argument("--processors", default="",
                    help="comma list of shipped processors the run uses: "
                         "gdedup, wroles, convspan")
    ap.add_argument("--width-s", type=int, default=3600,
                    help="window width for wroles (must match the run)")
    args = ap.parse_args()

    from dataflow_mm_ray.streaming.processor import (
        ConvSpan, GlobalDedupFirst, WindowRoleCounts)
    from dataflow_mm_ray.streaming.rescale import rescale_checkpoint

    shipped = {"gdedup": GlobalDedupFirst, "convspan": ConvSpan,
               "wroles": lambda: WindowRoleCounts(width_s=args.width_s)}
    procs = []
    for name in filter(None, (s.strip() for s in args.processors.split(","))):
        if name not in shipped:
            ap.error(f"unknown processor {name!r}; shipped: {sorted(shipped)}")
        procs.append(shipped[name]())

    meta = rescale_checkpoint(args.out, args.shards, processors=procs)
    print(json.dumps({
        "epoch": meta["epoch"],
        "n_shards": meta["config"]["n_shards"],
        "watermark_us": meta["watermark_us"],
        "state_files": len(meta["state_files"]),
    }))


if __name__ == "__main__":
    main()
