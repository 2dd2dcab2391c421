"""Cluster entry point for incremental stream consumption.

Drains the committed-but-unconsumed epochs of one output stream for a
durable consumer group (streaming/consumer.py), writes them as one
parquet segment per poll, and commits the group position only after
the segment is durable — the idempotent-writer composition that gives
end-to-end exactly-once (a crash between write and commit re-polls the
same epochs; the segment path is derived from the epoch range and is
CLEANED before the rewrite, so the rerun replaces the partial attempt
instead of appending next to it).

Local run (after a `jobs/run_streaming.py --out <dir>` run):
    python jobs/consume_stream.py --out <dir> --stream windows \
        --group etl --dest /tmp/windows-etl

Rerunning after new epochs commit drains only the new ones; rerunning
with nothing new is a no-op. `--reset-to-horizon` recovers a group
that fell behind compaction (see consumer.PositionCompactedError).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="streaming engine output dir")
    ap.add_argument("--stream", required=True)
    ap.add_argument("--group", default="default")
    ap.add_argument("--dest", required=True,
                    help="directory for drained parquet segments")
    ap.add_argument("--dest-sink", action="store_true",
                    help="commit into a second EpochSink at --dest "
                         "(same epoch numbers) instead of range "
                         "segments: consume -> transform -> 2PC commit, "
                         "end-to-end exactly-once (a kill anywhere "
                         "re-polls; the downstream commit is a no-op "
                         "for epochs already committed)")
    ap.add_argument("--columns", default=None,
                    help="comma-separated projection applied as the "
                         "transform in --dest-sink mode")
    ap.add_argument("--member", type=int, default=None,
                    help="member id for N-way parallel group consumption")
    ap.add_argument("--n-members", type=int, default=None)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--reset-to-horizon", action="store_true",
                    help="recover from PositionCompactedError by SKIPPING "
                         "the compacted prefix (explicit data loss)")
    ap.add_argument("--backfill", action="store_true",
                    help="recover from PositionCompactedError by READING "
                         "the compacted prefix: drain it as one segment "
                         "(epochs=prefix-<covered>), commit past the "
                         "horizon, then continue epoch-by-epoch")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    from dataflow_mm_ray.streaming.consumer import (
        ParallelConsumer, PositionCompactedError, StreamConsumer)

    if args.backfill and args.dest_sink:
        # a compacted prefix has no per-epoch boundaries, so it cannot
        # be committed as downstream epochs without leaving a gap that
        # stalls downstream consumers — drain the prefix as a plain
        # segment first, then run --dest-sink for the tail
        ap.error("--backfill writes a plain segment; run it without "
                 "--dest-sink, then continue with --dest-sink")
    if args.member is not None or args.n_members is not None:
        if args.member is None or args.n_members is None:
            ap.error("--member and --n-members go together")
        c = ParallelConsumer(args.out, args.stream, group=args.group,
                             member=args.member, n_members=args.n_members)
    else:
        c = StreamConsumer(args.out, args.stream, group=args.group)
    if args.reset_to_horizon:
        c.reset_to_horizon()
    if args.backfill:
        ds, covered = c.backfill()
        if covered >= 0 and 0 < c.position() <= covered:
            # segments have no per-epoch boundaries: a group that
            # already drained part of the prefix would re-emit those
            # epochs into the union and double-count them silently —
            # refuse; the lossless paths are a FRESH group (position 0)
            # or downstream dedup keyed by the backfill
            print(json.dumps({
                "error": f"group {args.group!r} is mid-prefix (position "
                         f"{c.position()} <= compaction horizon {covered}): "
                         "a backfill would re-deliver epochs "
                         f"0..{c.position() - 1} already drained to --dest",
                "hint": "drain with a fresh --group, or reset-to-horizon "
                        "if re-reading the prefix elsewhere",
            }))
            raise SystemExit(2)
        if covered >= 0 and c.position() <= covered:
            import shutil

            rows = 0
            segment = None
            if ds is not None:
                # deterministic path keyed by the horizon. Ray's
                # write_parquet APPENDS uuid-named files, so a retry
                # after a crash-before-commit must CLEAN the segment
                # dir first or the rerun duplicates rows next to the
                # partial old write
                segment = os.path.join(args.dest, f"epochs=prefix-{covered}")
                shutil.rmtree(segment, ignore_errors=True)
                os.makedirs(segment, exist_ok=True)
                ds.write_parquet(segment)
                # count from the written files' footers — ds.count()
                # would re-execute the whole prefix read
                import glob as _glob

                import pyarrow.parquet as pq

                rows = sum(pq.read_metadata(f).num_rows
                           for f in _glob.glob(os.path.join(segment, "*.parquet")))
            c.commit(covered)
            print(json.dumps({
                "stream": args.stream, "group": args.group,
                "mode": "backfill", "upto_epoch": covered, "rows": rows,
                "segment": segment, "position": c.position(),
            }))

    if args.dest_sink:
        # exactly-once consume -> transform -> commit into a second
        # EpochSink: one epoch per iteration, downstream commit BEFORE
        # the consumer position advances. A kill anywhere re-polls the
        # same epoch; stage_and_commit is a no-op for committed epochs,
        # so the downstream stream equals an uninterrupted run.
        from dataflow_mm_ray.streaming.sink import EpochSink

        cols = args.columns.split(",") if args.columns else None
        # parallel members write DISJOINT slices of each epoch, but the
        # downstream sink keys commits by (stream, epoch): sharing one
        # sink root would let the first member's slice commit the epoch
        # and every other member's slice become a silent no-op. Each
        # member gets its own sink root; the union of the member roots
        # is the full stream, and each member's chain is independently
        # exactly-once.
        dest = args.dest
        if isinstance(c, ParallelConsumer):
            dest = os.path.join(dest, f"member{c.member}of{c.n_members}")
        down = EpochSink(dest, [args.stream])
        drained, rows = [], 0
        while True:
            try:
                epochs, ds = c.poll(max_epochs=1)
            except PositionCompactedError as e:
                print(json.dumps({"error": str(e),
                                  "hint": "--reset-to-horizon"}))
                raise SystemExit(2)
            if not epochs:
                break
            if args.max_epochs is not None and len(drained) >= args.max_epochs:
                break
            (epoch,) = epochs
            import pandas as pd

            df = ds.to_pandas() if ds is not None else pd.DataFrame()
            if cols and len(df):
                df = df[cols]
            with open(c.sink._manifest_path(args.stream, epoch)) as f:
                wm = json.load(f).get("watermark_us", 0)
            down.stage_and_commit(args.stream, epoch, df, wm)
            c.commit(epoch)
            drained.append(epoch)
            rows += len(df)
        print(json.dumps({
            "stream": args.stream, "group": args.group, "mode": "dest-sink",
            "dest": dest, "drained_epochs": drained, "rows": rows,
            "position": c.position(),
        }))
        ray.shutdown()
        return

    try:
        epochs, ds = c.poll(max_epochs=args.max_epochs)
    except PositionCompactedError as e:
        print(json.dumps({"error": str(e), "hint": "--reset-to-horizon"}))
        raise SystemExit(2)

    rows = 0
    segment = None
    if epochs:
        if ds is not None:
            # deterministic segment path from the epoch range; cleaned
            # first because Ray's write_parquet APPENDS uuid-named
            # files — a retry after a crash-before-commit would
            # otherwise duplicate rows next to the partial old write
            import shutil

            segment = os.path.join(
                args.dest, f"epochs={epochs[0]}-{epochs[-1]}")
            shutil.rmtree(segment, ignore_errors=True)
            os.makedirs(segment, exist_ok=True)
            ds.write_parquet(segment)
            # footer counts — ds.count() would re-execute the read
            import glob as _glob

            import pyarrow.parquet as pq

            rows = sum(pq.read_metadata(f).num_rows
                       for f in _glob.glob(os.path.join(segment, "*.parquet")))
        c.commit(epochs[-1])
    print(json.dumps({
        "stream": args.stream, "group": args.group,
        "drained_epochs": epochs, "rows": rows, "segment": segment,
        "position": c.position(),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
