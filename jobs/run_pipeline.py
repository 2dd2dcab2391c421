"""Cluster entry point for declarative batch pipelines.

The engine twin of "python the pipeline script" (SURVEY §3.1/§3.2 —
the reference's only execution path: a script chaining op.run(storage)
over per-step cache files). Here the chain is a JSON spec resolved
through the operator registry and run as ONE lazy Ray Data stream;
``--cache-dir`` opts into durable per-step parquet IR with spec-hashed
skip-on-rerun (see pipelines/runner.py).

Local run:
    python jobs/run_pipeline.py jobs/specs/docprep_chain.json \
        --sf-dir /root/testdata/sf0.001 --out /tmp/pipe-out

Cluster run:
    ray job submit --working-dir . -- \
        python jobs/run_pipeline.py spec.json --sf-dir s3://bucket/in \
        --out s3://bucket/out --cache-dir s3://bucket/steps

The job owns its Ray session (guarded init); the engine never calls
ray.init. Rerunning with the same --cache-dir skips completed steps.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("spec", help="JSON pipeline spec (source + steps)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True, help="result parquet directory")
    ap.add_argument("--cache-dir", default=None,
                    help="durable per-step IR dir (enables step resume)")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every step even if cached")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from dataflow_mm_ray.pipelines.runner import load_pipeline_spec, run_pipeline
    from dataflow_mm_ray.sources.tables import read_table

    source_spec, steps = load_pipeline_spec(args.spec)
    table = source_spec.get("table", "documents")
    columns = source_spec.get("columns")
    ds = read_table(args.sf_dir, table, columns=columns)

    report = []
    out_ds = run_pipeline(
        ds, steps,
        cache_dir=args.cache_dir,
        resume=not args.no_resume,
        source_tag=f"{args.sf_dir}:{table}",
        report=report,
    )
    os.makedirs(args.out, exist_ok=True)
    out_ds.write_parquet(args.out)
    n = out_ds.count()
    print(json.dumps({
        "rows": n,
        "out": args.out,
        "steps": [dataclasses.asdict(r) for r in report],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
