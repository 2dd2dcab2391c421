"""Print Ray Data execution stats for a registered query — the
measure-don't-guess loop for per-stage tuning:

    PYTHONPATH=. python tools/stats_probe.py <query> [sf_dir]

Shows per-operator wall/cpu/rows/memory from ds.stats() for Dataset
results (partition_map pipelines execute eagerly at the exchange, so
their read/split/reduce cost shows up as the from_pandas_refs input;
the map stages after it are what this probe tunes)."""
from __future__ import annotations

import sys


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(sys.argv[3]) if len(sys.argv) > 3 else 32,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import time

    from dataflow_mm_ray.queries import registry

    t0 = time.perf_counter()
    res = registry()[name].fn(sf_dir)
    if hasattr(res, "stats"):
        res = res.materialize()  # stats attach to the executed plan
        n = res.count()
        print(f"rows={n} wall={time.perf_counter() - t0:.2f}s")
        print(res.stats())
    else:
        print(f"rows={len(res)} wall={time.perf_counter() - t0:.2f}s (driver DataFrame result)")
    ray.shutdown()


if __name__ == "__main__":
    main()
