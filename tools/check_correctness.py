"""Local stand-in for the driver's correctness gate.

Runs every registered query's Ray pipeline AND its DuckDB oracle on the
same sf dir, then compares row count, column names and an
order-insensitive value frame. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import assert_matches_oracle, duckdb_con, to_pandas

    con = duckdb_con(sf_dir)
    failed = []
    for name, q in registry().items():
        if only and name not in only:
            continue
        if q.sql is None:
            try:
                got = to_pandas(q.fn(sf_dir))
                print(f"ok   {name}: rows-only ({len(got)} rows)")
            except Exception as e:
                print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
                failed.append(name)
            continue
        try:
            got = assert_matches_oracle(q.fn(sf_dir), con, q.sql)
            print(f"ok   {name}: {len(got)} rows match oracle (bit-exact)")
        except AssertionError as e:
            print(f"FAIL {name}: mismatch")
            print("\n".join(str(e).splitlines()[0:6]))
            failed.append(name)
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            failed.append(name)
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
