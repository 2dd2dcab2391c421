"""Local stand-in for the driver's correctness gate.

Runs every registered query's Ray pipeline AND its DuckDB oracle on the
same sf dir, then compares row count, column names and an
order-insensitive value frame. Usage:

    python tools/check_correctness.py [--json out.json] [sf_dir] [query ...]

--json writes one machine-readable record per query (status, rows,
oracle kind) so a full local run can be committed as a round artifact —
the driver's own gate samples a subset; this surfaces every query in
one file.
"""
from __future__ import annotations

import json
import sys


def main():
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dataflow_mm_ray.queries import registry
    from dataflow_mm_ray.testing import assert_matches_oracle, duckdb_con, to_pandas

    con = duckdb_con(sf_dir)
    failed = []
    records = {}
    for name, q in registry().items():
        if only and name not in only:
            continue
        if q.sql is None:
            try:
                got = to_pandas(q.fn(sf_dir))
                print(f"ok   {name}: rows-only ({len(got)} rows)")
                records[name] = {"status": "ok", "check": "rows-only", "rows": len(got)}
            except Exception as e:
                print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
                failed.append(name)
                records[name] = {"status": "fail", "check": "rows-only", "error": f"{type(e).__name__}: {e}"}
            continue
        try:
            got = assert_matches_oracle(q.fn(sf_dir), con, q.sql)
            print(f"ok   {name}: {len(got)} rows match oracle (bit-exact)")
            records[name] = {"status": "ok", "check": "sql-oracle-bit-exact", "rows": len(got)}
        except AssertionError as e:
            print(f"FAIL {name}: mismatch")
            print("\n".join(str(e).splitlines()[0:6]))
            failed.append(name)
            records[name] = {"status": "fail", "check": "sql-oracle", "error": str(e).splitlines()[0]}
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            failed.append(name)
            records[name] = {"status": "fail", "check": "sql-oracle", "error": f"{type(e).__name__}: {e}"}
    ray.shutdown()
    if json_path:
        n_sql = sum(1 for r in records.values() if r["check"].startswith("sql"))
        summary = {
            "sf_dir": sf_dir,
            "total": len(records),
            "sql_oracled": n_sql,
            "rows_only": len(records) - n_sql,
            "failed": failed,
            "queries": records,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
