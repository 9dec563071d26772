"""10x-scale smoke: execute EVERY registered query Spark-side at sf0.1
(the correctness oracles stay at sf0.01 — DuckDB's naive all-pairs
mirrors don't scale; the Spark plans must). Records per-query wall and
row count; a query that only worked because the data was small (a hidden
cartesian, a driver collect, a broadcast that stops fitting) fails or
times out here instead of on the cluster.

Usage: python tests/smoke_sf01.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.session import get_spark

    spark = get_spark(cpus=16, shuffle_partitions=32)
    failures = []
    total = 0.0
    qs = load_all()
    for i, (name, q) in enumerate(qs.items()):
        t0 = time.time()
        try:
            n = q.spark_fn(spark, sf).count()
            wall = time.time() - t0
            total += wall
            print(f"{i:3d} {name:28s} ok    rows={n:8d} {wall:6.1f}s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            wall = time.time() - t0
            total += wall
            failures.append(name)
            print(f"{i:3d} {name:28s} FAIL  {type(exc).__name__} "
                  f"{wall:6.1f}s", flush=True)
    print(f"\n{len(qs)} queries at {sf}: failures={failures}; "
          f"total wall {total:.0f}s")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
