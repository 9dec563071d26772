"""Stretch-density smoke (round-4 verdict #8): run the pair-generating
queries with the SPARK_GRAFT_DENSE geometry — same row count, ~20x the
per-cell concentration (every tile in a hotspot, half the jitter) — the
regime where a materialized neighbor-pair list goes quadratic and kills
executors. The sf0.1 smoke catches density blowups only as they occur
naturally; this knob manufactures them on demand at sf0.01, so the
in-stream-aggregation discipline (CLAUDE.md: pair rows must die inside
the join stage) is regression-tested every round in ~2 minutes.

Usage: python tests/smoke_dense.py [sf_dir]

Prints per-query wall + output rows; exits 1 on any failure or if the
density knob did not reach the stress regime (see the fan-size probe —
the same metric tests/test_dense_guard.py proves can fail).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: the dense env knob is set inside main(), NOT at module level —
# test_dense_guard.py imports ROW_CAP from here, and a module-level
# os.environ write would leak dense geometry into every later test in
# the pytest process (it DID: test_golden failed suite-wide until this
# moved).

# The pair-generating families the density regime stresses (the
# round-4 verdict's list): eps-disk joins, space-time contact joins,
# proximity graphs, distance-band joins, point-pattern pair ladders,
# temporal contact closure, kNN candidate fans.
DENSE_QUERIES = [
    "dbscan_clusters",
    "knox_spacetime",
    "convoy_pairs",
    "colocation_pairs",
    "gabriel_graph",
    "cross_k_pairs",
    "knn_self",
    "knn",
    "hausdorff_pairs",
    "epidemic_reach",
]
# (radius_join is qpoints-vs-tiles: under the dense geometry all
# tiles leave the probe disks, so it is vacuous here — replaced by
# hausdorff_pairs, whose cell-banded tile-vs-tile fan IS stressed.)

ROW_CAP = 2_000_000  # a pair query emitting more than this at sf0.01
# is leaking raw pair rows instead of aggregating in-stream


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ["SPARK_GRAFT_DENSE"] = "1"
    from pyspark.sql import functions as F

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators.dbscan import DBSCAN_RES
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.session import get_spark

    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql

    spark = get_spark(cpus=16, shuffle_partitions=32)

    # Density probe: the would-be materialized eps-pair fan is
    # sum(n_cell^2) over the candidate-join cells. Assert the knob put
    # the data in the stress regime (>= 20x the normal-geometry fan).
    def fan(dense: bool) -> int:
        os.environ["SPARK_GRAFT_DENSE"] = "1" if dense else "0"
        t = synth.tiles_df(spark, sf)
        return (
            t.groupBy(
                F.expr(ix_sql("lon", DBSCAN_RES)),
                F.expr(iy_sql("lat", DBSCAN_RES)),
            )
            .count()
            .agg(F.sum(F.col("count") * F.col("count")))
            .first()[0]
        )

    fan_normal, fan_dense = fan(False), fan(True)
    os.environ["SPARK_GRAFT_DENSE"] = "1"
    ratio = fan_dense / max(fan_normal, 1)
    print(f"pair-fan probe at res {DBSCAN_RES}: normal={fan_normal:,} "
          f"dense={fan_dense:,} ratio={ratio:.1f}x", flush=True)
    if ratio < 20:
        print("FAIL: density knob did not reach the stress regime")
        return 1

    qs = load_all()
    failures = []
    for name in DENSE_QUERIES:
        t0 = time.time()
        try:
            n = qs[name].spark_fn(spark, sf).count()
            wall = time.time() - t0
            ok = n <= ROW_CAP
            print(f"{name:20s} {'ok  ' if ok else 'FAIL-rowcap'} "
                  f"rows={n:9d} {wall:6.1f}s", flush=True)
            if not ok:
                failures.append(name)
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(f"{name:20s} FAIL  {type(exc).__name__} "
                  f"{time.time() - t0:6.1f}s", flush=True)
            failures.append(name)
    print(f"\ndense smoke at {sf}: failures={failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
