#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput_rows_per_sec": ...}

Modes:
  python bench.py              # single run at $SPARK_GRAFT_CPUS (default 32)
  python bench.py --cpus 8     # explicit parallelism (used by --scaling)
  python bench.py --scaling    # run at local[8] and local[32] in fresh
                               # subprocesses, compute N→4N scaling
                               # efficiency, write BENCH.md

The scaling mode evidences the north rule's two-cluster-size criterion
in-sandbox: same input, two parallelism levels, throughput at both +
efficiency = (T8/T32) / 4 … i.e. speedup/4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline suite: the north-rule core (tiling, PIP, kNN, zonal) plus the
# heaviest pipeline ops. Kept in one place so the scaling mode and the
# driver's per-round bench measure the same thing.
HEADLINE = [
    "ingest_summary",
    "tile_manifest",
    "pip_join",
    "knn",
    "zonal_stats",
    "phash_dups",
    "zone_assignment",
]


def run_bench(cpus: int) -> dict:
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.session import get_spark

    registry = load_all()
    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8))
    # Warm the JVM + parquet footer cache so we measure the engine, not
    # session startup (the reference separates cold-start from task time).
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.time()
    for name in HEADLINE:
        if name not in registry:
            continue
        t0 = time.time()
        n = registry[name].spark_fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n
    total = round(time.time() - t_all, 3)

    amp = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1"))
    n_tiles = spark.read.parquet(f"{SF_DIR}/orders.parquet").count() * amp
    join_rows = rows.get("pip_join", 0) + rows.get("knn", 0)
    spark.stop()
    return {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": cpus,
        "rows": rows,
        "tiles_plus_join_rows_per_sec": round((n_tiles + join_rows) / total, 1),
    }


def run_scaling() -> None:
    # Amplify the input so task compute dominates scheduling overhead —
    # the in-sandbox stand-in for the north rule's N vs 4N cluster runs.
    # Identical (amplified) input at both parallelism levels.
    amp = os.environ.get("SPARK_GRAFT_AMPLIFY", "8")
    env = dict(os.environ, SPARK_GRAFT_AMPLIFY=amp)
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--cpus", str(cpus)],
            capture_output=True, text=True, check=True, env=env,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["tiles_plus_join_rows_per_sec"]
    thr32 = results[32]["tiles_plus_join_rows_per_sec"]
    eff = round((thr32 / thr8) / 4.0, 3)
    report = {
        "local8_rows_per_sec": thr8,
        "local32_rows_per_sec": thr32,
        "speedup_8_to_32": round(thr32 / thr8, 3),
        "scaling_efficiency_Nto4N": eff,
    }
    with open("BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run {time.strftime('%Y-%m-%d %H:%M')} — "
            f"amplify={amp} (identical input both runs)\n\n"
            f"| parallelism | suite wall (s) | tiles+join-rows/sec |\n|---|---|---|\n"
            f"| local[8] | {results[8]['value']} | {thr8} |\n"
            f"| local[32] | {results[32]['value']} | {thr32} |\n\n"
            f"N→4N speedup: **{report['speedup_8_to_32']}×**, "
            f"scaling efficiency: **{eff}** (target ≥0.8)\n"
            f"Per-query (local[32]): {json.dumps(results[32]['queries'])}\n"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        if "--cpus" in sys.argv:
            cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(run_bench(cpus)))
