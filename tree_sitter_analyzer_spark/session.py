"""SparkSession factory with scale-oriented defaults.

The reference engine hand-tunes parallelism (process pool sizing,
``ast_cache.py:469-480``); here the equivalent knobs are AQE + shuffle
partition sizing, set once at session build time. Everything else
(join strategy, partial aggregation, spill) is Catalyst/Tungsten's job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test box has 32 cores; a real deployment overrides via spark-submit.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tree-sitter-analyzer-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    - AQE on: runtime coalesce of shuffle partitions, skew-join splitting
      (the salting fallback for hot H3 cells, SURVEY.md O10).
    - ``spark.sql.session.timeZone=UTC``: required for DuckDB-oracle
      timestamp parity.
    - Arrow enabled: every UDF in this engine is a vectorized pandas UDF
      (input_hint: "no per-row Python").
    """
    n = cpus or DEFAULT_CPUS
    sp = shuffle_partitions or max(n, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
