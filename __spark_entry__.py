"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``tree_sitter_analyzer_spark``; this module is
the thin spark-submit-able entry point (SURVEY.md §7 M9).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tree_sitter_analyzer_spark.registry import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: zonal statistics over the
    two-phase PIP join of the synthetic tiles table against the zone layer
    (the north rule's core operator chain: tile → cell index → cell join →
    exact verify → zonal roll-up)."""
    return _REGISTRY["zonal_stats"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents; keys without an oracle are omitted
    (driver records a weaker rows-only check for those)."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


if __name__ == "__main__":
    # spark-submit entry: run the flagship query and print a result sample
    # + row count (M9 packaging smoke).
    spark = SparkSession.builder.getOrCreate()
    df = entry(spark)
    print(f"rows={df.count()}")
    df.show(5)
    spark.stop()
