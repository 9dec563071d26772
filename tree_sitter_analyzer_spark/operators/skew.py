"""Explicit skew handling: salted two-phase aggregation + hot-key join
salting (SURVEY.md O10; north rule "salted-key skew handling").

The synthetic tiles cluster 20% of rows around 3 hotspots (synth.py), so a
handful of res-9 cells carry orders of magnitude more tiles than the
median — the test-file-demotion / noise-blacklist problem of the reference
(_ast_cache_query.py:169-267) in spatial form.

Two tools:
- ``salted_count``: groupBy with a synthetic salt → partial counts on
  (key, salt) → final merge on key. Spark's hash agg already does partial
  aggregation map-side, so this matters when the *partial* state itself is
  the bottleneck (huge distinct-key maps) or when the downstream op is a
  join on the hot key.
- ``salted_join_big_small``: replicate the small side R ways, salt the big
  side's hot keys — the classic broadcast-free skew-join. AQE's
  skewJoin handles sort-merge cases automatically (enabled in session.py);
  this explicit form covers the cases AQE can't see (e.g. skew introduced
  by an explode AFTER the last exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count: (key, salt) partial → key final. Result is
    identical to ``df.groupBy(key).count()`` (verified in tests); the salt
    bounds any single reducer's share of a hot key to 1/n_salts.

    The salt MUST vary per row, not per key value — ``xxhash64(key)`` is
    constant within a key and silently degenerates to a plain groupBy
    (result-identical, so only a skew inspection catches it).
    ``spark_partition_id`` spreads a hot key across every input partition
    it appears in, up to n_salts buckets, and keeps the plan fully
    deterministic."""
    partial = (
        df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_join_big_small(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Equi-join with the small side replicated n_salts× and the big side
    salted — every (key, salt) bucket lands on a different reducer, so one
    hot key spreads across n_salts tasks. Row-for-row identical to
    ``big.join(small, key)``. Same per-row-salt requirement as
    :func:`salted_count` (a key-derived salt would be a no-op)."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")


def cell_histogram(tiles_cells: DataFrame, buckets: int = 10) -> DataFrame:
    """Skew diagnostic: distribution of tiles-per-cell (log2 buckets) —
    the "task-time histogram" evidence SURVEY.md §7.3 asks for."""
    per_cell = tiles_cells.groupBy("cell").agg(F.count("*").alias("n"))
    return (
        per_cell.withColumn(
            "bucket", F.least(F.lit(buckets - 1), F.floor(F.log2("n")).cast("int"))
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_cells"), F.sum("n").alias("n_tiles"))
        .orderBy("bucket")
    )
