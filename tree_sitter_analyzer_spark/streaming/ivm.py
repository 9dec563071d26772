"""Incremental view maintenance (IVM) for the zonal roll-up.

The reference keeps its project-level aggregates current by re-running
the affected extractors on change and merging results into the store
(``incremental_sync.py:78-330``); at engine scale the analog is a
MAINTAINED aggregate: the standing zonal-count view is updated per
micro-batch from each batch's delta instead of recomputing the whole
corpus — the continuous-rollup pattern a 100 TB/day ingest actually runs.

Shape: counts form a commutative monoid, so
``state ⊕ delta(batch)`` == recompute over all rows ever seen (pinned by
tests/test_streaming.py against the batch recompute). Per batch the
data-sized work is ONLY the batch's own PIP join + partial agg; the merge
touches ~#zones rows (a broadcast-sized frame), so maintenance cost is
O(batch), never O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pip_join import pip_join


def delta_zonal_counts(batch: DataFrame, zones: DataFrame, res: int = 9) -> DataFrame:
    """Per-zone tile-count delta contributed by one micro-batch: the same
    broadcast-cover PIP join as the batch operator, aggregated to
    (polygon_id, n) — map-side combine makes this one small exchange."""
    return (
        pip_join(batch, zones, res=res)
        .groupBy("polygon_id")
        .agg(F.count("*").alias("n"))
    )


def merge_counts(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Monoid merge of two (polygon_id, n) frames — full-outer on the
    zone key, null-safe sum. Both sides are zone-sized (tiny)."""
    s = state.select("polygon_id", F.col("n").alias("n_old"))
    d = delta.select("polygon_id", F.col("n").alias("n_new"))
    return (
        s.join(d, "polygon_id", "full_outer")
        .select(
            "polygon_id",
            (
                F.coalesce(F.col("n_old"), F.lit(0))
                + F.coalesce(F.col("n_new"), F.lit(0))
            ).alias("n"),
        )
    )


class ZonalCountIVM:
    """Driver-held maintained view: plug ``on_batch`` into
    ``writeStream.foreachBatch``. State is a zone-sized DataFrame pinned
    behind an eager localCheckpoint per batch (bounded lineage — the
    graph-loop discipline); a production deployment would MERGE INTO an
    Iceberg table instead (the state is already in merge form)."""

    def __init__(self, spark, zones: DataFrame, res: int = 9):
        self._zones = zones
        self._res = res
        # empty state with the zone table's own key type
        self.state: DataFrame = zones.select("polygon_id").limit(0).withColumn(
            "n", F.lit(0).cast("bigint")
        )

    def on_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        delta = delta_zonal_counts(batch, self._zones, self._res)
        self.state = merge_counts(self.state, delta).localCheckpoint(eager=True)
