"""Negative proof for the stretch-density smoke (round-4 verdict #8):
the detector must be ABLE to fail — a plan that materializes the raw
eps-neighbor pair list on the densified geometry must trip the smoke's
row cap, while the real in-stream plans stay far under it. Both halves
are asserted here so the smoke is a live tripwire, not a tautology.
"""

from __future__ import annotations

import os

from .conftest import SF_SMALL, SF_TINY


def test_dense_knob_reaches_stress_regime_and_pair_list_would_blow(spark):
    from pyspark.sql import functions as F

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators.dbscan import DBSCAN_RES
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql

    def cells(dense, sf=SF_TINY):
        os.environ["SPARK_GRAFT_DENSE"] = "1" if dense else "0"
        try:
            t = synth.tiles_df(spark, sf)
            return (
                t.groupBy(
                    F.expr(ix_sql("lon", DBSCAN_RES)).alias("cx"),
                    F.expr(iy_sql("lat", DBSCAN_RES)).alias("cy"),
                )
                .count()
            )
        finally:
            os.environ.pop("SPARK_GRAFT_DENSE", None)

    fan_normal = (
        cells(False).agg(F.sum(F.col("count") * F.col("count"))).first()[0]
    )
    dense_cells = cells(True).localCheckpoint(eager=True)
    fan_dense = (
        dense_cells.agg(F.sum(F.col("count") * F.col("count"))).first()[0]
    )
    # knob works: >= 20x concentration of the would-be pair fan
    assert fan_dense >= 20 * fan_normal, (fan_normal, fan_dense)

    # the BAD plan (materialized per-cell pair list) exceeds the smoke's
    # row cap at the smoke's own scale (sf0.01) — count() aggregates, so
    # proving the size is cheap; materializing it is exactly what the
    # discipline forbids
    sm_cells = cells(True, SF_SMALL).localCheckpoint(eager=True)
    a = sm_cells.selectExpr("cx", "cy", "count AS na")
    b = sm_cells.selectExpr("cx AS bx", "cy AS by", "count AS nb")
    pair_rows = (
        a.join(b, (F.col("cx") == F.col("bx")) & (F.col("cy") == F.col("by")))
        .agg(F.sum(F.col("na") * F.col("nb")))
        .first()[0]
    )
    from tests.smoke_dense import ROW_CAP

    assert pair_rows > ROW_CAP, pair_rows
