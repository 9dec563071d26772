"""Skew-handling tests: salted plans must be row-identical to naive plans,
and the synthetic hotspots must actually produce measurable skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import skew
from tree_sitter_analyzer_spark.operators.pip_join import tile_cells

from .conftest import SF_TINY


def test_salted_count_equals_naive(spark):
    t = tile_cells(synth.tiles_df(spark, SF_TINY), res=9)
    naive = {r["cell"]: r["count"] for r in t.groupBy("cell").count().collect()}
    salted = {r["cell"]: r["count"] for r in skew.salted_count(t, "cell").collect()}
    assert naive == salted


def test_salted_join_equals_naive(spark):
    t = tile_cells(synth.tiles_df(spark, SF_TINY), res=7).select("image_id", "cell")
    dim = (
        t.groupBy("cell").count().withColumnRenamed("count", "cell_pop")
    )
    naive = t.join(dim, "cell")
    salted = skew.salted_join_big_small(t, dim, "cell")
    assert naive.count() == salted.count()
    assert naive.exceptAll(salted.select(*naive.columns)).count() == 0


def test_hotspots_create_real_skew(spark):
    """The fixture's hotspot clusters must make the top cell ≫ median —
    otherwise the skew machinery is tested against nothing. (res 7 at
    sf_tiny: each hotspot spans ~4 res-7 cells; at bench scale the same
    clustering skews res 9.)"""
    t = tile_cells(synth.tiles_df(spark, SF_TINY), res=7)
    per_cell = t.groupBy("cell").agg(F.count("*").alias("n"))
    stats = per_cell.agg(
        F.max("n").alias("mx"),
        F.expr("percentile_approx(n, 0.5)").alias("med"),
    ).collect()[0]
    assert stats["mx"] >= 10 * stats["med"], (stats["mx"], stats["med"])


def test_cell_histogram_shape(spark):
    t = tile_cells(synth.tiles_df(spark, SF_TINY), res=9)
    hist = skew.cell_histogram(t).collect()
    assert sum(r["n_tiles"] for r in hist) == 1500
    assert len(hist) >= 2  # multiple magnitude buckets = real spread


def test_approx_distinct_within_tolerance(spark):
    """A10: the HLL++ sketch path stays within its declared error of the
    exact per-zone distinct counts."""
    from tree_sitter_analyzer_spark.operators.zonal import (
        zonal_stats,
        zonal_stats_approx,
    )

    zones = synth.zones_df(spark)
    tiles = synth.tiles_df(spark, SF_TINY)
    exact = {
        r["polygon_id"]: r["n_distinct_phash"]
        for r in zonal_stats(tiles, zones).collect()
    }
    approx = {
        r["polygon_id"]: r["n_distinct_phash_approx"]
        for r in zonal_stats_approx(tiles, zones, rsd=0.02).collect()
    }
    assert set(exact) == set(approx)
    for pid, ex in exact.items():
        assert abs(approx[pid] - ex) <= max(2, 0.1 * ex), (pid, ex, approx[pid])
