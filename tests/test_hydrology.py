"""Structural invariants for the raster-hydrology + spatial-stats batch
(flow accumulation, watershed basins, join counts, quadrat dispersion,
mosaic seams). Oracle parity at sf0.001 rides test_oracle_parity; these
pin the properties no value-hash can express: partition checksums, the
CSR expectation closure, and repartition invariance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import hydrology, pointpattern, zonal

from .conftest import SF_TINY


@pytest.fixture(scope="module")
def tiles(spark):
    return synth.tiles_df(spark, SF_TINY)


def test_watershed_is_a_partition(spark, tiles):
    """Basins tile the occupied-cell set exactly: member cells sum to the
    occupied count and drained tiles sum to the corpus total."""
    cells = hydrology.cell_frame(tiles)
    n_cells, n_tiles = cells.agg(F.count("*"), F.sum("n")).first()
    basins = hydrology.watershed_basins(tiles)
    got = basins.agg(F.sum("n_cells"), F.sum("n_tiles")).first()
    assert (got[0], got[1]) == (n_cells, n_tiles)


def test_watershed_peaks_are_fixpoints(spark, tiles):
    """Every basin id is a genuine peak: its parent pointer is itself
    (pointer doubling can only saturate at self-loops)."""
    par = hydrology.ascent_parent(hydrology.cell_frame(tiles))
    basins = hydrology.watershed_basins(tiles).select(F.col("basin").alias("v"))
    bad = basins.join(par, "v").where(F.col("p") != F.col("v")).count()
    assert bad == 0


def test_flow_accumulation_floor_and_total(spark, tiles):
    """acc >= 1 everywhere (every cell's own walk starts at itself) and
    sum(acc) == distinct (start, visited) pairs >= n_cells."""
    acc = hydrology.flow_accumulation(tiles)
    assert acc.where(F.col("acc") < 1).count() == 0
    n_cells = acc.count()
    assert acc.agg(F.sum("acc")).first()[0] >= n_cells


def test_watershed_repartition_invariant(spark, tiles):
    a = hydrology.watershed_basins(tiles).toPandas().sort_values("basin")
    b = (
        hydrology.watershed_basins(tiles.repartition(13))
        .toPandas()
        .sort_values("basin")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_join_counts_closure(spark, tiles):
    """Observed pairs and CSR expectations both sum to (almost exactly)
    the total adjacency count J: obs exactly, expectation within 3 milli
    per the three floors."""
    rows = {r["pair_kind"]: r for r in pointpattern.join_counts(tiles).collect()}
    assert set(rows) == {"BB", "WW", "BW"}
    j_obs = sum(r["n_pairs"] for r in rows.values())
    exp_sum = sum(r["expected_milli"] for r in rows.values())
    assert 0 <= 1000 * j_obs - exp_sum <= 3
    # hotspot corpus: hot-hot adjacency far above the CSR expectation
    assert 1000 * rows["BB"]["n_pairs"] > rows["BB"]["expected_milli"]


def test_quadrat_overdispersed(spark, tiles):
    row = pointpattern.quadrat_dispersion(tiles).first()
    assert row["n_quadrats"] >= row["n_occupied"] > 0
    # planted hotspots => variance-mean ratio far above the CSR value 1
    assert row["vmr"] >= 1


def test_mosaic_seam_bands_bounded(spark, tiles):
    rows = zonal.mosaic_seams(tiles).collect()
    assert rows, "res-9 mosaic must have adjacent canonical tiles"
    for r in rows:
        assert 0 <= r["band"] <= 8
        assert r["band"] * 8 <= r["min_hamming"] <= r["max_hamming"] < (r["band"] + 1) * 8
        assert r["n_seams"] >= 1
