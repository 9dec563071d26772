"""Simplification / revisitation / NN-profile invariants.

Oracle parity (tests/test_oracle_parity.py) proves both engines compute
the same thing; these pin the SEMANTIC contracts both could get
identically wrong.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import pointpattern, trajectory as traj

from .conftest import SF_TINY


def _pings(spark):
    return traj.pings_df(spark, SF_TINY)


def test_simplify_tolerance_limits(spark):
    """tol=0 keeps every vertex (area2 >= 0 always); tol → ∞ keeps only
    the two endpoints; the default sits strictly between, with zero
    dropped mass at tol=0 and monotone retention."""
    p = _pings(spark)
    full = traj.simplify_stats(p, tol=0).toPandas()
    assert (full.n_kept == full.n_pings).all()
    assert (full.kept_milli == 1000).all()
    assert (full.dropped_area2 == 0).all()
    ends = traj.simplify_stats(p, tol=1 << 60).toPandas()
    assert (ends.n_kept == ends.n_pings.clip(upper=2)).all()
    mid = traj.simplify_stats(p, tol=400).toPandas()
    m = mid.set_index("user_id")
    e = ends.set_index("user_id")
    assert (m.n_kept >= e.n_kept).all()
    assert (m.n_kept <= m.n_pings).all()
    assert (m.n_kept >= 2).all()  # endpoints always survive


def test_revisit_bounds_and_totals(spark):
    """n_revisited <= n_cells, returns >= revisited cells, and Σ n_cells
    equals the distinct (user, cell) count computed independently."""
    p = _pings(spark)
    pdf = traj.revisit_stats(p, res=9).toPandas()
    assert (pdf.n_revisited <= pdf.n_cells).all()
    assert (pdf.n_returns >= pdf.n_revisited).all()
    assert set(pdf.mobility_class) <= {"returner", "explorer"}
    s = traj._shift(9)
    truth = (
        p.selectExpr(
            "user_id", f"(ix DIV {s}) * {traj._PACK} + (iy DIV {s}) AS cell"
        )
        .distinct()
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    got = pdf.set_index("user_id")["n_cells"]
    assert got.sort_index().equals(truth.sort_index().astype(got.dtype))


def test_nn_profile_bounds(spark):
    """min <= mean <= max per kind; every sampled tile contributes to
    exactly one kind row; NN distance positive (no tile co-located with a
    distinct image in the synthetic geography)."""
    tiles = synth.tiles_df(spark, SF_TINY)
    pdf = pointpattern.nn_distance_stats(tiles).toPandas()
    assert (pdf.min_nn_d2_nano <= pdf.mean_nn_d2_nano).all()
    assert (pdf.mean_nn_d2_nano <= pdf.max_nn_d2_nano).all()
    assert (pdf.min_nn_d2_nano > 0).all()
    n_sampled = tiles.where(
        f"i % {pointpattern.SAMPLE_MOD} = 0"
    ).count()
    assert pdf.n_q.sum() == n_sampled
