"""Count-min sketch invariants + Mann-Kendall bounds.

Oracle parity (tests/test_oracle_parity.py) already proves the Spark and
DuckDB computations agree bit-for-bit; these tests pin the SEMANTIC
guarantees of the operators themselves — the things both engines could
get identically wrong.
"""

from __future__ import annotations

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import sketch, zonal

from .conftest import SF_TINY


def test_cms_never_underestimates_and_collisions_visible(spark):
    """est ≥ exact for EVERY token (the count-min one-sided-error
    guarantee); at width 16 over the ~31-token vocabulary, at least one
    top token must show collision bias (otherwise the sketch degenerates
    to an exact counter and the demo proves nothing)."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    pdf = sketch.cms_heavy_hitters(docs).toPandas()
    assert len(pdf) == sketch.TOP_K
    assert (pdf.cms_est >= pdf.exact_cnt).all()
    assert (pdf.overcount > 0).any()
    assert (pdf.overcount == 0).any()  # depth-3 min rescues some tokens


def test_cms_estimate_equals_exact_at_wide_sketch(spark):
    """With width far above the vocabulary size the sketch must be
    collision-free: est == exact everywhere (the w → ∞ limit)."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    orig = sketch.WIDTH
    sketch.WIDTH = 4096
    try:
        pdf = sketch.cms_heavy_hitters(docs).toPandas()
    finally:
        sketch.WIDTH = orig
    assert (pdf.cms_est == pdf.exact_cnt).all()


def test_mann_kendall_s_bounds_and_trend_consistency(spark):
    """|S| ≤ C(6,2) = 15 always; the trend class must re-derive from S."""
    pdf = zonal.mann_kendall(
        synth.tiles_df(spark, SF_TINY), res=7, min_total=6
    ).toPandas()
    assert len(pdf) > 0
    assert pdf.s_stat.abs().max() <= 15
    for _, r in pdf.iterrows():
        want = (
            "rising" if r.s_stat >= 9
            else "falling" if r.s_stat <= -9
            else "flat"
        )
        assert r.trend == want
