"""Bloom-filter runtime-filter invariants.

Oracle parity (tests/test_oracle_parity.py) proves Spark and DuckDB build
the identical filter; these tests pin the SEMANTIC contract both engines
could get identically wrong: one-sided error (no false negatives, ever)
and the m → ∞ degeneration to an exact membership test.
"""

from __future__ import annotations

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import bloom

from .conftest import SF_TINY


def test_bloom_one_sided_error(spark):
    """Every hot cell passes (n_pass − n_false_pos == n_keys exactly) and
    the filter is honest about its false positives: at 512 bits over ~100
    keys the fp count must be nonzero (otherwise the audit demonstrates
    nothing) yet far below the non-key population."""
    tiles = synth.tiles_df(spark, SF_TINY)
    row = bloom.bloom_audit(tiles, res=8).collect()[0]
    assert row.n_pass - row.n_false_pos == row.n_keys  # no false negatives
    assert row.n_bits_set <= min(bloom.M_BITS, bloom.K_HASHES * row.n_keys)
    assert 0 < row.n_false_pos < (row.n_cells - row.n_keys) // 10
    assert row.fp_rate_milli == 1000 * row.n_false_pos // (
        row.n_cells - row.n_keys
    )


def test_bloom_exact_at_wide_filter(spark):
    """With m far above k·n the filter must be collision-free: the probe
    admits exactly the key set (the m → ∞ limit), mirroring the count-min
    wide-sketch degeneration test."""
    tiles = synth.tiles_df(spark, SF_TINY)
    orig = bloom.M_BITS
    bloom.M_BITS = 1 << 22
    try:
        row = bloom.bloom_audit(tiles, res=8).collect()[0]
    finally:
        bloom.M_BITS = orig
    assert row.n_false_pos == 0
    assert row.n_pass == row.n_keys
