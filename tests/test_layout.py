"""Z-order layout operator: file-range disjointness + locality win.

Oracle parity for ``zorder_layout`` runs in test_oracle_parity (registry
auto-parametrized); these pin the properties parity can't see — that the
PHYSICAL layout pass produces range-disjoint files (what Iceberg/parquet
min-max pruning needs) and that Z-order actually buys locality over
insertion order (the reason to run the pass at all).
"""

from __future__ import annotations

import glob

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import layout as L

from .conftest import SF_TINY


def test_write_zordered_files_are_range_disjoint(spark, tmp_path):
    """repartitionByRange(zkey) + sortWithinPartitions → every file owns
    a disjoint Morton-key range, so a key-range scan prunes by parquet
    min/max stats alone."""
    L.write_zordered(synth.tiles_df(spark, SF_TINY), str(tmp_path / "z"), 8)
    ranges = []
    for f in sorted(glob.glob(str(tmp_path / "z" / "*.parquet"))):
        t = pq.read_table(f, columns=["zkey"])
        if t.num_rows:
            ranges.append((pc.min(t["zkey"]).as_py(), pc.max(t["zkey"]).as_py()))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_zorder_buckets_beat_id_buckets_on_locality(spark):
    """The audit's recorded numbers must show the win: total bbox area of
    Z-order buckets at least 5× below insertion-order buckets (measured
    ~12× on the synthetic geography)."""
    audit = L.zorder_layout_audit(
        synth.tiles_df(spark, SF_TINY), n_buckets=32
    ).toPandas()
    tot = audit.groupby("layout")["bbox_area"].sum()
    assert tot["zorder"] * 5 < tot["by_id"], tot.to_dict()


def test_morton_key_matches_numpy_interleave(spark):
    """Portable-SQL bit interleave == numpy reference on the tiny table."""
    import numpy as np

    pdf = (
        synth.tiles_df(spark, SF_TINY)
        .select("lon", "lat", L.morton_col("lon", "lat", 9).alias("zkey"))
        .toPandas()
    )
    ix = np.floor((pdf.lon.to_numpy() + 180.0) * 512).astype(np.int64)
    iy = np.floor((pdf.lat.to_numpy() + 90.0) * 512).astype(np.int64)
    want = np.zeros(len(pdf), dtype=np.int64)
    for k in range(18):
        want |= ((ix >> k) & 1) << (2 * k + 1)
        if k < 17:
            want |= ((iy >> k) & 1) << (2 * k)
    assert (pdf.zkey.to_numpy() == want).all()


def test_hilbert_key_is_a_true_hilbert_curve():
    """Bijection + unit-step adjacency on full grids (the defining curve
    properties), via the pure-python mirror of the SQL step arithmetic."""
    from tree_sitter_analyzer_spark.operators.layout import py_hilbert

    for k in (2, 3, 4):
        n = 1 << k
        m = {py_hilbert(x, y, k): (x, y) for x in range(n) for y in range(n)}
        assert sorted(m) == list(range(n * n))
        for d in range(1, n * n):
            (x1, y1), (x2, y2) = m[d - 1], m[d]
            assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_spark_matches_python_and_beats_zorder(spark):
    """The Spark 18-step chain must equal the python mirror per cell, and
    the audit must record Hilbert's locality win: total bucket bbox area
    strictly below Z-order's on the clustered synthetic corpus."""
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import layout

    tiles = synth.tiles_df(spark, SF_TINY)
    from tree_sitter_analyzer_spark import grid
    from pyspark.sql import functions as F

    cells = (
        tiles.select(
            grid.ix_col("lon", layout.LAYOUT_RES).alias("ix"),
            grid.iy_col("lat", layout.LAYOUT_RES).alias("iy"),
        )
        .distinct()
    )
    got = layout.hilbert_cells(cells).toPandas()
    for r in got.itertuples(index=False):
        assert layout.py_hilbert(int(r.ix), int(r.iy)) == int(r.hkey)
    audit = layout.hilbert_layout_audit(tiles).toPandas()
    sums = audit.groupby("layout").bbox_area.sum()
    assert sums["hilbert"] < sums["zorder"]


def test_write_hilbert_files_are_range_disjoint(spark, tmp_path):
    """The Hilbert writer must produce parquet files whose hkey min/max
    ranges are pairwise disjoint (the file-pruning contract), exactly
    like the Z-order writer's."""
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import layout

    out = str(tmp_path / "hilbert_tiles")
    layout.write_hilbert(
        synth.tiles_df(spark, SF_TINY), out, n_files=8
    )
    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("hkey")
        los = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        his = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        if los:
            ranges.append((min(los), max(his)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
