"""R136 slope/aspect: independent python replay + structural invariants."""

from __future__ import annotations

from collections import Counter

from .conftest import SF_TINY


def test_slope_aspect_matches_python(spark):
    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.operators.zonal import (
        _SLOPE_DIRS, SLOPE_RES, slope_aspect,
    )

    tiles = synth.tiles_df(spark, SF_TINY)
    occ: Counter = Counter()
    for r in tiles.selectExpr(
        f"{grid.ix_sql('lon', SLOPE_RES)} AS cx",
        f"{grid.iy_sql('lat', SLOPE_RES)} AS cy",
    ).toPandas().itertuples():
        occ[(int(r.cx), int(r.cy))] += 1

    got = slope_aspect(tiles).toPandas()
    assert len(got) == len(occ)
    for r in got.itertuples():
        n = occ[(int(r.cx), int(r.cy))]
        nbrs = [
            (occ.get((r.cx + dx, r.cy + dy), 0), d)
            for d, (dx, dy) in enumerate(_SLOPE_DIRS)
        ]
        mn, d = min(nbrs)
        assert (int(r.n), int(r.min_nbr), int(r.drop)) == (n, mn, n - mn)
        assert int(r.aspect) == (-1 if n - mn < 0 else d)
        # pits are exactly the negative-drop cells
        assert (r.grade == "pit") == (n - mn < 0)
