"""R139 idw_loo_error: python replay of the sampled LOO estimates."""

from __future__ import annotations

import math

from .conftest import SF_TINY


def test_idw_loo_matches_python(spark):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators.knn import (
        IDW_D2_FLOOR, IDW_W_SCALE, idw_loo_error,
    )

    tiles = synth.tiles_df(spark, SF_TINY)
    pts = tiles.selectExpr(
        "image_id", "i", "lon", "lat", "CAST(w * h AS BIGINT) AS z"
    ).toPandas()
    rows = list(pts.itertuples())
    radius2 = 0.01 * 0.01
    expected = {}
    for q in rows:
        if q.i % 23 != 0:
            continue
        num = den = n = 0
        for t in rows:
            if t.image_id == q.image_id:
                continue
            d2 = (t.lon - q.lon) ** 2 + (t.lat - q.lat) ** 2
            if d2 > radius2:
                continue
            wt = IDW_W_SCALE // max(int(math.floor(d2 * 1e12)), IDW_D2_FLOOR)
            num += wt * int(t.z)
            den += wt
            n += 1
        if n:
            z_est = num // den
            expected[q.image_id] = (int(q.z), n, z_est, abs(z_est - int(q.z)))
    got = idw_loo_error(tiles).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert expected[r.query_id] == (
            int(r.z_act), int(r.n_nbrs), int(r.z_est), int(r.abs_err),
        )
