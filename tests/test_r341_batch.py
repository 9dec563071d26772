"""R341-R343 batch: python replays + invariants for moran_correlogram,
blur_metric, join_order_audit. Oracle parity rides test_oracle_parity
(moran_correlogram, join_order_audit); blur_metric is rows-only with a
numpy reference."""

from __future__ import annotations

import numpy as np

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R341
def test_moran_correlogram_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.operators.zonal import (
        MC_RES, MC_RINGS, _mc_offsets,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', MC_RES)}, {iy_sql('lat', MC_RES)},"
        " count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    occ = {(int(x), int(y)): int(n) for x, y, n in rows}
    zmax = max(max(occ.values()), 1)
    z = {c: (1000 * n) // zmax for c, n in occ.items()}
    nc = len(z)
    zbar = sum(z.values()) // nc
    d = {c: v - zbar for c, v in z.items()}
    den = sum(x * x for x in d.values())

    exp = {}
    for r in MC_RINGS:
        num = w = 0
        for (cx, cy), dv in d.items():
            for dx, dy in _mc_offsets(r):
                nb = d.get((cx + dx, cy + dy))
                if nb is not None:
                    num += dv * nb
                    w += 1
        i_abs = 0 if w == 0 or den == 0 else (
            (1000 * nc * abs(num)) // (w * den))
        sgn = 1 if num > 0 else (-1 if num < 0 else 0)
        exp[r] = (nc, w, num, den, sgn, i_abs)
        # ring weights are symmetric: every pair counted twice
        assert w % 2 == 0

    out = load_all()["moran_correlogram"].spark_fn(
        spark, SF_TINY).toPandas()
    got = {
        int(r.ring): (int(r.n_cells), int(r.w_pairs), int(r.num),
                      int(r.den), int(r.i_sign), int(r.i_abs_milli))
        for r in out.itertuples()
    }
    assert got == exp
    # density rasters cluster: ring-1 autocorrelation is positive
    assert exp[1][4] == 1
    # dependence decays: |I| at ring 1 >= |I| at ring 3
    assert exp[1][5] >= exp[3][5]


# --------------------------------------------------------------------- R342
def test_blur_metric_matches_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.codec import (
        decode_px, encode_px, synth_pixels,
    )
    from tree_sitter_analyzer_spark.sources.multimodal import (
        blur_features_np,
    )

    register_views(duck, SF_TINY)
    meta = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        "SELECT image_id, w, h, fmt, tile_kind FROM tiles WHERE i <= 8000"
    ).fetchall()
    want: dict[str, list[int]] = {}
    for image_id, w, h, fmt, kind in meta:
        px = decode_px(encode_px(synth_pixels(image_id, int(w), int(h)),
                                 fmt))
        n, var, mass = blur_features_np(px)
        assert var >= 0
        cur = want.setdefault(kind, [0, 0, -1, 1 << 62, 0, 0])
        cur[0] += 1
        cur[1] += n
        cur[2] = max(cur[2], var)
        cur[3] = min(cur[3], var)
        cur[4] += var
        cur[5] += mass

    out = load_all()["blur_metric"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tile_kind: [int(r.n_tiles), int(r.n_interior),
                      int(r.sharpest), int(r.blurriest),
                      int(r.var_mean_sum), int(r.abs_mass)]
        for r in out.itertuples()
    }
    assert got == want


def test_blur_metric_orders_flat_below_noise():
    """A flat tile has zero Laplacian variance; a checkerboard is the
    sharpest possible pattern."""
    from tree_sitter_analyzer_spark.sources.multimodal import (
        blur_features_np,
    )

    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    n, var, mass = blur_features_np(flat)
    assert (var, mass) == (0, 0)

    yy, xx = np.mgrid[0:8, 0:8]
    board = (((yy + xx) % 2) * 255).astype(np.uint8)
    px = np.stack([board, board, board], axis=-1)
    n2, var2, mass2 = blur_features_np(px)
    # every interior Laplacian is +/- 4*255 = 1020 (all 4 neighbors
    # are the opposite color); mean 0, var 1020^2
    assert n2 == 36 and var2 == 1020 * 1020 and mass2 == 36 * 1020


# --------------------------------------------------------------------- R343
def test_join_order_audit_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    n_c = duck.sql("SELECT count(*) FROM customer").fetchone()[0]
    n_o = duck.sql("SELECT count(*) FROM orders").fetchone()[0]
    n_l = duck.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    ndv_cck = duck.sql(
        "SELECT count(DISTINCT c_custkey) FROM customer").fetchone()[0]
    ndv_ock = duck.sql(
        "SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    ndv_ook = duck.sql(
        "SELECT count(DISTINCT o_orderkey) FROM orders").fetchone()[0]
    ndv_lok = duck.sql(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    act_co = duck.sql(
        "SELECT count(*) FROM customer c JOIN orders o"
        " ON o.o_custkey = c.c_custkey").fetchone()[0]
    act_ol = duck.sql(
        "SELECT count(*) FROM orders o JOIN lineitem l"
        " ON l.l_orderkey = o.o_orderkey").fetchone()[0]

    plans = {
        "co_then_l": ((n_c * n_o) // max(ndv_cck, ndv_ock, 1), act_co),
        "ol_then_c": ((n_o * n_l) // max(ndv_ook, ndv_lok, 1), act_ol),
    }
    est_pick = min(plans, key=lambda p: (plans[p][0], p))
    act_pick = min(plans, key=lambda p: (plans[p][1], p))

    out = load_all()["join_order_audit"].spark_fn(
        spark, SF_TINY).toPandas()
    assert len(out) == 2
    for r in out.itertuples():
        est, act = plans[r.plan]
        assert (int(r.est_mid), int(r.act_mid)) == (est, act)
        assert int(r.qerror_milli) == (
            1000 * max(est, act)) // max(min(est, act), 1)
        assert int(r.est_chosen) == (1 if r.plan == est_pick else 0)
        assert int(r.chose_right) == (1 if est_pick == act_pick else 0)
    # FK integrity makes the actuals exact: every order has a
    # customer, every line an order
    assert act_co == n_o and act_ol == n_l
    # the uniform-key estimator is exact on clean FK joins: q-error 1
    assert plans["ol_then_c"][0] == act_ol
