"""R311-R313 batch: python replays + invariants for hough_lines,
integral_image, hist_equalization. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


def _occ(duck):
    from tree_sitter_analyzer_spark import grid
    from tree_sitter_analyzer_spark.synth import oracle_ctes

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"{oracle_ctes()} SELECT {grid.ix_sql('lon', 7)},"
        f" {grid.iy_sql('lat', 7)}, count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    return {(int(x), int(y)): int(n) for x, y, n in rows}


# --------------------------------------------------------------------- R311
def test_hough_lines_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.zonal import (
        HOUGH_FG_MILLI,
        HOUGH_RHO_OFF,
        HOUGH_RHO_W,
        HOUGH_TOPN,
        _hough_trig,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    occ = _occ(duck)
    zmax = max(occ.values())
    fg = [c for c, n in occ.items() if (1000 * n) // zmax >= HOUGH_FG_MILLI]
    assert fg
    acc = defaultdict(lambda: [0, 1 << 62, -(1 << 62)])
    for cx, cy in fg:
        for t, c, s in _hough_trig():
            rb = (cx * c + cy * s + HOUGH_RHO_OFF) // HOUGH_RHO_W
            a = acc[(t, rb)]
            a[0] += 1
            a[1] = min(a[1], cx)
            a[2] = max(a[2], cx)
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1][0], kv[0]))
    exp = [
        (r + 1, t, rb, v, mn, mx)
        for r, ((t, rb), (v, mn, mx)) in enumerate(ranked[:HOUGH_TOPN])
    ]

    out = load_all()["hough_lines"].spark_fn(spark, SF_TINY).toPandas()
    got = sorted(
        (int(r.rank), int(r.theta_deg), int(r.rho_bin), int(r.votes),
         int(r.cx_min), int(r.cx_max))
        for r in out.itertuples()
    )
    assert got == exp
    # a real peak: the top line collects well above one vote
    assert exp[0][3] >= 3
    # every vote count is bounded by the foreground size
    assert all(v <= len(fg) for _, _, _, v, _, _ in exp)


# --------------------------------------------------------------------- R312
def test_integral_image_boxes_exact(spark, duck):
    from tree_sitter_analyzer_spark.operators.zonal import SAT_BOXES
    from tree_sitter_analyzer_spark.registry import load_all

    occ = _occ(duck)
    xs = [x for x, _ in occ]
    ys = [y for _, y in occ]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)
    exp = {}
    for b in range(SAT_BOXES):
        xa = xmin + md5int_py(f"sbx0_{b}") % (xmax - xmin + 1)
        xb = xmin + md5int_py(f"sbx1_{b}") % (xmax - xmin + 1)
        ya = ymin + md5int_py(f"sby0_{b}") % (ymax - ymin + 1)
        yb = ymin + md5int_py(f"sby1_{b}") % (ymax - ymin + 1)
        x0, x1 = sorted((xa, xb))
        y0, y1 = sorted((ya, yb))
        total = sum(
            n for (cx, cy), n in occ.items()
            if x0 <= cx <= x1 and y0 <= cy <= y1
        )
        exp[b] = (x0, y0, x1, y1, total)

    out = load_all()["integral_image"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == SAT_BOXES
    for r in out.itertuples():
        x0, y0, x1, y1, total = exp[int(r.box_id)]
        assert (int(r.x0), int(r.y0), int(r.x1), int(r.y1)) == (
            x0, y0, x1, y1,
        )
        # BOTH answers equal the independent python sum, and the in-row
        # audit column holds
        assert int(r.sat_sum) == total
        assert int(r.direct_sum) == total
        assert bool(r.exact_match)
    # the seeded boxes actually cover mass: at least one non-empty
    assert any(v[4] > 0 for v in exp.values())


# --------------------------------------------------------------------- R313
def test_hist_equalization_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    occ = _occ(duck)
    zmax = max(occ.values())
    levels = Counter(((1000 * n) // zmax) // 16 for n in occ.values())
    n_tot = sum(levels.values())
    cum = 0
    cdf = {}
    for lv in sorted(levels):
        cum += levels[lv]
        cdf[lv] = cum
    cmin = min(cdf.values())
    exp = {
        lv: (levels[lv], cdf[lv],
             255 if n_tot == cmin
             else ((cdf[lv] - cmin) * 255) // (n_tot - cmin))
        for lv in levels
    }

    out = load_all()["hist_equalization"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert (int(r.n_cells), int(r.cdf), int(r.eq255)) == exp[int(r.level)]
    # remap invariants: monotone in level, full range endpoints
    srt = out.sort_values("level")
    eqs = [int(v) for v in srt.eq255]
    assert eqs == sorted(eqs)
    assert eqs[-1] == 255
    assert all(0 <= e <= 255 for e in eqs)
    # equalization spreads: the lowest occupied level maps to 0
    assert eqs[0] == 0
