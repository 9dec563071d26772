"""R233-R235 batch: python replays + invariants for std_ellipse,
seasonal_decomposition, fd_ind_audit. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

import math

from .conftest import SF_TINY, register_views

_DAY_US = 86400000000


# --------------------------------------------------------------------- R233
def test_std_ellipse_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pts = duck.sql(
        f"{synth.oracle_ctes()} SELECT lon, lat FROM tiles"
    ).fetchall()
    stats: dict[str, list[int]] = {}
    for lon, lat in pts:
        hot = any(
            abs(lon - hx) <= 0.011 and abs(lat - hy) <= 0.011
            for hx, hy in synth.HOTSPOTS
        )
        band = "hot" if hot else "cold"
        x = math.floor((lon - 139.5) * 1000.0)
        y = math.floor((lat - 35.4) * 1000.0)
        s = stats.setdefault(band, [0, 0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * x
        s[4] += y * y
        s[5] += x * y

    out = load_all()["std_ellipse"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.band) == set(stats)
    for r in out.itertuples():
        n, sx, sy, sxx, syy, sxy = stats[r.band]
        cxx, cyy, cxy = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
        assert int(r.n) == n
        assert int(r.mean_dx_micro) == (1000 * sx) // n
        assert int(r.mean_dy_micro) == (1000 * sy) // n
        assert (int(r.cxx), int(r.cyy), int(r.cxy)) == (cxx, cyy, cxy)
        assert int(r.theta2_num) == 2 * cxy
        assert int(r.theta2_den) == cxx - cyy
        want = (
            "NE-SW" if cxy > 0 else "NW-SE" if cxy < 0
            else "E-W" if cxx >= cyy else "N-S"
        )
        assert r.orient == want
        # central moments are positive semidefinite
        assert cxx >= 0 and cyy >= 0 and cxy * cxy <= cxx * cyy
    # the recorded discrimination: hot band strongly NE-SW correlated,
    # cold band near-isotropic (|r| small)
    by = {r.band: r for r in out.itertuples()}
    hot, cold = by["hot"], by["cold"]
    assert hot.orient == "NE-SW"
    assert 100 * hot.cxy * hot.cxy >= 90 * hot.cxx * hot.cyy  # r^2 >= 0.9
    assert 100 * cold.cxy * cold.cxy <= 5 * cold.cxx * cold.cyy


# --------------------------------------------------------------------- R234
def test_seasonal_decomposition_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" o_orderdate) // {_DAY_US} AS day,"
        " CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)"
        " FROM orders GROUP BY 1"
    ).fetchall()
    h = {int(d): int(v) for d, v in rows}
    d0, d1 = min(h), max(h)
    v = [h.get(d, 0) for d in range(d0, d1 + 1)]
    agg: dict[int, list[int]] = {}
    for i in range(3, len(v) - 3):
        day = d0 + i
        s7 = sum(v[i - 3 : i + 4])
        a = agg.setdefault(day % 7, [0, 0, 0])
        a[0] += 1
        a[1] += v[i]
        a[2] += 7 * v[i] - s7
    tot = sum(a[1] for a in agg.values())

    out = (
        load_all()["seasonal_decomposition"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == 7
    for r in out.itertuples():
        n, rev, sd = agg[int(r.dow)]
        assert (int(r.n_days), int(r.revenue)) == (n, rev)
        assert int(r.share_milli) == (1000 * rev) // tot
        assert int(r.seas_sign) == (1 if sd >= 0 else -1)
        assert int(r.seas_abs_milli) == (1000 * abs(sd)) // (7 * n)
    # detrended means must carry both signs (a flat series would be
    # degenerate) and shares sum to ~1000
    assert {int(r.seas_sign) for r in out.itertuples()} == {1, -1}
    assert 993 <= sum(int(r.share_milli) for r in out.itertuples()) <= 1000


# --------------------------------------------------------------------- R235
def test_fd_ind_audit_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import (
        _FD_CANDS,
        _IND_CANDS,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    expect = {}
    for tbl, lhs, rhs in _FD_CANDS:
        groups: dict = {}
        for k, val in duck.sql(f"SELECT {lhs}, {rhs} FROM {tbl}").fetchall():
            groups.setdefault(k, set()).add(val)
        nv = sum(1 for s in groups.values() if len(s) > 1)
        expect[("fd", f"{tbl}.{lhs}", f"{tbl}.{rhs}")] = (
            len(groups), nv, int(nv == 0),
        )
    for ltbl, lcol, rtbl, rcol in _IND_CANDS:
        lv = {r[0] for r in duck.sql(f"SELECT DISTINCT {lcol} FROM {ltbl}").fetchall()}
        rv = {r[0] for r in duck.sql(f"SELECT DISTINCT {rcol} FROM {rtbl}").fetchall()}
        nv = len(lv - rv)
        expect[("ind", f"{ltbl}.{lcol}", f"{rtbl}.{rcol}")] = (
            len(lv), nv, int(nv == 0),
        )

    out = load_all()["fd_ind_audit"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(expect) == 8
    got = {
        (r.kind, r.lhs, r.rhs): (int(r.n_keys), int(r.n_viol), int(r.holds))
        for r in out.itertuples()
    }
    assert got == expect
    # both polarities must be present in both families (degeneracy guard)
    holds = {(k[0], v[2]) for k, v in expect.items()}
    assert {("fd", 0), ("fd", 1), ("ind", 0), ("ind", 1)} <= holds
