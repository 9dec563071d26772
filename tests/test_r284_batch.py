"""R284-R286 batch: python replays + invariants for ols_trend,
gwr_local, logrank_test. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86400000000
_HOUR_US = 3600000000


# --------------------------------------------------------------------- R284
def test_ols_trend_matches_exact_python_ols(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"SELECT l_returnflag,"
        f" date_diff('microsecond', TIMESTAMP '1970-01-01', l_shipdate)"
        f" // {_DAY_US},"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    daily: dict[tuple, int] = defaultdict(int)
    for flag, day, d in rows:
        daily[(flag, day)] += d
    flags = {f for f, _ in daily}
    d0 = min(d for _, d in daily)
    d1 = max(d for _, d in daily)

    out = load_all()["ols_trend"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.flag) == flags
    for r in out.itertuples():
        xs = list(range(d0, d1 + 1))
        ys = [daily.get((r.flag, x), 0) // 1000 for x in xs]
        n = len(xs)
        assert int(r.n_days) == n
        mx, my = sum(xs) // n, sum(ys) // n
        dx = [x - mx for x in xs]
        dy = [y - my for y in ys]
        sdxdy = sum(a * b for a, b in zip(dx, dy))
        sdx2 = sum(a * a for a in dx)
        sdy2 = sum(b * b for b in dy)
        rx, ry = sum(dx), sum(dy)
        num = n * sdxdy - rx * ry
        sg = 1 if num >= 0 else -1
        sxy_abs = abs(num) // n
        sxx = (n * sdx2 - rx * rx) // n
        syy = max((n * sdy2 - ry * ry) // n, 1)
        assert int(r.slope_sign) == sg
        assert int(r.slope_abs_milli) == (1000 * sxy_abs) // sxx
        assert int(r.r2_milli) == (((1000 * sxy_abs) // sxx) * sxy_abs) // syy
        # the remainder-corrected Sxy/Sxx IS the true OLS slope: compare
        # against the float OLS within floor slack
        fmx = sum(xs) / n
        fmy = sum(ys) / n
        fsxy = sum((x - fmx) * (y - fmy) for x, y in zip(xs, ys))
        fsxx = sum((x - fmx) ** 2 for x in xs)
        true_milli = 1000 * abs(fsxy) / fsxx
        assert abs(int(r.slope_abs_milli) - true_milli) <= 2
        assert 0 <= int(r.r2_milli) <= 1001


# --------------------------------------------------------------------- R285
def test_gwr_local_matches_brute_force_and_sees_hotspot_decay(spark, duck):
    from tree_sitter_analyzer_spark.operators import pointpattern as pp
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.synth import tiles_sql

    register_views(duck, SF_TINY)
    res, h = pp.GWR_RES, pp.GWR_H
    cells = duck.sql(
        f"WITH tiles AS ({tiles_sql()}) "
        f"SELECT CAST(floor((lon + 180.0) * {1 << res}) AS BIGINT),"
        f" CAST(floor((lat + 90.0) * {1 << res}) AS BIGINT), count(*)"
        " FROM tiles GROUP BY 1, 2"
    ).fetchall()
    vmax = max(c for _, _, c in cells)
    hs = pp._gwr_hotspot_cells(res)

    def xval(cx, cy):
        return min((cx - a) ** 2 + (cy - b) ** 2 for a, b in hs)

    pts = [(cx, cy, xval(cx, cy), (1000 * c) // vmax) for cx, cy, c in cells]
    expect = {}
    for fcx, fcy, _, _ in pts:
        nb = [
            p for p in pts
            if abs(p[0] - fcx) <= h and abs(p[1] - fcy) <= h
        ]
        if len(nb) < pp.GWR_MIN_N:
            continue
        sw = swx = swy = swxy = swxx = 0
        for cx, cy, x, y in nb:
            w = (h + 1 - max(abs(cx - fcx), abs(cy - fcy))) ** 2
            sw += w
            swx += w * x
            swy += w * y
            swxy += w * x * y
            swxx += w * x * x
        num = sw * swxy - swx * swy
        den = max(sw * swxx - swx * swx, 1)
        expect[(fcx, fcy)] = (
            len(nb), sw, 1 if num >= 0 else -1, (1000 * abs(num)) // den
        )

    out = load_all()["gwr_local"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.cx), int(r.cy)): (
            int(r.n_local), int(r.sw), int(r.slope_sign),
            int(r.slope_abs_milli),
        )
        for r in out.itertuples()
    }
    assert got == expect

    # spatial signal: focal cells NEAR a hotspot (cheb <= 2) must be
    # majority negative-slope (density decays with hotspot distance
    # there), strictly more negative than the global share.
    near = [
        v for (cx, cy), v in got.items()
        if any(max(abs(cx - a), abs(cy - b)) <= 2 for a, b in hs)
    ]
    assert len(near) >= 10
    neg_near = sum(1 for v in near if v[2] < 0 and v[3] > 0)
    neg_all = sum(1 for v in got.values() if v[2] < 0 and v[3] > 0)
    assert neg_near * len(got) > neg_all * len(near)
    assert 2 * neg_near > len(near)


# --------------------------------------------------------------------- R286
def test_logrank_matches_python_replay_and_km_totals(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    fv = dict(
        duck.sql(
            "SELECT user_id, min(ts) FROM events"
            " WHERE event_type = 'view' GROUP BY 1"
        ).fetchall()
    )
    tend = duck.sql("SELECT max(ts) FROM events").fetchone()[0]
    fp = dict(
        duck.sql(
            "SELECT e.user_id, min(e.ts) FROM events e"
            " JOIN (SELECT user_id, min(ts) AS fv FROM events"
            "       WHERE event_type = 'view' GROUP BY 1) v"
            " ON v.user_id = e.user_id AND e.ts > v.fv"
            " WHERE e.event_type = 'purchase' GROUP BY 1"
        ).fetchall()
    )
    us = 10**6
    obs = []
    for u, v in fv.items():
        g = int(u) % 2
        span = int((tend - v).total_seconds() * us) // _HOUR_US
        raw = (
            int((fp[u] - v).total_seconds() * us) // _HOUR_US
            if u in fp else None
        )
        if raw is not None and raw <= 120 and raw <= span:
            obs.append((g, raw, 1))
        else:
            obs.append((g, min(120, span), 0))
    # per-hour table
    hours = sorted({t for _, t, _ in obs})
    n1 = sum(1 for g, _, _ in obs if g == 0)
    n2 = len(obs) - n1
    o1 = o2 = e1 = v_micro = 0
    c1 = c2 = 0  # removed so far
    for t in hours:
        at1, at2 = n1 - c1, n2 - c2
        d1 = sum(1 for g, tt, ev in obs if g == 0 and tt == t and ev)
        d2 = sum(1 for g, tt, ev in obs if g == 1 and tt == t and ev)
        a1 = sum(1 for g, tt, _ in obs if g == 0 and tt == t)
        a2 = sum(1 for g, tt, _ in obs if g == 1 and tt == t)
        nt, dt = at1 + at2, d1 + d2
        if nt > 0:
            p1m, p2m = (1000 * at1) // nt, (1000 * at2) // nt
            o1 += d1
            o2 += d2
            e1 += dt * p1m
            v_micro += p1m * p2m * (dt * (nt - dt) // max(nt - 1, 1))
        c1 += a1
        c2 += a2

    out = load_all()["logrank_test"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.n1_users) == n1 and int(r.n2_users) == n2
    assert int(r.o1) == o1 and int(r.o2) == o2
    assert int(r.e1_milli) == e1
    assert int(r.v_micro) == v_micro
    diff = 1000 * o1 - e1
    assert int(r.diff_sign) == (1 if diff >= 0 else -1)
    assert int(r.chi2_milli) == (1000 * diff * diff) // max(v_micro, 1)

    # cross-check against kaplan_meier's event totals (same censoring)
    km = load_all()["kaplan_meier"].spark_fn(spark, SF_TINY).toPandas()
    assert int(km.d_events.sum()) == o1 + o2
