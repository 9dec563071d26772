"""R383-R385 batch: python replays + invariants for ransac_trend,
energy_distance, slo_burn_rate."""

from __future__ import annotations

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _daily(duck, flag: str | None = None) -> list[int]:
    cond = f" AND l_returnflag = '{flag}'" if flag else ""
    d = dict(duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) // 1000 AS BIGINT)"
        f" FROM lineitem WHERE year(l_shipdate) = 1996{cond} GROUP BY 1"
    ).fetchall())
    return [int(d.get(x, 0)) for x in range(1, 367)]


# --------------------------------------------------------------------- R383
def test_ransac_trend_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    y = _daily(duck)
    thr = max(1, sum(abs(v) for v in y) // (366 * 5))
    expect = {}
    for cand in range(64):
        i = 1 + md5int_py(f"ransac_a{cand}") % 366
        j = 1 + (md5int_py(f"ransac_a{cand}") % 366
                 + 1 + md5int_py(f"ransac_b{cand}") % 365) % 366
        yi, yj = y[i - 1], y[j - 1]
        num, den = yj - yi, j - i
        inl = sum(
            1
            for d in range(1, 367)
            if abs((y[d - 1] - yi) * den - num * (d - i)) <= thr * abs(den)
        )
        if den >= 0:
            slope = _tdiv(1000 * num, den)
        else:
            slope = -_tdiv(1000 * (-num), den)
        expect[cand] = (i, j, slope, inl)
    best_n = max(v[3] for v in expect.values())
    best_cand = min(c for c, v in expect.items() if v[3] == best_n)

    out = load_all()["ransac_trend"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 64
    for row in out.itertuples():
        i, j, slope, inl = expect[int(row.cand)]
        assert (int(row.i), int(row.j)) == (i, j)
        assert i != j  # the sample is always a genuine pair
        assert int(row.slope_milli) == slope
        assert int(row.n_inliers) == inl
        assert int(row.thr) == thr
        assert int(row.is_best) == (1 if int(row.cand) == best_cand else 0)
        assert int(row.best_n) == best_n
    # consensus is informative: the winner's band captures far more
    # days than chance on this noisy daily series
    assert best_n > 366 // 10


# --------------------------------------------------------------------- R384
def test_energy_distance_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    xa = [v // 100 for v in _daily(duck, "A")]
    xr = [v // 100 for v in _daily(duck, "R")]

    def hist(vs):
        h: dict[int, int] = {}
        for v in vs:
            h[v] = h.get(v, 0) + 1
        return h

    ha, hr = hist(xa), hist(xr)

    def pair_e(h1, h2):
        s = sum(
            n * m * abs(a - b)
            for a, n in h1.items() for b, m in h2.items()
        )
        return 1000000 * s // (sum(h1.values()) * sum(h2.values()))

    exy, exx, eyy = pair_e(ha, hr), pair_e(ha, ha), pair_e(hr, hr)
    d2 = 2 * exy - exx - eyy

    out = load_all()["energy_distance"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.exy_micro), int(r.exx_micro), int(r.eyy_micro)) \
        == (exy, exx, eyy)
    assert int(r.d2_micro) == d2
    assert int(r.nonneg_ok) == 1 and d2 >= -3
    # Szekely on the untruncated rationals: strict nonnegativity
    from fractions import Fraction

    def pe(h1, h2):
        s = sum(n * m * abs(a - b)
                for a, n in h1.items() for b, m in h2.items())
        return Fraction(s, sum(h1.values()) * sum(h2.values()))

    assert 2 * pe(ha, hr) - pe(ha, ha) - pe(hr, hr) >= 0


# --------------------------------------------------------------------- R385
def test_slo_burn_rate_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        " // 3600000000 AS h, count(*),"
        " sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
        " FROM events GROUP BY 1"
    ).fetchall()
    data = {int(h): (int(n), int(e)) for h, n, e in rows}
    h0, h1 = min(data), max(data)
    hours = list(range(h0, h1 + 1))
    n = [data.get(h, (0, 0))[0] for h in hours]
    e = [data.get(h, (0, 0))[1] for h in hours]

    def burn(ei, ni):
        return 0 if ni == 0 else (1000 * ((1000 * ei) // ni)) // 250

    out = load_all()["slo_burn_rate"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(hours)
    n_fast = 0
    for row in out.itertuples():
        idx = hours.index(int(row.hour))
        b1 = burn(e[idx], n[idx])
        lo6, lo24 = max(0, idx - 5), max(0, idx - 23)
        b6 = burn(sum(e[lo6:idx + 1]), sum(n[lo6:idx + 1]))
        b24 = burn(sum(e[lo24:idx + 1]), sum(n[lo24:idx + 1]))
        assert (int(row.n_events), int(row.n_errors)) == (n[idx], e[idx])
        assert int(row.burn1_milli) == b1
        assert int(row.burn6_milli) == b6
        assert int(row.burn24_milli) == b24
        fast = 1 if b1 >= 2000 and b6 >= 2000 else 0
        slow = 1 if b6 >= 1500 and b24 >= 1000 else 0
        assert int(row.fast_burn_alert) == fast
        assert int(row.slow_burn_alert) == slow
        n_fast += fast
    # multi-window gating works and is non-vacuous: some alerts fire,
    # but far fewer than raw single-hour spikes would
    spikes = sum(1 for i in range(len(hours)) if burn(e[i], n[i]) >= 2000)
    assert 0 < n_fast <= spikes
