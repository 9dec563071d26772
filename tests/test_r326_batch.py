"""R326-R328 batch: python replays + invariants for dft_weekly_power,
kcenter_seeds, rolling_median7. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views


def _daily(duck, kilod: bool = False):
    register_views(duck, SF_TINY)
    unit = " // 1000" if kilod else ""
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        f" AS BIGINT)){unit} AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall()
    return {int(d): int(v) for d, v in rows}


# --------------------------------------------------------------------- R326
def test_dft_weekly_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import (
        _DFT_COS7, _DFT_SIN7,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    v = _daily(duck)
    vmax = max(max(v.values()), 1)
    z = {d: (1000 * x) // vmax for d, x in v.items()}
    exp = {}
    for k in (1, 2, 3):
        c = sum(x * _DFT_COS7[(d * k) % 7] for d, x in z.items())
        s = sum(x * _DFT_SIN7[(d * k) % 7] for d, x in z.items())
        exp[k] = (len(z), c, s, c * c + s * s)

    out = load_all()["dft_weekly_power"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.k): (int(r.n_days), int(r.c_sum), int(r.s_sum),
                   int(r.power))
        for r in out.itertuples()
    }
    assert got == exp
    # the milli trig table is a consistent unit circle:
    # c^2 + s^2 within rounding of 10^6 for every entry
    for j in range(7):
        assert abs(_DFT_COS7[j] ** 2 + _DFT_SIN7[j] ** 2 - 1_000_000) < 1500
    # Parseval-flavored bound: no harmonic can exceed (sum|z|)^2 scaled
    cap = (1000 * sum(z.values())) ** 2
    assert all(p <= cap for _, _, _, p in exp.values())


# --------------------------------------------------------------------- R327
def test_kcenter_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.operators.zonal import KC_K, KC_RES
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', KC_RES)}, {iy_sql('lat', KC_RES)},"
        " count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    occ = {(int(x), int(y)): int(n) for x, y, n in rows}
    assert len(occ) > KC_K

    # Gonzalez traversal replay
    s1 = min(occ, key=lambda c: (-occ[c], c[0], c[1]))
    seeds = [s1]
    radii = []
    while len(seeds) < KC_K:
        def d2(c):
            return min((c[0] - sx) ** 2 + (c[1] - sy) ** 2
                       for sx, sy in seeds)
        nxt = min(occ, key=lambda c: (-d2(c), c[0], c[1]))
        radii.append(d2(nxt))
        seeds.append(nxt)
    # farthest-point insertion radii are non-increasing
    assert radii == sorted(radii, reverse=True)
    assert len(set(seeds)) == KC_K

    exp = defaultdict(lambda: [0, 0, 0])
    for c, n in occ.items():
        p = min((((c[0] - sx) ** 2 + (c[1] - sy) ** 2) * 8 + i + 1)
                for i, (sx, sy) in enumerate(seeds))
        r = p % 8
        exp[r][0] += 1
        exp[r][1] += n
        exp[r][2] = max(exp[r][2], p // 8)

    out = load_all()["kcenter_seeds"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(exp)
    for r in out.itertuples():
        i = int(r.seed_round)
        assert (int(r.sx), int(r.sy)) == seeds[i - 1]
        assert [int(r.n_cells), int(r.mass), int(r.radius2)] == exp[i]
    # every seed covers itself: its own cell is at distance 0
    assert all(exp[i + 1][0] >= 1 for i in range(KC_K))
    # coverage radius after k seeds <= the last insertion radius
    assert max(v[2] for v in exp.values()) <= radii[-1]


# --------------------------------------------------------------------- R328
def test_rolling_median7_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    v = _daily(duck, kilod=True)
    series = [v.get(d, 0) for d in range(1, 367)]
    exp = {}
    for d in range(7, 367):
        win = sorted(series[d - 7:d])
        exp[d] = (series[d - 1], win[3], abs(series[d - 1] - win[3]))

    out = load_all()["rolling_median7"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 360
    for r in out.itertuples():
        assert (int(r.v), int(r.med7), int(r.resid)) == exp[int(r.doy)]
    # the median is a selection: it equals one of the window values
    for d in range(7, 367):
        assert exp[d][1] in series[d - 7:d]
