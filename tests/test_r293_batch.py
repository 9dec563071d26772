"""R293-R295 batch: python replays + invariants for msd_ladder,
runs_test, turning_points. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86400000000


def _daily_series(duck):
    """Zero-densified daily kilodollar revenue, the shared series."""
    rows = duck.sql(
        "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" o_orderdate) // {_DAY_US} AS day,"
        " CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000 AS BIGINT)"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = {int(d): int(v) for d, v in rows}
    lo, hi = min(days), max(days)
    return [days.get(d, 0) for d in range(lo, hi + 1)]


# --------------------------------------------------------------------- R293
def test_msd_ladder_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.trajectory import (
        MSD_LAGS,
        pings_oracle_cte,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pings = duck.sql(
        f"WITH {pings_oracle_cte()} "
        "SELECT user_id, seq, ix, iy FROM pings ORDER BY user_id, seq"
    ).fetchall()
    traj = defaultdict(list)
    for u, _s, x, y in pings:
        traj[u].append((int(x), int(y)))
    want = {}
    for t in MSD_LAGS:
        n, s = 0, 0
        for pts in traj.values():
            for i in range(len(pts) - t):
                dx = pts[i + t][0] - pts[i][0]
                dy = pts[i + t][1] - pts[i][1]
                s += dx * dx + dy * dy
                n += 1
        want[t] = (n, 1000 * (s // n) + (1000 * (s % n)) // n)
    out = load_all()["msd_ladder"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(MSD_LAGS)
    got = {int(r.lag): r for r in out.itertuples()}
    for t in MSD_LAGS:
        assert int(got[t].n_pairs) == want[t][0]
        assert int(got[t].msd_milli) == want[t][1]
        if t == 1:
            assert int(got[t].ratio_milli) == -1
        else:
            exp = (1000 * want[t][1]) // want[t // 2][1]
            assert int(got[t].ratio_milli) == exp


def test_msd_is_near_linear_diffusion(spark):
    # iid +-20 steps with 40% dwells => MSD(2t)/MSD(t) ~ 2; per-user
    # series truncation keeps it in a band rather than exactly 2000.
    from tree_sitter_analyzer_spark.registry import load_all

    out = load_all()["msd_ladder"].spark_fn(spark, SF_TINY).toPandas()
    ratios = out[out.lag > 1].ratio_milli
    assert ((ratios > 1600) & (ratios < 2200)).all()
    # displacement grows with lag: msd strictly increasing in lag
    srt = out.sort_values("lag").msd_milli.tolist()
    assert srt == sorted(srt) and srt[0] > 0


# --------------------------------------------------------------------- R294
def test_runs_test_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    v = _daily_series(duck)
    n = len(v)
    med = sorted(range(n), key=lambda i: (v[i], i))[(n + 1) // 2 - 1]
    med = v[med]
    a = [1 if x > med else 0 for x in v]
    runs = 1 + sum(1 for i in range(1, n) if a[i] != a[i - 1])
    n1 = sum(a)
    n2 = n - n1
    num = (runs - 1) * n - 2 * n1 * n2
    z_sign = 1 if num > 0 else (-1 if num < 0 else 0)
    z2 = ((1000 * num * num) // (2 * n1 * n2)) * (n - 1) // (
        2 * n1 * n2 - n
    )
    out = load_all()["runs_test"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.runs), int(r.n1), int(r.n2), int(r.n)) == (
        runs, n1, n2, n,
    )
    assert int(r.z_sign) == z_sign
    assert int(r.z2_milli) == z2


# --------------------------------------------------------------------- R295
def test_turning_points_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    v = _daily_series(duck)
    n = len(v)
    t = sum(
        1
        for i in range(1, n - 1)
        if (v[i] > v[i - 1] and v[i] > v[i + 1])
        or (v[i] < v[i - 1] and v[i] < v[i + 1])
    )
    d = 3 * t - 2 * (n - 2)
    out = load_all()["turning_points"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.n_days) == n
    assert int(r.t_points) == t
    assert int(r.e_tp_milli) == (2000 * (n - 2)) // 3
    assert int(r.tp_sign) == (1 if d > 0 else (-1 if d < 0 else 0))
    assert int(r.z2_milli) == (10000 * d * d) // (16 * n - 29)
    # zero-inflated tiny-SF series: long zero runs suppress strict
    # extrema => the test HONESTLY flags non-randomness (sign -1, big z)
    assert int(r.tp_sign) == -1
    assert int(r.z2_milli) > 100000
