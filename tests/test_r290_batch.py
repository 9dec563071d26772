"""R290-R292 batch: python replays + invariants for dp_release,
yannakakis_chain, drawdown_stats. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86400000000


# --------------------------------------------------------------------- R290
def test_dp_release_matches_geometric_mechanism_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type,"
        f" (date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        f" // {_DAY_US}) // 7 AS wk, count(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()

    def tz_rho(h):
        # rho = 1 + trailing zeros of the 32-bit hash, clamped to 32
        for k in range(1, 32):
            if (h >> (k - 1)) & 1:
                return k
        return 32

    out = load_all()["dp_release"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(rows)
    true = {(t, int(w)): int(n) for t, w, n in rows}
    for r in out.itertuples():
        key = (r.event_type, int(r.wk))
        n = true[key]
        h1 = md5int_py(f"{r.event_type}#{int(r.wk)}#a")
        h2 = md5int_py(f"{r.event_type}#{int(r.wk)}#b")
        noise = tz_rho(h1) - tz_rho(h2)
        assert int(r.true_n) == n
        assert int(r.noise) == noise
        assert int(r.released) == max(n + noise, 0)
        assert int(r.err) == max(n + noise, 0) - n
    # utility: mean |noise| of the ratio-1/2 geometric difference ~ 1.5
    assert out.noise.abs().mean() < 4


# --------------------------------------------------------------------- R291
def test_yannakakis_reductions_match_naive_join(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    full = duck.sql(
        "SELECT n.n_nationkey, c.c_custkey, o.o_orderkey,"
        " CAST(floor(l.l_extendedprice * (1e0 - l.l_discount) * 100e0)"
        "  AS BIGINT) AS cents"
        " FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey"
        " JOIN customer c ON c.c_nationkey = n.n_nationkey"
        " JOIN orders o ON o.o_custkey = c.c_custkey"
        " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " WHERE r.r_name = 'ASIA'"
        " AND o.o_orderdate >= TIMESTAMP '1995-01-01'"
        " AND o.o_orderdate < TIMESTAMP '1995-07-01'"
        " AND l.l_quantity < 10e0"
    ).fetchall()
    out = load_all()["yannakakis_chain"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    # the Yannakakis guarantee: reduced relation = distinct participants
    assert int(r.join_rows) == len(full)
    assert int(r.n_lineitem_red) == len(full)
    assert int(r.n_orders_red) == len({x[2] for x in full})
    assert int(r.n_cust_red) == len({x[1] for x in full})
    assert int(r.n_nation_red) == len({x[0] for x in full})
    assert int(r.rev_cents) == sum(x[3] for x in full)


def test_yannakakis_plan_uses_semi_joins_and_broadcasts(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    df = load_all()["yannakakis_chain"].spark_fn(spark, SF_TINY)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("LeftSemi") >= 7  # 4 bottom-up + 3 top-down
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------- R292
def test_drawdown_stats_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" o_orderdate) // {_DAY_US},"
        " CAST(floor(o_totalprice) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    daily: dict[int, int] = defaultdict(int)
    for d, v in rows:
        daily[int(d)] += v
    d0, d1 = min(daily), max(daily)
    vs = [daily.get(d, 0) // 1000 for d in range(d0, d1 + 1)]
    mu = sum(vs) // len(vs)
    cum, runmax = 0, None
    best = None  # (dd, day, peak_cum)
    series = []
    for i, v in enumerate(vs):
        cum += v - mu
        runmax = cum if runmax is None else max(runmax, cum)
        series.append((d0 + i, cum, runmax))
        dd = runmax - cum
        if best is None or dd > best[0]:
            best = (dd, d0 + i, runmax)
    max_dd, trough_day, peak_cum = best
    peak_day = min(
        d for d, c, _ in series if c == peak_cum and d <= trough_day
    )
    rec = [d for d, c, _ in series if d > trough_day and c >= peak_cum]
    recovery = min(rec) if rec else -1

    out = load_all()["drawdown_stats"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.trough_day) == trough_day
    assert int(r.max_dd_kd) == max_dd
    assert int(r.peak_cum_kd) == peak_cum
    assert int(r.peak_day) == peak_day
    assert int(r.recovery_day) == recovery
    assert int(r.dd_days) == trough_day - peak_day
    assert max_dd > 0  # detrended curve: drawdown is non-degenerate
