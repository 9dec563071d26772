"""R278-R280 batch: python replays + invariants for cochran_q,
page_trend, xmr_chart. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------- R278
def test_cochran_q_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql("SELECT text, n_chars FROM documents").fetchall()
    ca = cb = cc = s = sr2 = 0
    for text, n_chars in rows:
        a = 1 if " dup " in f" {text} " else 0
        b = 1 if n_chars >= 300 else 0
        c = 1 if text.count(" ") + 1 >= 50 else 0
        ca += a
        cb += b
        cc += c
        s += a + b + c
        sr2 += (a + b + c) ** 2
    n = len(rows)
    q = (1000 * (6 * (ca * ca + cb * cb + cc * cc) - 2 * s * s)) // (
        3 * s - sr2
    )

    out = load_all()["cochran_q"].spark_fn(spark, SF_TINY).toPandas()
    got = {r.det: int(r.hits) for r in out.itertuples()}
    assert got == {"marker": ca, "len300": cb, "tok50": cc}
    for r in out.itertuples():
        assert int(r.n_docs) == n
        assert int(r.rate_milli) == (1000 * got[r.det]) // n
        assert int(r.q_milli) == q
    # the three screens fire at genuinely different rates (Q is huge)
    assert q > 10_000
    rates = sorted(got.values())
    assert rates[0] < rates[-1]


# --------------------------------------------------------------------- R279
def test_page_trend_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o_custkey, o_orderpriority,"
        " CAST(floor(o_totalprice * 100e0) AS BIGINT) FROM orders"
    ).fetchall()
    cp: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for cust, prio, cents in rows:
        cp[cust][prio] += cents
    blocks = {c: d for c, d in cp.items() if len(d) == 5}
    r_j: dict[str, int] = defaultdict(int)
    for _, d in blocks.items():
        ranked = sorted(d.items(), key=lambda kv: (kv[1], kv[0]))
        for rk, (prio, _) in enumerate(ranked, start=1):
            r_j[prio] += rk
    n = len(blocks)
    l_stat = sum(int(p[0]) * v for p, v in r_j.items())
    z2 = (1000 * (l_stat - 45 * n) ** 2) // (25 * n)

    out = load_all()["page_trend"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.n_blocks) == n
    assert int(r.l_stat) == l_stat
    assert int(r.e_l) == 45 * n
    assert int(r.trend_sign) == (1 if l_stat >= 45 * n else -1)
    assert int(r.z2_milli) == z2
    # priorities are exchangeable by construction: no strong trend
    # (|z| < 5 → z2 < 25000 milli), but the statistic is well-defined
    assert z2 < 25_000


# --------------------------------------------------------------------- R280
def test_xmr_chart_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" o_orderdate) // {_DAY_US},"
        " CAST(floor(o_totalprice) AS BIGINT) FROM orders"
    ).fetchall()
    daily: dict[int, int] = defaultdict(int)
    for day, d in rows:
        daily[day] += d
    lo, hi = min(daily), max(daily)
    v = [daily.get(t, 0) // 1000 for t in range(lo, hi + 1)]
    n = len(v)
    xbar = sum(v) // n
    mrs = [abs(a - b) for a, b in zip(v[1:], v)]
    mrbar = sum(mrs) // (n - 1)
    ucl = xbar + (2660 * mrbar) // 1000
    lcl = xbar - (2660 * mrbar) // 1000

    out = load_all()["xmr_chart"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.n_days) == n
    assert int(r.xbar) == xbar and int(r.mrbar) == mrbar
    assert int(r.ucl) == ucl and int(r.lcl) == lcl
    assert int(r.n_above) == sum(1 for x in v if x > ucl)
    assert int(r.n_below) == sum(1 for x in v if x < lcl)
    assert int(r.n_mr_above) == sum(
        1 for m in mrs if m > (3267 * mrbar) // 1000
    )
    # a noisy revenue series: limits are meaningful (non-degenerate MR)
    assert mrbar > 0
    # Shewhart limits contain the bulk of days
    inside = n - int(r.n_above) - int(r.n_below)
    assert inside > n * 9 // 10
