"""R257-R259 batch: python replays + invariants for revenue_acf,
changepoint_split, katz_centrality. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


def _daily_kd(duck):
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
    return [daily.get(t, 0) // 1000 for t in range(lo, hi + 1)], lo


# --------------------------------------------------------------------- R257
def test_revenue_acf_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    v, _ = _daily_kd(duck)
    n = len(v)
    mu = sum(v) // n
    d = [x - mu for x in v]
    c0 = sum(x * x for x in d)

    out = (
        load_all()["revenue_acf"].spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("lag")
        .reset_index(drop=True)
    )
    assert list(out.lag) == list(range(1, 8))
    for r in out.itertuples():
        k = int(r.lag)
        ck = sum(d[t] * d[t + k] for t in range(n - k))
        assert int(r.n_terms) == n - k
        assert int(r.acf_sign) == (1 if ck >= 0 else -1)
        assert int(r.acf_abs_milli) == (1000 * abs(ck)) // c0
        # |acf| <= 1 always (Cauchy-Schwarz over the shared series)
        assert int(r.acf_abs_milli) <= 1000


# --------------------------------------------------------------------- R258
def test_changepoint_split_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    v, lo = _daily_kd(duck)
    n = len(v)
    s_tot = sum(v)
    best = None
    cum = 0
    for i, x in enumerate(v):
        cum += x
        n1 = i + 1
        n2 = n - n1
        if n1 < 7 or n2 < 7:
            continue
        score = (cum * cum) // n1 + ((s_tot - cum) ** 2) // n2
        key = (-score, lo + i)
        if best is None or key < best[0]:
            best = (key, lo + i, n1, n2, cum, s_tot - cum, score)

    out = (
        load_all()["changepoint_split"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    _, day, n1, n2, s1, s2, score = best
    assert int(r.split_day) == day
    assert int(r.n_left) == n1 and int(r.n_right) == n2
    assert int(r.mean_left_milli) == (1000 * s1) // n1
    assert int(r.mean_right_milli) == (1000 * s2) // n2
    assert int(r.score) == score


# --------------------------------------------------------------------- R259
def test_katz_centrality_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.operators import graph
    from tree_sitter_analyzer_spark.registry import load_all

    edges = duck.sql(graph.edges_sql("dag")).fetchall()
    verts = sorted({s for s, _ in edges} | {d for _, d in edges})
    inn: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        inn[d].append(s)
    x = {u: 1 for u in verts}
    walks = []
    for _ in range(3):
        x = {u: sum(x[p] for p in inn.get(u, ())) for u in verts}
        walks.append(dict(x))

    out = (
        load_all()["katz_centrality"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == len(verts)
    for r in out.itertuples():
        u = int(r.v)
        w1, w2, w3 = walks[0][u], walks[1][u], walks[2][u]
        assert int(r.w1) == w1 and int(r.w2) == w2 and int(r.w3) == w3
        assert int(r.katz_q) == 16 * w1 + 4 * w2 + w3
    # w1 is the in-degree; totals must match edge/walk identities
    assert int(out.w1.sum()) == len(edges)
    # sum of w2 = number of length-2 walks = sum over edges of indeg(src)
    assert int(out.w2.sum()) == sum(len(inn.get(s, ())) for s, _ in edges)
