"""R347-R349 batch: python replays + invariants for ucb_bandit,
spectral_radius, median_ci. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import math
from collections import defaultdict

from .conftest import SF_TINY, register_views


def _isqrt_newton(x: int) -> int:
    s0 = int(math.floor(math.sqrt(float(x))))
    if (s0 + 1) * (s0 + 1) <= x:
        return s0 + 1
    if s0 * s0 > x:
        return s0 - 1
    return s0


# --------------------------------------------------------------------- R347
def test_ucb_bandit_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.queries_relational import (
        _UCB_BATCH, _UCB_LNT_MICRO, _UCB_ROUNDS, _UCB_WARM,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT CASE substr(o_orderpriority, 1, 1) WHEN '1' THEN 0"
        " WHEN '2' THEN 1 WHEN '3' THEN 2 WHEN '4' THEN 3 ELSE 4 END,"
        " CAST((1000 * sum(CASE WHEN o_totalprice > 150000e0 THEN 1"
        " ELSE 0 END)) // count(*) AS BIGINT)"
        " FROM orders GROUP BY 1"
    ).fetchall()
    bias = {int(a): int(b) for a, b in rows}
    assert set(bias) == set(range(5))

    def coin(arm: int, rnd: int, i: int) -> bool:
        return md5int_py(f"ucb:{arm}:{rnd}:{i}") % 1000 < bias[arm]

    pulls = {a: _UCB_WARM for a in range(5)}
    wins = {
        a: sum(coin(a, 0, i) for i in range(1, _UCB_WARM + 1))
        for a in range(5)
    }
    exp = []
    for r in range(1, _UCB_ROUNDS + 1):
        ucb = {
            a: (1000 * wins[a]) // pulls[a]
            + _isqrt_newton((2 * _UCB_LNT_MICRO[r]) // pulls[a])
            for a in range(5)
        }
        chosen = min(range(5), key=lambda a: (-ucb[a], a))
        for a in range(5):
            exp.append((r, a, pulls[a], wins[a], ucb[a],
                        1 if a == chosen else 0))
        wins[chosen] += sum(
            coin(chosen, r, i) for i in range(1, _UCB_BATCH + 1)
        )
        pulls[chosen] += _UCB_BATCH

    out = load_all()["ucb_bandit"].spark_fn(spark, SF_TINY).toPandas()
    got = sorted(
        (int(r.round), int(r.arm), int(r.pulls), int(r.wins),
         int(r.ucb_milli), int(r.chosen))
        for r in out.itertuples()
    )
    assert got == sorted(exp)
    # exactly one arm chosen per round
    per_round = defaultdict(int)
    for r, a, p, w, u, c in exp:
        per_round[r] += c
    assert all(v == 1 for v in per_round.values())
    # total pulls are conserved
    assert sum(pulls.values()) == 5 * _UCB_WARM + _UCB_ROUNDS * _UCB_BATCH


# --------------------------------------------------------------------- R348
def test_spectral_radius_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import edges_sql
    from tree_sitter_analyzer_spark.registry import load_all

    sym = set()
    for u, v, *_ in duck.sql(edges_sql("bfs")).fetchall():
        sym.add((int(u), int(v)))
        sym.add((int(v), int(u)))
    adj = defaultdict(list)
    for u, v in sym:
        adj[u].append(v)
    verts = sorted(adj)
    val = {n: 1000 for n in verts}
    for _ in range(3):
        w = {n: sum(val[m] for m in adj[n]) for n in verts}
        wmax = max(max(w.values()), 1)
        val = {n: (1000 * w[n]) // wmax for n in verts}
    av = {n: sum(val[m] for m in adj[n]) for n in verts}
    vav = sum(val[n] * av[n] for n in verts)
    vv = sum(val[n] ** 2 for n in verts)
    ratios = [(1000 * av[n]) // val[n] for n in verts if val[n] > 0]
    lam = (1000 * vav) // max(vv, 1)

    out = load_all()["spectral_radius"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.n_vertices) == len(verts)
    assert int(r.n_dir_edges) == len(sym)
    assert int(r.lam_milli) == lam
    assert int(r.cw_min_milli) == min(ratios)
    assert int(r.cw_max_milli) == max(ratios)
    assert int(r.bound_ok) == 1
    # Rayleigh lies within the Collatz-Wielandt bracket (allowing the
    # +1 flooring slack the query grants the upper bound)
    assert min(ratios) <= lam <= max(ratios) + 1
    # lambda_max of a connected graph exceeds the average degree
    avg_deg_milli = (1000 * len(sym)) // len(verts)
    assert lam >= avg_deg_milli // 2


# --------------------------------------------------------------------- R349
def test_median_ci_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) // 1000 AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall()
    v = {int(d): int(x) for d, x in rows}
    series = sorted((v.get(d, 0), d) for d in range(1, 367))
    vals = [x for x, _ in series]
    n = 366
    zs = _isqrt_newton(38416 * n)
    l_rank = (100 * n - zs) // 200
    u_rank = (100 * n + zs) // 200 + 1

    out = load_all()["median_ci"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n), int(r.l_rank), int(r.u_rank)) == (n, l_rank,
                                                        u_rank)
    assert int(r.median_lo) == vals[(n + 1) // 2 - 1]
    assert int(r.ci_lo) == vals[l_rank - 1]
    assert int(r.ci_hi) == vals[u_rank - 1]
    assert int(r.ci_width) == vals[u_rank - 1] - vals[l_rank - 1]
    assert int(r.n_below) == l_rank - 1
    assert int(r.n_above) == n - u_rank
    # the interval brackets the median and is ~36 ranks wide at n=366
    assert l_rank < (n + 1) // 2 < u_rank
    assert int(r.ci_lo) <= int(r.median_lo) <= int(r.ci_hi)
