"""R275-R277 batch: python replays + invariants for newsvendor,
price_index, friedman_test. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import math
from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


def _isqrt_exact(v: int) -> int:
    s0 = math.floor(math.sqrt(float(v)))
    if (s0 + 1) * (s0 + 1) <= v:
        return s0 + 1
    if s0 * s0 > v:
        return s0 - 1
    return s0


# --------------------------------------------------------------------- R275
def test_newsvendor_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', l_shipdate)"
        f" // {_DAY_US},"
        " CAST(floor(l_quantity + 0.5e0) AS BIGINT) FROM lineitem"
    ).fetchall()
    daily: dict[tuple, int] = defaultdict(int)
    days = [d for _, d, _ in rows]
    lo, hi = min(days), max(days)
    flags = {f for f, _, _ in rows}
    for f, d, q in rows:
        daily[(f, d)] += q

    out = load_all()["newsvendor"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.flag) == flags
    for r in out.itertuples():
        demand = sorted(
            daily.get((r.flag, t), 0) for t in range(lo, hi + 1)
        )
        n = len(demand)
        # least q with 3*cum >= 2*n == the ceil(2n/3)-th order statistic
        # (histogram cum at a value == count of elements <= it)
        q_star = demand[-(-2 * n // 3) - 1]
        emin = sum(min(d, q_star) for d in demand)
        profit = 3 * emin - q_star * n
        assert int(r.n_days) == n
        assert int(r.q_star) == q_star
        assert int(r.emin_n) == emin
        assert int(r.profit_sign) == (1 if profit >= 0 else -1)
        assert int(r.profit_abs_milli) == (1000 * abs(profit)) // n
        # stocking at the fractile is profitable on this demand
        assert profit > 0
        # q* sits between median and max demand
        assert demand[n // 2] <= q_star <= demand[-1]


# --------------------------------------------------------------------- R276
def test_price_index_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_partkey,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', l_shipdate)"
        f" // {_DAY_US},"
        " CAST(floor(l_extendedprice * (1e0 - l_discount) * 100e0)"
        " AS BIGINT),"
        " CAST(floor(l_quantity + 0.5e0) AS BIGINT) FROM lineitem"
    ).fetchall()
    days = [d for _, d, _, _ in rows]
    mid = (min(days) + max(days) + 1) // 2
    pe: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for part, d, c, q in rows:
        ep = 0 if d < mid else 1
        pe[(part, ep)][0] += c
        pe[(part, ep)][1] += q
    unit = {
        k: ((1000 * c) // q, q) for k, (c, q) in pe.items() if q > 0
    }
    l_num = l_den = p_num = p_den = n_parts = 0
    for (part, ep), (p0, q0) in unit.items():
        if ep == 0 and (part, 1) in unit:
            p1, q1 = unit[(part, 1)]
            n_parts += 1
            l_num += p1 * q0
            l_den += p0 * q0
            p_num += p1 * q1
            p_den += p0 * q1
    lasp = (1000 * l_num) // l_den
    paas = (1000 * p_num) // p_den

    out = load_all()["price_index"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.n_parts) == n_parts
    assert int(r.laspeyres_milli) == lasp
    assert int(r.paasche_milli) == paas
    assert int(r.fisher_milli) == _isqrt_exact(lasp * paas)
    # Fisher lies between Laspeyres and Paasche (up to the floors)
    assert (
        min(lasp, paas) - 1
        <= int(r.fisher_milli)
        <= max(lasp, paas) + 1
    )
    # synthetic prices are stationary → indices near 1000 milli
    assert 800 <= lasp <= 1250 and 800 <= paas <= 1250


# --------------------------------------------------------------------- R277
def test_friedman_test_matches_brute_force(spark, duck):
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
    sr2 = sum(v * v for v in r_j.values())
    chi2 = (12000 * sr2) // (n * 5 * 6) - 3000 * n * 6

    out = load_all()["friedman_test"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 5
    for r in out.itertuples():
        assert int(r.r_j) == r_j[r.prio]
        assert int(r.mean_rank_milli) == (1000 * r_j[r.prio]) // n
        assert int(r.n_blocks) == n
        assert int(r.chi2_milli) == chi2
    # ranks are a partition: sum of R_j = n * k(k+1)/2
    assert sum(r_j.values()) == n * 15
    # priorities are exchangeable by construction → chi2 small but
    # non-negative by the rank identity is NOT guaranteed (floors);
    # pin a loose magnitude band instead
    assert abs(chi2) < 50_000
    assert n > 10  # complete blocks actually exist at this scale
