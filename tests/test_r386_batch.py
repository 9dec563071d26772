"""R386-R388 batch: python replays + invariants for neyman_allocation,
mean_excess_ladder, hash_collision_audit. The Neyman replay proves the
Cauchy-Schwarz variance-reduction payoff with Fractions."""

from __future__ import annotations

import math
from fractions import Fraction

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _isqrt_exact(v: int) -> int:
    s0 = math.floor(math.sqrt(float(v)))
    if (s0 + 1) * (s0 + 1) <= v:
        return s0 + 1
    if s0 * s0 > v:
        return s0 - 1
    return s0


# --------------------------------------------------------------------- R386
def test_neyman_allocation_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT p.p_brand, count(*),"
        " sum(CAST(floor(l.l_extendedprice) AS BIGINT) // 100),"
        " sum((CAST(floor(l.l_extendedprice) AS BIGINT) // 100)"
        "     * (CAST(floor(l.l_extendedprice) AS BIGINT) // 100))"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " GROUP BY 1"
    ).fetchall()
    B = 1000
    strata = {}
    for b, nh, sx, sxx in rows:
        nh, sx, sxx = int(nh), int(sx), int(sxx)
        v = (nh * sxx - sx * sx) // (nh * nh)
        strata[b] = (nh, v, _isqrt_exact(v))
    w_total = sum(nh * sd for nh, _, sd in strata.values())
    n_total = sum(nh for nh, _, _ in strata.values())
    fl = {b: (B * nh * sd) // w_total for b, (nh, _, sd) in strata.items()}
    rem = {b: (B * nh * sd) % w_total for b, (nh, _, sd) in strata.items()}
    shortfall = B - sum(fl.values())
    order = sorted(strata, key=lambda b: (-rem[b], b))
    ney = {
        b: fl[b] + (1 if i < shortfall else 0)
        for i, b in enumerate(order)
    }
    prop = {b: (B * nh) // n_total for b, (nh, _, _) in strata.items()}
    vn = sum(
        (nh * nh * v) // max(ney[b], 1)
        for b, (nh, v, _) in strata.items()
    )
    vp = sum(
        (nh * nh * v) // max(prop[b], 1)
        for b, (nh, v, _) in strata.items()
    )

    out = (
        load_all()["neyman_allocation"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == len(strata) == 25
    for row in out.itertuples():
        nh, v, sd = strata[row.brand]
        assert (int(row.nh), int(row.var_cents2), int(row.sd_cents)) \
            == (nh, v, sd)
        assert int(row.share_milli) == (1000 * nh * sd) // w_total
        assert int(row.prop_alloc) == prop[row.brand]
        assert int(row.neyman_alloc) == ney[row.brand]
        assert int(row.alloc_total) == B  # the budget is hit EXACTLY
        assert (int(row.var_prop_scaled), int(row.var_ney_scaled)) \
            == (vp, vn)
    # Cauchy-Schwarz payoff on the untruncated allocations: Neyman's
    # continuous optimum never loses to proportional
    fv = sum(
        Fraction(nh * nh * v, 1) / Fraction(B * nh * sd, w_total)
        for nh, v, sd in strata.values() if sd > 0
    )
    fp = sum(
        Fraction(nh * nh * v, 1) / Fraction(B * nh, n_total)
        for nh, v, _ in strata.values()
    )
    assert fv <= fp


# --------------------------------------------------------------------- R387
def test_mean_excess_ladder_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    daily = dict(duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) // 1000 AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall())
    y = sorted(int(daily.get(d, 0)) for d in range(1, 367))
    expect = {}
    for k in range(1, 10):
        u = y[(k * 366) // 10 - 1]
        exc = [v - u for v in y if v > u]
        n = len(exc)
        expect[k] = (u, n, _tdiv(sum(exc), max(n, 1)))
    nl = len(expect)
    su = sum(u for u, _, _ in expect.values())
    suu = sum(u * u for u, _, _ in expect.values())
    se = sum(e for _, _, e in expect.values())
    sue = sum(u * e for u, _, e in expect.values())
    den = nl * suu - su * su
    slope = _tdiv(1000 * (nl * sue - su * se), den) if den > 0 else 0

    out = (
        load_all()["mean_excess_ladder"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == 9
    for row in out.itertuples():
        u, n, e = expect[int(row.k)]
        assert (int(row.threshold), int(row.n_exceed),
                int(row.mean_excess)) == (u, n, e)
        assert int(row.me_slope_milli) == slope
        assert int(row.heavy_tail) == (1 if nl * sue - su * se > 0 else 0)
    # exceedance counts shrink as the threshold ladder climbs
    ns = [expect[k][1] for k in range(1, 10)]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


# --------------------------------------------------------------------- R388
def test_hash_collision_audit_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    keys = [int(k) for (k,) in duck.sql(
        "SELECT o_orderkey FROM orders").fetchall()]
    out = (
        load_all()["hash_collision_audit"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert sorted(out.bits.astype(int)) == [16, 24, 32]
    for row in out.itertuples():
        bits = int(row.bits)
        buckets: dict[int, int] = {}
        for k in keys:
            h = md5int_py(f"hcol_{k}") % (1 << bits)
            buckets[h] = buckets.get(h, 0) + 1
        kic = sum(c for c in buckets.values() if c > 1)
        exc = sum(c - 1 for c in buckets.values() if c > 1)
        n = len(keys)
        assert int(row.n_keys) == n
        assert int(row.keys_in_collision) == kic
        assert int(row.excess_keys) == exc
        assert int(row.expected_excess_micro) \
            == (1000000 * n * (n - 1)) // (2 * (1 << bits))
        floor_exp = n * (n - 1) // (2 * (1 << bits))
        want = 0 if floor_exp <= 0 \
            else (1000 * exc) // max(floor_exp, 1)
        assert int(row.obs_vs_expected_milli) == want
        if bits == 16:
            # the dense level is never vacuous and md5 behaves like a
            # uniform hash: observed within 3x of birthday expectation
            assert exc > 0
            assert floor_exp > 0
            assert want <= 3000
