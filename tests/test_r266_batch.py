"""R266-R268 batch: python replays + invariants for bradley_terry,
robust_shape, spatial_markov. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R266
def test_bradley_terry_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o_custkey, o_orderpriority,"
        " CAST(floor(o_totalprice * 100e0) AS BIGINT) FROM orders"
    ).fetchall()
    cp: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for cust, prio, cents in rows:
        cp[cust][prio] += cents
    n_ij: Counter = Counter()
    w_i: Counter = Counter()
    for _, spends in cp.items():
        for a, xa in spends.items():
            for b, xb in spends.items():
                if a != b:
                    n_ij[(a, b)] += 1
                    if xa > xb or (xa == xb and a < b):
                        w_i[(a, b)] += 1
    prios = sorted({p for p, _ in n_ij})
    n_i = {p: sum(n_ij[(p, q)] for q in prios if q != p) for p in prios}
    wins = {p: sum(w_i[(p, q)] for q in prios if q != p) for p in prios}
    s1 = {p: (2000 * wins[p]) // n_i[p] for p in prios}
    s2 = {}
    for p in prios:
        d = sum(
            (1_000_000 * n_ij[(p, q)]) // (s1[p] + s1[q])
            for q in prios
            if q != p
        )
        s2[p] = (1_000_000 * wins[p]) // d

    out = load_all()["bradley_terry"].spark_fn(spark, SF_TINY).toPandas()
    assert sorted(out.prio) == prios
    for r in out.itertuples():
        assert int(r.matches) == n_i[r.prio]
        assert int(r.wins) == wins[r.prio]
        assert int(r.s1_milli) == s1[r.prio]
        assert int(r.s2_milli) == s2[r.prio]
    ranked = out.sort_values("rnk")
    assert list(ranked.s2_milli) == sorted(out.s2_milli, reverse=True)
    # priorities are symmetric by construction → strengths are near
    # uniform, but matches must be plentiful and wins < matches
    assert (out.wins < out.matches).all()


# --------------------------------------------------------------------- R267
def test_robust_shape_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag,"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    vals: dict[str, list[int]] = defaultdict(list)
    for flag, d in rows:
        vals[flag].append(d)

    def octile(sorted_v, k):
        n = len(sorted_v)
        # least value whose cumulative count crosses k/8
        import bisect

        target = -(-k * n // 8)  # ceil(k*n/8)
        return sorted_v[target - 1]

    out = load_all()["robust_shape"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.flag) == set(vals)
    for r in out.itertuples():
        v = sorted(vals[r.flag])
        e = {k: octile(v, k) for k in range(1, 8)}
        q1, q2, q3 = e[2], e[4], e[6]
        assert int(r.n) == len(v)
        assert (int(r.q1), int(r.q2), int(r.q3)) == (q1, q2, q3)
        assert int(r.bowley_sign) == (1 if q3 + q1 >= 2 * q2 else -1)
        assert int(r.bowley_abs_milli) == (
            1000 * abs(q3 + q1 - 2 * q2)
        ) // (q3 - q1)
        assert int(r.moors_milli) == (
            1000 * ((e[7] - e[5]) + (e[3] - e[1]))
        ) // (q3 - q1)
        # Bowley is bounded in [-1, 1] by construction
        assert int(r.bowley_abs_milli) <= 1000
        # Moors is positive and ~1.23 for a normal; any unimodal
        # positive-support distribution stays within a sane band
        assert 500 <= int(r.moors_milli) <= 3000


# --------------------------------------------------------------------- R268
def test_spatial_markov_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.operators.trajectory import (
        pings_oracle_cte,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "WITH " + pings_oracle_cte()
        + " SELECT ix // 8, iy // 8, day FROM pings"
    ).fetchall()
    days = [d for _, _, d in rows]
    mid = (min(days) + max(days) + 1) // 2
    cnt: Counter = Counter()
    for cx, cy, day in rows:
        cnt[(cx, cy, 1 if day < mid else 2)] += 1

    def cls(n):
        return 1 if n <= 2 else (2 if n <= 5 else 3)

    e1 = {
        (cx, cy): cls(n) for (cx, cy, ep), n in cnt.items() if ep == 1
    }
    e2 = {
        (cx, cy): cls(n) for (cx, cy, ep), n in cnt.items() if ep == 2
    }
    want: Counter = Counter()
    for (cx, cy), c1 in e1.items():
        nbr = max(
            (
                e1.get((cx + dx, cy + dy), 0)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
            ),
        )
        want[(nbr, c1, e2.get((cx, cy), 0))] += 1

    out = load_all()["spatial_markov"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.nbr_cls), int(r.c1), int(r.c2)): int(r.n_cells)
        for r in out.itertuples()
    }
    assert got == dict(want)
    # spatial conditioning is non-degenerate: more than one neighbor
    # class appears, and some cells empty out between epochs
    assert len({k[0] for k in got}) > 1
    assert any(k[2] == 0 for k in got)
