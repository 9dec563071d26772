"""R317-R319 batch: python replays + invariants for viterbi_scan,
eoq_policy, rle_profile. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R317
def test_viterbi_scan_matches_sequential_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import _VT_SWITCH
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT date_diff('day', DATE '1996-01-01', CAST(l_shipdate AS"
        " DATE)) + 1,"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996"
    ).fetchall()
    v = defaultdict(int)
    for d, dollars in rows:
        v[int(d)] += int(dollars)
    vmax = max(v.values())
    obs = {}
    for d in range(1, 367):
        z = (1000 * v.get(d, 0)) // vmax
        obs[d] = 0 if z < 250 else (1 if z < 750 else 2)

    c = [0, 0, 0]
    exp = {0: (0, 0, 0, 0, 0)}
    for d in range(1, 367):
        nc = []
        for j in range(3):
            nc.append(
                min(c[i] + (0 if i == j else _VT_SWITCH) for i in range(3))
                + 2 * abs(obs[d] - j)
            )
        c = nc
        best = min(c)
        state = c.index(best)        # ties -> smallest state, as in SQL
        exp[d] = (c[0], c[1], c[2], state, best)

    out = load_all()["viterbi_scan"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 367
    for r in out.itertuples():
        assert (int(r.c0), int(r.c1), int(r.c2), int(r.best_state),
                int(r.best_cost)) == exp[int(r.day)]
    # accumulated min-cost is monotone and bounded by the worst per-day cost
    srt = out.sort_values("day")
    bc = [int(x) for x in srt.best_cost]
    assert bc == sorted(bc)
    assert bc[-1] <= 366 * (_VT_SWITCH + 4)
    # the regime sequence is non-trivial: more than one symbol observed
    assert len(set(obs.values())) >= 2


# --------------------------------------------------------------------- R318
def test_eoq_policy_is_exact_argmin(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import _EOQ_S_CENTS
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT d.part, d.d_annual,"
        " GREATEST(CAST(floor(p_retailprice * 100e0) AS BIGINT) // 5, 1)"
        " FROM (SELECT l_partkey AS part,"
        "   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d_annual"
        "   FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1) d"
        " JOIN part p ON p.p_partkey = d.part"
    ).fetchall()
    assert rows

    def trc(dd: int, h: int, q: int) -> Fraction:
        return Fraction(dd * _EOQ_S_CENTS, q) + Fraction(q * h, 2)

    out = load_all()["eoq_policy"].spark_fn(spark, SF_TINY).toPandas()
    byp = {int(r.part): r for r in out.itertuples()}
    assert len(byp) == len(rows)
    for part, dd, h in rows:
        r = byp[int(part)]
        dd, h = int(dd), int(h)
        q = int(r.eoq_q)
        assert int(r.d_annual) == dd and int(r.h_cents) == h
        assert int(r.opt_ok) == 1
        assert int(r.orders_yr) == -(-dd // q)
        # global argmin certificate: TRC is convex in q, so beating both
        # neighbors IS global optimality — verify against a brute window
        lo, hi = max(1, q - 4), q + 4
        best = min(range(lo, hi + 1), key=lambda k: (trc(dd, h, k), k))
        assert trc(dd, h, q) <= trc(dd, h, best)


# --------------------------------------------------------------------- R319
def test_rle_profile_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import grid
    from tree_sitter_analyzer_spark.operators.zonal import RLE_THRS
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.synth import oracle_ctes

    register_views(duck, SF_TINY)
    occ = {
        (int(x), int(y)): int(n)
        for x, y, n in duck.sql(
            f"{oracle_ctes()} SELECT {grid.ix_sql('lon', 7)},"
            f" {grid.iy_sql('lat', 7)}, count(*) FROM tiles GROUP BY 1, 2"
        ).fetchall()
    }
    zmax = max(occ.values())
    exp = defaultdict(int)
    for thr in RLE_THRS:
        fg = defaultdict(list)
        for (cx, cy), n in occ.items():
            if (1000 * n) // zmax >= thr:
                fg[cy].append(cx)
        for cy, xs in fg.items():
            xs.sort()
            run = 1
            for a, b in zip(xs, xs[1:]):
                if b == a + 1:
                    run += 1
                else:
                    exp[(thr, run)] += 1
                    run = 1
            exp[(thr, run)] += 1

    out = load_all()["rle_profile"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.thr_milli), int(r.run_len)): int(r.n_runs)
        for r in out.itertuples()
    }
    assert got == dict(exp)
    # the ladder is real: the loosest cut has longer runs than the tightest
    loose = max(rl for t, rl in got if t == min(RLE_THRS))
    tight = max(rl for t, rl in got if t == max(RLE_THRS))
    assert loose > tight
    # run mass per threshold equals its foreground size (RLE is lossless)
    for thr in RLE_THRS:
        mass = sum(rl * c for (t, rl), c in got.items() if t == thr)
        nfg = sum(
            1 for n in occ.values() if (1000 * n) // zmax >= thr
        )
        assert mass == nfg
