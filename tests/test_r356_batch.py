"""R356-R358 batch: python replays + invariants for johnson_schedule,
queue_depth_replay, chain_ladder. Each replay runs a DIFFERENT
algorithm than the query: direct two-machine simulation vs the
prefix+suffix makespan identity, hour-by-hour Lindley iteration vs the
closed-form window solution, and a dict-built development triangle vs
the SQL pivots."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------------------------- R356
def _simulate_flowshop(jobs: list[tuple[int, int]]) -> int:
    """Direct two-machine simulation: machine A is always busy; job j
    starts on B when both A finished it and B is free."""
    ta = tb = 0
    for a, b in jobs:
        ta += a
        tb = max(tb, ta) + b
    return tb


def test_johnson_schedule_matches_simulation(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    out = (
        load_all()["johnson_schedule"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == 25
    rows = [
        (r.brand, int(r.a_time), int(r.b_time), int(r.pos_johnson))
        for r in out.itertuples()
    ]
    # the emitted sequence really is Johnson's rule
    expect = sorted(
        rows,
        key=lambda t: (
            0 if t[1] < t[2] else 1,
            t[1] if t[1] < t[2] else -t[2],
            t[0],
        ),
    )
    assert [t[3] for t in expect] == list(range(1, 26))

    mj = _simulate_flowshop([(t[1], t[2]) for t in expect])
    fifo = sorted(rows, key=lambda t: t[0])
    mf = _simulate_flowshop([(t[1], t[2]) for t in fifo])
    lb = max(
        sum(t[1] for t in rows) + min(t[2] for t in rows),
        sum(t[2] for t in rows) + min(t[1] for t in rows),
    )
    r0 = out.iloc[0]
    assert int(r0.makespan_johnson) == mj
    assert int(r0.makespan_fifo) == mf
    assert int(r0.lower_bound) == lb
    # Johnson's theorem: optimal, and bounded below by the machine bound
    assert lb <= mj <= mf
    assert int(r0.savings_milli) == _tdiv(1000 * (mf - mj), mf)


# --------------------------------------------------------------------- R357
def test_queue_depth_replay_matches_iteration(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    arr = {
        (int(d), int(h)): int(n)
        for d, h, n in duck.sql(
            "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
            " // 86400000000,"
            " (date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
            " // 3600000000) % 24, count(*) FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    days = sorted({d for d, _ in arr})
    out = (
        load_all()["queue_depth_replay"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert sorted(out.day.astype(int)) == days
    for row in out.itertuples():
        d = int(row.day)
        n = sum(arr.get((d, h), 0) for h in range(24))
        cap = n // 24
        q = 0
        qs = []
        for h in range(24):
            q = max(0, q + arr.get((d, h), 0) - cap)
            qs.append(q)
        assert (
            int(row.n_events), int(row.cap_per_hour), int(row.max_depth),
            int(row.end_backlog), int(row.busy_hours), int(row.total_delay),
        ) == (n, cap, max(qs), qs[23], sum(1 for v in qs if v > 0), sum(qs))
        # conservation: everything not served by capacity is the backlog
        assert qs[23] >= n - 24 * cap


# --------------------------------------------------------------------- R358
def test_chain_ladder_matches_triangle_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    cells = duck.sql(
        "SELECT month(o.o_orderdate),"
        " LEAST((year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate)"
        "  - month(o.o_orderdate), 4),"
        " CAST(sum(CAST(floor(l.l_extendedprice * (1e0 - l.l_discount))"
        "  AS BIGINT)) // 1000 AS BIGINT)"
        " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " WHERE year(o.o_orderdate) = 1995 AND month(o.o_orderdate) <= 6"
        "  AND year(l.l_shipdate) = 1995 AND month(l.l_shipdate) <= 8"
        "  AND (year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate)"
        "      - month(o.o_orderdate) >= 0"
        " GROUP BY 1, 2 HAVING month(o.o_orderdate)"
        "  + LEAST((year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate)"
        "  - month(o.o_orderdate), 4) <= 8"
    ).fetchall()
    tri: dict[int, dict[int, int]] = {}
    for c, k, x in cells:
        tri.setdefault(int(c), {})[int(k)] = int(x)
    cum = {
        c: {
            k: sum(v for kk, v in ks.items() if kk <= k)
            for k in sorted(ks)
        }
        for c, ks in tri.items()
    }
    f = {}
    for k in (2, 3, 4):
        num = den = 0
        for c, ks in cum.items():
            if k in ks and (k - 1) in ks and c + k <= 8:
                num += ks[k]
                den += ks[k - 1]
        f[k] = _tdiv(1000 * num, den) if den else 1000

    out = load_all()["chain_ladder"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(cum) == 6
    for row in out.itertuples():
        ks = cum[int(row.cohort)]
        k_last = max(ks)
        cl = ks[k_last]
        ult = cl
        for k in range(k_last + 1, 5):
            ult = _tdiv(ult * f[k], 1000)
        assert (int(row.k_last), int(row.cum_last)) == (k_last, cl)
        assert (int(row.ultimate), int(row.reserve)) == (ult, ult - cl)
        assert (int(row.f2_milli), int(row.f3_milli), int(row.f4_milli)) \
            == (f[2], f[3], f[4])
        # development factors only accrete claims: reserves are never
        # negative when every factor >= 1000
        if all(v >= 1000 for v in f.values()):
            assert int(row.reserve) >= 0
