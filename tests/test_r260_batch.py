"""R260-R262 batch: python replays + invariants for topk_churn,
repeat_purchase_pairs, variance_ratio. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------- R260
def test_topk_churn_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" l_shipdate) // ({_DAY_US} * 7), l_partkey,"
        " CAST(floor(l_extendedprice * (1e0 - l_discount) * 100e0)"
        " AS BIGINT) FROM lineitem"
    ).fetchall()
    wk: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for w, p, c in rows:
        wk[w][p] += c
    top: dict[int, set] = {
        w: {
            p
            for p, _ in sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[
                :10
            ]
        }
        for w, d in wk.items()
    }

    out = load_all()["topk_churn"].spark_fn(spark, SF_TINY).toPandas()
    want_weeks = {w for w in top if w + 1 in top}
    assert set(int(x) for x in out.week) == want_weeks
    for r in out.itertuples():
        a, b = top[int(r.week)], top[int(r.week) + 1]
        inter = len(a & b)
        assert int(r.n_a) == len(a) and int(r.n_b) == len(b)
        assert int(r.inter) == inter
        assert int(r.jaccard_milli) == (1000 * inter) // (
            len(a) + len(b) - inter
        )
    # churn is real: top-10 sets are not identical week over week
    assert out.jaccard_milli.max() < 1000


# --------------------------------------------------------------------- R261
def test_repeat_purchase_pairs_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o.o_custkey, l.l_partkey,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', l.l_shipdate)"
        f" // {_DAY_US}, l.l_orderkey"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
    ).fetchall()
    by_cp: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for cust, part, day, ok in rows:
        by_cp[(cust, part)].append((ok, day))
    want = set()
    for (cust, part), items in by_cp.items():
        for oa, da in items:
            for ob, db in items:
                if oa < ob and abs(da - db) <= 14:
                    want.add((cust, part, oa, ob, abs(da - db)))

    out = (
        load_all()["repeat_purchase_pairs"]
        .spark_fn(spark, SF_TINY)
        .toPandas()
    )
    got = {
        (
            int(r.cust), int(r.part), int(r.ok_a), int(r.ok_b),
            int(r.day_gap),
        )
        for r in out.itertuples()
    }
    assert got == want
    assert len(out) == len(got)  # no duplicate pair rows
    assert len(want) > 0  # non-vacuous at the tiny scale by probe


# --------------------------------------------------------------------- R262
def test_variance_ratio_matches_brute_force(spark, duck):
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
    mu = sum(v) // n
    c1 = sum((x - mu) ** 2 for x in v)

    out = (
        load_all()["variance_ratio"].spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("q")
        .reset_index(drop=True)
    )
    assert list(out.q) == [2, 4, 8]
    for r in out.itertuples():
        q = int(r.q)
        m = n // q
        cq = sum(
            (sum(v[j * q : (j + 1) * q]) - q * mu) ** 2 for j in range(m)
        )
        assert int(r.n_blocks) == m
        assert int(r.vr_milli) == (1000 * ((n * cq) // (q * m))) // c1
        # a revenue series with weekly structure is not a pure random
        # walk but VR stays within an order of magnitude of 1
        assert 100 <= int(r.vr_milli) <= 10_000
