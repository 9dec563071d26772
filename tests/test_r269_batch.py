"""R269-R271 batch: python replays + invariants for huber_location,
revenue_streaks, abc_classification. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------- R269
def test_huber_location_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, CAST(floor(value * 100e0) AS BIGINT)"
        " FROM events"
    ).fetchall()
    vals: dict[str, list[int]] = defaultdict(list)
    for et, c in rows:
        vals[et].append(c)

    def crossing_median(v):
        sv = sorted(v)
        n = len(sv)
        return sv[-(-n // 2) - 1]  # least value with 2*cum >= n

    out = load_all()["huber_location"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.event_type) == set(vals)
    for r in out.itertuples():
        v = vals[r.event_type]
        med = crossing_median(v)
        mad = crossing_median([abs(x - med) for x in v])
        k = 2 * mad
        psi = sum(max(min(x - med, k), -k) for x in v)
        clipped = sum(1 for x in v if abs(x - med) > k)
        n = len(v)
        hub = med + psi // n if psi >= 0 else med - ((-psi) // n)
        assert int(r.n) == n
        assert int(r.median_cents) == med
        assert int(r.mad_cents) == mad
        assert int(r.n_clipped) == clipped
        assert int(r.huber_cents) == hub
        # the one-step estimate stays within k of the median
        assert abs(int(r.huber_cents) - med) <= k
        # clipping is active but not total
        assert 0 < clipped < n


# --------------------------------------------------------------------- R270
def test_revenue_streaks_matches_brute_force(spark, duck):
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
    v = [daily.get(t, 0) for t in range(lo, hi + 1)]
    mu = sum(v) // len(v)
    flags = [1 if x > mu else 0 for x in v]
    runs: dict[int, list[tuple[int, int]]] = {0: [], 1: []}
    i = 0
    while i < len(flags):
        j = i
        while j < len(flags) and flags[j] == flags[i]:
            j += 1
        runs[flags[i]].append((j - i, lo + i))
        i = j

    out = (
        load_all()["revenue_streaks"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert sorted(out.hot) == [0, 1]
    for r in out.itertuples():
        rs = runs[int(r.hot)]
        longest = max(length for length, _ in rs)
        assert int(r.n_runs) == len(rs)
        assert int(r.n_days) == sum(length for length, _ in rs)
        assert int(r.longest) == longest
        assert int(r.longest_start) == min(
            s for length, s in rs if length == longest
        )
    # both sides partition the calendar
    assert int(out.n_days.sum()) == len(v)


# --------------------------------------------------------------------- R271
def test_abc_classification_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_partkey,"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    rev: dict[int, int] = defaultdict(int)
    for part, d in rows:
        rev[part] += d
    tot = sum(rev.values())
    # descending value-histogram crossing (ties share a value row)
    by_val: dict[int, int] = defaultdict(int)
    for v in rev.values():
        by_val[v] += v
    cm = 0
    v80 = v95 = None
    for v in sorted(by_val, reverse=True):
        cm += by_val[v]
        if v80 is None and 100 * cm >= 80 * tot:
            v80 = v
        if v95 is None and 100 * cm >= 95 * tot:
            v95 = v
    cls: dict[str, list[int]] = defaultdict(list)
    for v in rev.values():
        cls["A" if v >= v80 else ("B" if v >= v95 else "C")].append(v)

    out = (
        load_all()["abc_classification"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert sorted(out.cls) == sorted(cls)
    for r in out.itertuples():
        vs = cls[r.cls]
        assert int(r.n_parts) == len(vs)
        assert int(r.revenue) == sum(vs)
        assert int(r.share_milli) == (1000 * sum(vs)) // tot
    # the Pareto shape: A has fewer parts but the most revenue
    a = out[out.cls == "A"].iloc[0]
    c = out[out.cls == "C"].iloc[0]
    assert int(a.n_parts) < int(c.n_parts) or int(a.revenue) > int(
        c.revenue
    )
    assert int(a.share_milli) >= 790  # crossing rule: >= 80% minus floor
