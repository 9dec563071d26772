"""R374-R376 batch: python replays + invariants for assoc_rules,
var_es_risk, working_set_model."""

from __future__ import annotations

from itertools import combinations

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _baskets(duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT DISTINCT l.l_orderkey, p.p_brand FROM lineitem l"
        " JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    baskets: dict[int, set] = {}
    for oid, b in rows:
        baskets.setdefault(int(oid), set()).add(b)
    return baskets


# --------------------------------------------------------------------- R374
def test_assoc_rules_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    baskets = _baskets(duck)
    n_baskets = len(baskets)
    isup: dict[str, int] = {}
    for items in baskets.values():
        for i in items:
            isup[i] = isup.get(i, 0) + 1
    ms1 = max(2, n_baskets // 1000)
    f1 = {i for i, s in isup.items() if s >= ms1}
    bf = {o: sorted(i for i in it if i in f1) for o, it in baskets.items()}
    si = {}
    for v in bf.values():
        for i in v:
            si[i] = si.get(i, 0) + 1
    p_inc = sum(len(v) * (len(v) - 1) for v in bf.values())
    t_inc = sum(len(v) * (len(v) - 1) * (len(v) - 2) for v in bf.values())
    ms2, ms3 = max(2, p_inc // 600), max(2, t_inc // 13800)
    psup: dict[tuple, int] = {}
    tsup: dict[tuple, int] = {}
    for v in bf.values():
        for pr in combinations(v, 2):
            psup[pr] = psup.get(pr, 0) + 1
        for tr in combinations(v, 3):
            tsup[tr] = tsup.get(tr, 0) + 1
    f2 = {p for p, s in psup.items() if s >= ms2}
    triples = {
        t: s
        for t, s in tsup.items()
        if s >= ms3
        and (t[0], t[1]) in f2 and (t[0], t[2]) in f2 and (t[1], t[2]) in f2
    }
    expect = {}
    for (a, b, c), s3 in triples.items():
        for a1, cons in (((a, b), c), ((a, c), b), ((b, c), a)):
            sp = psup[a1]
            expect[(a1[0], a1[1], cons)] = (
                s3,
                _tdiv(1000 * s3, sp),
                _tdiv(1000 * s3 * n_baskets, sp * si[cons]),
            )

    out = load_all()["assoc_rules"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(expect) == 3 * len(triples)
    lifts = []
    for row in out.itertuples():
        key = (row.ante1, row.ante2, row.cons)
        s3, conf, lift = expect[key]
        assert int(row.support) == s3
        assert int(row.conf_milli) == conf
        assert int(row.lift_milli) == lift
        lifts.append(lift)
    # lift is centered on independence for a near-uniform basket model,
    # but not degenerate: both sides of 1000 occur
    assert any(v > 1000 for v in lifts) and any(v < 1000 for v in lifts)


# --------------------------------------------------------------------- R375
def test_var_es_risk_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    daily = dict(
        duck.sql(
            "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
            " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
            " AS BIGINT)) // 1000 AS BIGINT)"
            " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
        ).fetchall()
    )
    y = [int(daily.get(d, 0)) for d in range(1, 367)]
    dl = sorted(
        (y[i] - y[i - 1], i + 1) for i in range(1, 366)
    )
    n = len(dl)
    k95, k99 = (5 * n + 99) // 100, (n + 99) // 100
    var95, var99 = dl[k95 - 1][0], dl[k99 - 1][0]
    es95 = _tdiv(sum(v for v, _ in dl[:k95]), k95)
    es99 = _tdiv(sum(v for v, _ in dl[:k99]), k99)

    out = load_all()["var_es_risk"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.n_deltas) == n == 365
    assert (int(r.var95), int(r.var99)) == (var95, var99)
    assert (int(r.es95), int(r.es99)) == (es95, es99)
    assert int(r.worst_delta) == dl[0][0]
    assert int(r.coherent_ok) == 1
    # coherence holds in the replay too (tail mean never above its cut)
    assert es99 <= es95 <= var95 and es99 <= var99


# --------------------------------------------------------------------- R376
def test_working_set_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT p.p_brand, dayofyear(CAST(l.l_shipdate AS DATE))"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " WHERE year(l.l_shipdate) = 1996 GROUP BY 1, 2"
    ).fetchall()
    pres: dict[str, set] = {}
    for b, d in rows:
        pres.setdefault(b, set()).add(int(d))
    brands = sorted(pres)

    out = (
        load_all()["working_set_model"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert sorted(out.tau.astype(int)) == [1, 7, 14, 30]
    means = {}
    for row in out.itertuples():
        tau = int(row.tau)
        ws = []
        for t in range(tau, 367):
            win = range(t - tau + 1, t + 1)
            ws.append(
                sum(1 for b in brands if any(d in pres[b] for d in win))
            )
        assert int(row.n_days) == len(ws) == 367 - tau
        assert int(row.mean_ws_milli) == _tdiv(1000 * sum(ws), len(ws))
        assert int(row.min_ws) == min(ws)
        assert int(row.max_ws) == max(ws)
        means[tau] = int(row.mean_ws_milli)
    # working sets are monotone in the window (Denning's inclusion)
    assert means[1] <= means[7] <= means[14] <= means[30]
