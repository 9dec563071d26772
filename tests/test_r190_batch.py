"""R190-R192 batch: python replays + invariants for weighted_quantiles,
ipf_balance, deletion_cascade. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R190
def test_weighted_quantiles_match_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag, "
        "CAST(floor(l_extendedprice * 100e0) AS BIGINT) AS cents, "
        "CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS q FROM lineitem"
    ).fetchall()
    hist: dict[str, dict[int, int]] = {}
    for flag, cents, q in rows:
        h = hist.setdefault(flag, {})
        h[int(cents)] = h.get(int(cents), 0) + int(q)
    want = {}
    for flag, h in hist.items():
        wt = sum(h.values())
        cw, p25, med, p75 = 0, None, None, None
        for cents in sorted(h):
            cw += h[cents]
            if p25 is None and 4 * cw >= wt:
                p25 = cents
            if med is None and 2 * cw >= wt:
                med = cents
            if p75 is None and 4 * cw >= 3 * wt:
                p75 = cents
        want[flag] = (wt, p25, med, p75, p75 - p25)

    q = load_all()["weighted_quantiles"]
    got = {
        r.flag: (int(r.w_total), int(r.p25_cents), int(r.median_cents),
                 int(r.p75_cents), int(r.wiqr_cents))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got == want
    # the crossing property that DEFINES the weighted median
    for flag, (wt, p25, med, p75, _) in got.items():
        assert p25 <= med <= p75
        h = hist[flag]
        cum_below = sum(q for c, q in h.items() if c < med)
        cum_at = cum_below + h[med]
        assert 2 * cum_below < wt <= 2 * cum_at


# --------------------------------------------------------------------- R191
def test_ipf_matches_python_replay_and_converges(spark):
    from tree_sitter_analyzer_spark.operators import trajectory as traj

    pings = traj.pings_df(spark, SF_TINY)
    flows = {
        (int(r.origin_cell), int(r.dest_cell)): 1000 * int(r.n_users)
        for r in traj.od_flows(pings, 7).toPandas().itertuples()
    }
    outm: dict[int, int] = {}
    inm: dict[int, int] = {}
    for (o, d), f in flows.items():
        outm[o] = outm.get(o, 0) + f
        inm[d] = inm.get(d, 0) + f
    cells = set(outm) | set(inm)
    t = {c: (outm.get(c, 0) + inm.get(c, 0)) // 2 for c in cells}

    def errs(fl):
        rs: dict[int, int] = {}
        cs: dict[int, int] = {}
        for (o, d), f in fl.items():
            rs[o] = rs.get(o, 0) + f
            cs[d] = cs.get(d, 0) + f
        tt = sum(t.values())
        re = 1000 * sum(abs(rs.get(c, 0) - t[c]) for c in t) // tt
        ce = 1000 * sum(abs(cs.get(c, 0) - t[c]) for c in t) // tt
        return re, ce, sum(fl.values())

    want = {}
    cur = dict(flows)
    for it in range(traj.IPF_ROUNDS + 1):
        re, ce, tot = errs(cur)
        want[it] = (re, ce, tot)
        if it == traj.IPF_ROUNDS:
            break
        rs: dict[int, int] = {}
        for (o, d), f in cur.items():
            rs[o] = rs.get(o, 0) + f
        cur = {
            (o, d): (f * t[o]) // rs[o] for (o, d), f in cur.items()
        }
        cs: dict[int, int] = {}
        for (o, d), f in cur.items():
            cs[d] = cs.get(d, 0) + f
        cur = {
            (o, d): (f * t[d]) // cs[d] for (o, d), f in cur.items()
        }

    got = {
        int(r.iter): (int(r.row_err_pm), int(r.col_err_pm),
                      int(r.total_milli))
        for r in traj.ipf_balance(pings).toPandas().itertuples()
    }
    assert got == want
    last = traj.IPF_ROUNDS
    # balancing genuinely improves both margins
    assert got[last][0] < got[0][0]
    assert got[last][1] < got[0][1]
    assert got[0][0] > 0  # the initial matrix is really unbalanced


# --------------------------------------------------------------------- R192
def test_deletion_cascade_closes_and_counts(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    n_del_c = duck.sql(
        "SELECT count(*) FROM customer WHERE c_custkey % 97 = 0"
    ).fetchone()[0]
    n_del_o = duck.sql(
        "SELECT count(*) FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)"
    ).fetchone()[0]

    q = load_all()["deletion_cascade"]
    got = {
        r.tbl: (int(r.n_rows), int(r.n_deleted), int(r.orphans_after))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got["customer"][1] == n_del_c > 0
    assert got["orders"][1] == n_del_o > 0
    assert got["lineitem"][1] > 0
    assert all(v[2] == 0 for v in got.values())  # the cascade closed
    # deeper tables delete at least as many rows as their parent keys
    assert got["lineitem"][1] >= got["orders"][1]
