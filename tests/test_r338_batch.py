"""R338-R340 batch: python replays + invariants for bh_fdr,
distance_cov, gumbel_maxima. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


def _z_mon(duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " month(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2"
    ).fetchall()
    v = {int(d): (int(m), int(x)) for d, m, x in rows}
    vmax = max(max(x for _, x in v.values()), 1)
    return {d: (m, (1000 * x) // vmax) for d, (m, x) in v.items()}


# --------------------------------------------------------------------- R338
def test_bh_fdr_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    z = _z_mon(duck)
    stats = {}
    for mon in range(1, 13):
        days = {d: x for d, (m, x) in z.items() if m == mon}
        we = [d for d in days if d % 7 in (6, 0)]
        wd = [d for d in days if d % 7 not in (6, 0)]
        s_we = sum(days[d] for d in we)
        s_wd = sum(days[d] for d in wd)
        t_obs = s_we * len(wd) - s_wd * len(we)
        n_ge = 0
        s_all = sum(days.values())
        for b in range(1, 33):
            sb = nb = 0
            for d in days:
                if md5int_py(f"bh:{b}:{d}") % 7 < 2:
                    sb += days[d]
                    nb += 1
            t_b = sb * (len(days) - nb) - (s_all - sb) * nb
            if abs(t_b) >= abs(t_obs):
                n_ge += 1
        stats[mon] = (t_obs, n_ge)

    ranked = sorted(stats, key=lambda m: (stats[m][1], m))
    rnk = {m: i + 1 for i, m in enumerate(ranked)}
    ks = [rnk[m] for m in stats if 60 * stats[m][1] <= 32 * rnk[m]]
    k = max(ks) if ks else 0

    out = load_all()["bh_fdr"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 12
    for r in out.itertuples():
        m = int(r.mon)
        assert (int(r.t_obs), int(r.n_ge)) == stats[m]
        assert int(r.rnk) == rnk[m]
        assert int(r.p_milli) == (1000 * stats[m][1]) // 32
        assert int(r.bh_reject) == (1 if rnk[m] <= k else 0)
    # BH step-up: the reject set is a prefix of the p-value ranking
    rejects = {int(r.rnk) for r in out.itertuples() if r.bh_reject}
    assert rejects == set(range(1, len(rejects) + 1))


# --------------------------------------------------------------------- R339
def test_distance_cov_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT (dayofyear(CAST(l_shipdate AS DATE)) - 1) // 7,"
        " sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)), count(*)"
        " FROM lineitem WHERE year(l_shipdate) = 1996"
        " AND dayofyear(CAST(l_shipdate AS DATE)) <= 364 GROUP BY 1"
    ).fetchall()
    rmax = max(max(int(r[1]) for r in rows), 1)
    cmax = max(max(int(r[2]) for r in rows), 1)
    pts = [((100 * int(rev)) // rmax, (100 * int(cnt)) // cmax)
           for _, rev, cnt in rows]
    n = len(pts)
    assert n == 52  # every 1996 week trades at any SF

    ax = [[abs(pts[j][0] - pts[k][0]) for k in range(n)]
          for j in range(n)]
    ay = [[abs(pts[j][1] - pts[k][1]) for k in range(n)]
          for j in range(n)]

    def centered(a):
        row = [sum(a[j]) for j in range(n)]
        g = sum(row)
        return [[n * n * a[j][k] - n * row[j] - n * row[k] + g
                 for k in range(n)] for j in range(n)]

    axc, ayc = centered(ax), centered(ay)
    dcov2 = sum(axc[j][k] * ayc[j][k] for j in range(n)
                for k in range(n))
    dvarx = sum(x * x for r_ in axc for x in r_)
    dvary = sum(y * y for r_ in ayc for y in r_)

    out = load_all()["distance_cov"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_pairs), int(r.dcov2), int(r.dvarx),
            int(r.dvary)) == (n * n, dcov2, dvarx, dvary)
    want = 0
    if dcov2 > 0 and dvarx and dvary:
        want = (((1000 * dcov2) // dvarx) * dcov2) // dvary
    assert int(r.dcor4_milli) == want
    # Cauchy-Schwarz: dCov^2 <= sqrt(dVarX * dVarY) => dcor4 <= 1000
    assert 0 <= want <= 1000
    # weekly revenue and weekly count are strongly dependent
    assert dcov2 > 0


# --------------------------------------------------------------------- R340
def test_gumbel_maxima_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    z = _z_mon(duck)
    mx = {}
    for d, (m, x) in z.items():
        mx[m] = max(mx.get(m, 0), x)
    vals = sorted((mx[m], m) for m in mx)
    n = len(vals)
    assert n == 12
    s = sum(v for v, _ in vals)
    b1num = sum(i * v for i, (v, _) in enumerate(vals))
    l2num = 2 * b1num - (n - 1) * s
    l1 = (1000 * s) // n
    scale = (1000000 * l2num) // (n * (n - 1) * 693)
    loc = l1 - (577 * scale) // 1000
    rl12 = loc + (2442 * scale) // 1000

    out = load_all()["gumbel_maxima"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_blocks), int(r.sum_max), int(r.b1num),
            int(r.l2num)) == (n, s, b1num, l2num)
    assert (int(r.l1_mz), int(r.scale_mz), int(r.loc_mz),
            int(r.rl12_mz)) == (l1, scale, loc, rl12)
    # L2 >= 0 for any sample (it is an expected absolute difference)
    assert l2num >= 0
    # the 12-month return level sits above the location parameter
    assert rl12 >= loc
    # ... and above the fitted mean less one scale (sanity band)
    assert rl12 >= l1 - scale
