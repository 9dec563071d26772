"""R320-R322 batch: python replays + invariants for anova_f, levene_bf,
iv_wald. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views


def _z_frame(duck):
    """Replay the shared per-mille densified (group, doy) -> z frame."""
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag, dayofyear(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2"
    ).fetchall()
    v = {(g, int(d)): int(x) for g, d, x in rows}
    vmax = max(max(v.values()), 1)
    return {
        (g, d): (1000 * v.get((g, d), 0)) // vmax
        for g in ("A", "N", "R")
        for d in range(1, 367)
    }


def _anova(vals: dict) -> tuple:
    """Floored-mean integer ANOVA over {(g, doy): v} -> full output row."""
    sg, ng = defaultdict(int), defaultdict(int)
    for (g, _), x in vals.items():
        sg[g] += x
        ng[g] += 1
    n, s, k = sum(ng.values()), sum(sg.values()), len(ng)
    mg = {g: sg[g] // ng[g] for g in ng}
    m = s // n
    ssb = sum(ng[g] * (mg[g] - m) ** 2 for g in ng)
    ssw = sum((x - mg[g]) ** 2 for (g, _), x in vals.items())
    f = 0 if ssw == 0 else (1000 * ssb * (n - k)) // (ssw * (k - 1))
    return n, k, ssb, ssw, f


# --------------------------------------------------------------------- R320
def test_anova_f_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    z = _z_frame(duck)
    n, k, ssb, ssw, f = _anova(z)
    out = load_all()["anova_f"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.n_obs), int(r.k_groups), int(r.ssb), int(r.ssw),
            int(r.f_milli)) == (n, k, ssb, ssw, f)
    # densified calendar: exactly 366 days x 3 groups, F nonnegative
    assert n == 1098 and k == 3
    assert ssw > 0 and f >= 0
    # per-mille normalization bounds every observation
    assert all(0 <= x <= 1000 for x in z.values())


# --------------------------------------------------------------------- R321
def test_levene_bf_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    z = _z_frame(duck)
    # doubled lower-median pair per group (ranks 183 + 184 of 366,
    # ordered by (z, doy) exactly as the window does)
    m2 = {}
    for g in ("A", "N", "R"):
        srt = sorted((z[(g, d)], d) for d in range(1, 367))
        m2[g] = srt[182][0] + srt[183][0]
    w = {(g, d): abs(2 * z[(g, d)] - m2[g])
         for g in ("A", "N", "R") for d in range(1, 367)}
    n, k, ssb, ssw, f = _anova(w)
    out = load_all()["levene_bf"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_obs), int(r.k_groups), int(r.ssb), int(r.ssw),
            int(r.f_milli)) == (n, k, ssb, ssw, f)
    # the deviation transform kept everything integral and nonnegative
    assert all(x >= 0 for x in w.values())
    assert ssw > 0


# --------------------------------------------------------------------- R322
def test_iv_wald_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)), count(*),"
        " sum(CASE WHEN l_tax >= 0.04e0 THEN 1 ELSE 0 END),"
        " sum(CAST(floor(l_discount * 1000e0) AS BIGINT)),"
        " sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall()
    obs = []
    for _, n, na, sdisc, nr in rows:
        obs.append(((1000 * int(na)) // int(n),
                    (1000 * int(sdisc)) // int(n),
                    (1000 * int(nr)) // int(n)))
    nd = len(obs)
    mz = sum(z for z, _, _ in obs) // nd
    mx = sum(x for _, x, _ in obs) // nd
    my = sum(y for _, _, y in obs) // nd
    szx = sum((z - mz) * (x - mx) for z, x, _ in obs)
    szy = sum((z - mz) * (y - my) for z, _, y in obs)
    sxy = sum((x - mx) * (y - my) for _, x, y in obs)
    sxx = sum((x - mx) ** 2 for _, x, _ in obs)
    szz = sum((z - mz) ** 2 for z, _, _ in obs)

    out = load_all()["iv_wald"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_days), int(r.szx), int(r.szy), int(r.sxy),
            int(r.sxx), int(r.szz)) == (nd, szx, szy, sxy, sxx, szz)
    # sign-safe milli slopes
    iv_sign = 0 if szx == 0 or szy == 0 else (
        1 if (szy > 0) == (szx > 0) else -1)
    iv_abs = 0 if szx == 0 else (1000 * abs(szy)) // abs(szx)
    assert int(r.iv_sign) == iv_sign and int(r.iv_abs_milli) == iv_abs
    assert int(r.ols_abs_milli) == (1000 * abs(sxy)) // max(sxx, 1)
    assert int(r.fs_abs_milli) == (1000 * abs(szx)) // max(szz, 1)
    # the instrument is informative: first stage is nonzero
    assert szx != 0 and szz > 0
