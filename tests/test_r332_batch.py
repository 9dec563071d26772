"""R332-R334 batch: python replays + invariants for critical_path,
rs_ladder, permutation_test. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views


def _z_daily(duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall()
    v = {int(d): int(x) for d, x in rows}
    vmax = max(max(v.values()), 1)
    return {d: (1000 * v.get(d, 0)) // vmax for d in range(1, 367)}


# --------------------------------------------------------------------- R332
def test_critical_path_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.graph import CP_L, CP_W
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    keys = [int(r[0]) for r in duck.sql(
        "SELECT p_partkey FROM part").fetchall()]
    nodes = {md5int_py(f"cpn:{k}") % (CP_W * CP_L) for k in keys}
    edges = defaultdict(dict)  # u -> {m: w}
    for u in nodes:
        if u // CP_W >= CP_L - 1:
            continue
        for tag in ("cpa", "cpb"):
            m = ((u // CP_W) + 1) * CP_W + md5int_py(f"{tag}:{u}") % CP_W
            if m in nodes:
                edges[u][m] = 1 + md5int_py(f"cpw:{u}:{m}") % 9

    es = {n: 0 for n in nodes}
    for l in range(1, CP_L):
        cand = defaultdict(int)
        for u, outs in edges.items():
            for m, w in outs.items():
                if m // CP_W == l:
                    cand[m] = max(cand[m], es[u] + w)
        for n in nodes:
            if n // CP_W == l:
                es[n] = cand.get(n, 0)
    ls = {n: 0 for n in nodes}
    for l in range(CP_L - 2, -1, -1):
        cand = defaultdict(int)
        for u, outs in edges.items():
            if u // CP_W == l:
                for m, w in outs.items():
                    cand[u] = max(cand[u], ls[m] + w)
        for n in nodes:
            if n // CP_W == l:
                ls[n] = cand.get(n, 0)
    cp = max(es[n] + ls[n] for n in nodes)

    out = load_all()["critical_path"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(nodes)
    n_crit = 0
    for r in out.itertuples():
        n = int(r.n)
        assert (int(r.layer), int(r.es), int(r.ls)) == (
            n // CP_W, es[n], ls[n])
        assert int(r.through) == es[n] + ls[n]
        assert int(r.slack) == cp - es[n] - ls[n]
        assert int(r.slack) >= 0
        n_crit += int(r.is_critical)
    # at least one full critical chain exists (every layer it touches
    # contributes >= 1 critical node), and not everything is critical
    assert n_crit >= 2
    assert n_crit < len(nodes)
    # CP is realized by an actual path: walk greedily along slack-0
    # successors from a slack-0 source
    crit = {n for n in nodes if cp - es[n] - ls[n] == 0}
    srcs = [n for n in crit if es[n] == 0]
    assert srcs
    cur, total = min(srcs), 0
    while True:
        nxt = [(m, w) for m, w in edges.get(cur, {}).items()
               if m in crit and es[m] == es[cur] + w]
        if not nxt:
            break
        cur = nxt[0][0]
        total += nxt[0][1]
    assert total == cp


# --------------------------------------------------------------------- R333
def test_rs_ladder_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    z = _z_daily(duck)
    exp = {}
    for w in (30, 60, 90, 180):
        nb = 366 // w
        sum_r = sum_s2 = 0
        for b in range(nb):
            vals = [z[d] for d in range(b * w + 1, (b + 1) * w + 1)]
            m = sum(vals) // w
            c, cum = [], 0
            for x in vals:
                cum += x - m
                c.append(cum)
            sum_r += max(c) - min(c)
            sum_s2 += sum((x - m) ** 2 for x in vals)
        exp[w] = (nb, sum_r, sum_s2,
                  (1000 * sum_r) // nb, sum_s2 // nb)

    out = load_all()["rs_ladder"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.w): (int(r.n_blocks), int(r.sum_r), int(r.sum_s2),
                   int(r.mean_r_milli), int(r.mean_s2))
        for r in out.itertuples()
    }
    assert got == exp
    # ladder ordering: mean range grows with the scale
    means = [exp[w][3] for w in (30, 60, 90, 180)]
    assert means == sorted(means)
    # R bounds: for any block, R <= w * max|z - m| <= w * 2000
    for w in (30, 60, 90, 180):
        assert exp[w][1] <= (366 // w) * w * 2000


# --------------------------------------------------------------------- R334
def test_permutation_test_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    z = _z_daily(duck)
    we = [d for d in z if d % 7 in (6, 0)]
    wd = [d for d in z if d % 7 not in (6, 0)]
    s_we, s_wd = sum(z[d] for d in we), sum(z[d] for d in wd)
    t_obs = s_we * len(wd) - s_wd * len(we)
    n_ge = 0
    for b in range(1, 65):
        sb = nb = 0
        s_all = sum(z.values())
        for d in z:
            if md5int_py(f"pt:{b}:{d}") % 7 < 2:
                sb += z[d]
                nb += 1
        t_b = sb * (366 - nb) - (s_all - sb) * nb
        if abs(t_b) >= abs(t_obs):
            n_ge += 1

    out = load_all()["permutation_test"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_we), int(r.n_wd)) == (len(we), len(wd))
    assert int(r.t_obs) == t_obs
    assert int(r.n_draws) == 64
    assert int(r.n_ge) == n_ge
    assert int(r.p_milli) == (1000 * n_ge) // 64
    # calendar structure: 1996 has 104 weekend days under the
    # Monday-anchored doy % 7 rule (Jan 6 is the first Saturday)
    assert len(we) == 104
