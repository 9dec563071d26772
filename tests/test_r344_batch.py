"""R344-R346 batch: python replays + invariants for dag_path_census,
jl_distortion, skyline_depth. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R344
def test_dag_path_census_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.graph import CP_L, CP_W
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    keys = [int(r[0]) for r in duck.sql(
        "SELECT p_partkey FROM part").fetchall()]
    nodes = {md5int_py(f"cpn:{k}") % (CP_W * CP_L) for k in keys}
    edges = defaultdict(set)
    for u in nodes:
        if u // CP_W >= CP_L - 1:
            continue
        for tag in ("cpa", "cpb"):
            m = ((u // CP_W) + 1) * CP_W + md5int_py(f"{tag}:{u}") % CP_W
            if m in nodes:
                edges[u].add(m)
    ind = defaultdict(int)
    for u, outs in edges.items():
        for m in outs:
            ind[m] += 1

    f = {n: (1 if ind[n] == 0 else 0) for n in nodes}
    for l in range(1, CP_L):
        cand = defaultdict(int)
        for u, outs in edges.items():
            for m in outs:
                if m // CP_W == l:
                    cand[m] += f[u]
        for n in nodes:
            if n // CP_W == l and ind[n] > 0:
                f[n] = cand.get(n, 0)
    b = {n: (1 if not edges.get(n) else 0) for n in nodes}
    for l in range(CP_L - 2, -1, -1):
        for n in nodes:
            if n // CP_W == l and edges.get(n):
                b[n] = sum(b[m] for m in edges[n])
    total_src = sum(b[n] for n in nodes if ind[n] == 0)
    total_snk = sum(f[n] for n in nodes if not edges.get(n))
    assert total_src == total_snk  # double-count identity

    out = load_all()["dag_path_census"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(nodes)
    for r in out.itertuples():
        n = int(r.n)
        assert (int(r.f_paths), int(r.b_paths)) == (f[n], b[n]), n
        assert int(r.through) == f[n] * b[n]
        assert (int(r.total_src), int(r.total_snk)) == (
            total_src, total_snk)
        assert int(r.totals_match) == 1
    # every maximal path passes through some node in each layer it
    # spans; in particular sources and sinks carry the full mass
    assert total_src > 0


# --------------------------------------------------------------------- R345
def test_jl_distortion_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.similarity import (
        JL_DIM, JL_K, QUANT, _jl_signs,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    vecs = duck.sql(
        f"SELECT vec_id, list_transform(embedding, x -> GREATEST(LEAST("
        f"CAST(floor(x * {QUANT}e0) AS BIGINT), {QUANT}), -{QUANT}))"
        " FROM embeddings ORDER BY vec_id"
    ).fetchall()
    q = {int(i): [int(x) for x in v] for i, v in vecs}
    signs = _jl_signs()
    assert len(signs) == JL_K and all(len(r) == JL_DIM for r in signs)
    # signs are balanced-ish: no row is constant
    for row in signs:
        assert -JL_DIM < sum(row) < JL_DIM

    ratios = []
    for i in range(0, max(q) + 1, 2):
        if i not in q or i + 1 not in q:
            continue
        qa, qb = q[i], q[i + 1]
        td2 = sum((x - y) ** 2 for x, y in zip(qa, qb))
        if td2 == 0:
            continue
        pd2 = 0
        for row in signs:
            ya = sum(s * x for s, x in zip(row, qa))
            yb = sum(s * x for s, x in zip(row, qb))
            pd2 += (ya - yb) ** 2
        ratios.append((1000 * pd2) // (JL_K * td2))

    out = load_all()["jl_distortion"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    n = len(ratios)
    within = sum(1 for x in ratios if 700 <= x <= 1300)
    assert int(r.n_pairs) == n
    assert int(r.mean_ratio_milli) == sum(ratios) // n
    assert int(r.min_ratio_milli) == min(ratios)
    assert int(r.max_ratio_milli) == max(ratios)
    assert int(r.within30_milli) == (1000 * within) // n
    # JL at k=16 concentrates: most pairs within +-30 percent and the
    # mean ratio is near 1000 (unbiased estimator)
    assert within >= n // 2
    assert 600 <= sum(ratios) // n <= 1400


# --------------------------------------------------------------------- R346
def test_skyline_depth_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pts = [
        (int(k), int(s), int(p)) for k, s, p in duck.sql(
            "SELECT p_partkey, p_size,"
            " CAST(floor(p_retailprice * 100e0) AS BIGINT) FROM part"
        ).fetchall()
    ]

    def peel(rem):
        sky = []
        for k, s, p in rem:
            dom = any(
                s2 >= s and p2 <= p and (s2 > s or p2 < p)
                for _, s2, p2 in rem
            )
            if not dom:
                sky.append((k, s, p))
        keys = {k for k, _, _ in sky}
        return sky, [r for r in rem if r[0] not in keys]

    rem, exp = pts, {}
    for layer in (1, 2, 3):
        sky, rem = peel(rem)
        exp[layer] = (len(sky), min(p for _, _, p in sky),
                      max(s for _, s, _ in sky))
    exp[0] = (len(rem), min(p for _, _, p in rem),
              max(s for _, s, _ in rem))

    out = load_all()["skyline_depth"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.layer): (int(r.n_parts), int(r.min_price_cents),
                       int(r.max_size))
        for r in out.itertuples()
    }
    assert got == exp
    # peeling invariants: layers are nonempty and the cheapest price
    # can only rise (weakly) as layers deepen at the max-size corner
    assert all(exp[i][0] > 0 for i in (1, 2, 3))
    assert sum(exp[i][0] for i in (0, 1, 2, 3)) == len(pts)
