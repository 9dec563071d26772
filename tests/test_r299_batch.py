"""R299-R301 batch: python replays + invariants for strahler_order,
lacunarity, kriging_loo. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views

_PACK = 268_435_456


def _parent_map(duck):
    """The D8 ascent parent map straight from the oracle's own CTEs."""
    from tree_sitter_analyzer_spark.operators.hydrology import (
        FLOW_RES,
        _base_ctes,
    )
    from tree_sitter_analyzer_spark.synth import oracle_ctes

    return dict(
        duck.sql(
            f"{oracle_ctes()},\n{_base_ctes(FLOW_RES)}"
            " SELECT v, p FROM hy_parent"
        ).fetchall()
    )


# --------------------------------------------------------------------- R299
def test_strahler_matches_recursive_python_replay(spark, duck):
    """Algorithm-independent check: exact bottom-up Strahler on the
    forest (memoized recursion) vs the engine's synchronized rounds."""
    import sys

    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    par = _parent_map(duck)
    children = defaultdict(list)
    for v, p in par.items():
        if p != v:
            children[p].append(v)

    sys.setrecursionlimit(100000)
    memo = {}

    def strahler(v):
        if v in memo:
            return memo[v]
        ch = children.get(v, [])
        if not ch:
            memo[v] = 1
            return 1
        orders = [strahler(c) for c in ch]
        m = max(orders)
        memo[v] = m + (1 if orders.count(m) >= 2 else 0)
        return memo[v]

    hist = defaultdict(int)
    for v in par:
        hist[strahler(v)] += 1
    out = load_all()["strahler_order"].spark_fn(spark, SF_TINY).toPandas()
    got = {int(r.strahler): int(r.n_cells) for r in out.itertuples()}
    assert got == dict(hist)
    # bifurcation ratio column: n(o)/n(o+1) x1000, -1 on top order
    rb = {int(r.strahler): int(r.rb_milli) for r in out.itertuples()}
    top = max(got)
    for o, r in rb.items():
        if o == top:
            assert r == -1
        else:
            assert r == (1000 * got[o]) // got[o + 1]


def test_strahler_rounds_converged(spark):
    from tree_sitter_analyzer_spark.operators.hydrology import (
        strahler_orders,
    )
    from tree_sitter_analyzer_spark.synth import tiles_df

    t = tiles_df(spark, SF_TINY)
    a = strahler_orders(t, rounds=7).toPandas()
    b = strahler_orders(t, rounds=8).toPandas()
    ka = sorted(map(tuple, a[["strahler", "n_cells"]].to_numpy()))
    kb = sorted(map(tuple, b[["strahler", "n_cells"]].to_numpy()))
    assert ka == kb


# --------------------------------------------------------------------- R300
def test_lacunarity_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    from tree_sitter_analyzer_spark.synth import oracle_ctes

    subs = duck.sql(
        f"{oracle_ctes()} SELECT DISTINCT"
        " CAST(floor((lon + 180.0e0) * 2048) AS BIGINT),"
        " CAST(floor((lat + 90.0e0) * 2048) AS BIGINT) FROM tiles"
    ).fetchall()
    out = load_all()["lacunarity"].spark_fn(spark, SF_TINY).toPandas()
    for r in out.itertuples():
        k = 1 << (11 - int(r.res))
        boxes = defaultdict(int)
        for sx, sy in subs:
            boxes[(sx // k, sy // k)] += 1
        xs = [b[0] for b in boxes]
        ys = [b[1] for b in boxes]
        n_bbox = (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        s1 = sum(boxes.values())
        s2 = sum(v * v for v in boxes.values())
        assert int(r.n_boxes_bbox) == n_bbox
        assert int(r.n_occ) == len(boxes)
        assert (int(r.s1), int(r.s2)) == (s1, s2)
        assert int(r.lac_milli) == (1000 * n_bbox * s2) // (s1 * s1)
        # Cauchy-Schwarz floor: Lambda >= N / n_occ
        assert int(r.lac_milli) >= (1000 * n_bbox) // int(r.n_occ) - 1
    # gappiness grows with finer boxes on a clustered set
    srt = out.sort_values("res")
    assert srt.lac_milli.iloc[0] < srt.lac_milli.iloc[-1]


# --------------------------------------------------------------------- R301
def test_kriging_loo_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.pointpattern import (
        KRG_H,
        KRG_RES,
    )
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.synth import oracle_ctes

    register_views(duck, SF_TINY)
    cells = duck.sql(
        f"{oracle_ctes()} SELECT"
        f" CAST(floor((lon + 180.0e0) * {1 << KRG_RES}) AS BIGINT),"
        f" CAST(floor((lat + 90.0e0) * {1 << KRG_RES}) AS BIGINT),"
        " count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    vmax = max(n for _, _, n in cells)
    obs = {(int(x), int(y)): (1000 * int(n)) // vmax for x, y, n in cells}
    mu = sum(obs.values()) // len(obs)
    sae_k = sae_1 = sae_m = n_eval = 0
    for (fx, fy), fz in obs.items():
        cand = []
        for (nx, ny), nz in obs.items():
            d = max(abs(fx - nx), abs(fy - ny))
            if 0 < d <= KRG_H:
                cand.append((d, nx * _PACK + ny, nx, ny, nz))
        if len(cand) < 2:
            continue
        cand.sort()
        d1, _, x1, y1, z1 = cand[0]
        d2, _, x2, y2, z2 = cand[1]
        g12 = max(abs(x1 - x2), abs(y1 - y2))
        a1, a2 = g12 - d1 + d2, g12 + d1 - d2
        assert a1 >= 0 and a2 >= 0  # triangle inequality => valid weights
        pred = (a1 * z1 + a2 * z2) // (2 * g12)
        n_eval += 1
        sae_k += abs(fz - pred)
        sae_1 += abs(fz - z1)
        sae_m += abs(fz - mu)
    out = load_all()["kriging_loo"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.n_obs) == len(obs)
    assert int(r.n_eval) == n_eval
    assert (int(r.sae_krig), int(r.sae_nn1), int(r.sae_mean)) == (
        sae_k, sae_1, sae_m,
    )
    # spatially structured surface: kriging beats 1-NN and global mean
    assert int(r.sae_krig) <= int(r.sae_nn1)
    assert int(r.sae_krig) < int(r.sae_mean)
