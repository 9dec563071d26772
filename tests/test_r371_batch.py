"""R371-R373 batch: python replays + invariants for p1_median_site,
quantile_normalize, youngdaly_checkpoint. The 1-median replay also
BRUTE-FORCES the optimum over every occupied cell — verifying the L1
separability theorem, not just the query's arithmetic; the Young-Daly
replay checks the best rung against the true continuous optimum."""

from __future__ import annotations

import math

from tree_sitter_analyzer_spark import synth

from .conftest import SF_TINY, register_views

RES = 7


# --------------------------------------------------------------------- R371
def test_p1_median_site_matches_and_theorem_holds(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pts = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) SELECT lon, lat FROM tiles"
    ).fetchall()
    hist: dict[tuple[int, int], int] = {}
    for lon, lat in pts:
        ix = math.floor((lon + 180.0) * (1 << RES))
        iy = math.floor((lat + 90.0) * (1 << RES))
        hist[(ix, iy)] = hist.get((ix, iy), 0) + 1
    total = sum(hist.values())

    def wmedian(axis: int) -> int:
        marg: dict[int, int] = {}
        for k, n in hist.items():
            marg[k[axis]] = marg.get(k[axis], 0) + n
        c = 0
        for v in sorted(marg):
            c += marg[v]
            if 2 * c >= total:
                return v
        raise AssertionError

    mx, my = wmedian(0), wmedian(1)

    def cost(cx: int, cy: int) -> int:
        return sum(
            n * (abs(ix - cx) + abs(iy - cy))
            for (ix, iy), n in hist.items()
        )

    cands = sorted(hist.items(), key=lambda t: (-t[1], t[0]))[:15]
    cand_set = {c for c, _ in cands} | {(mx, my)}
    med_cost = cost(mx, my)
    # THEOREM (L1 separability): the weighted-median cell beats EVERY
    # occupied cell — brute force over all of them.
    assert all(med_cost <= cost(ix, iy) for ix, iy in hist)

    out = load_all()["p1_median_site"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(cand_set)
    costs = {}
    for row in out.itertuples():
        key = (int(row.ix), int(row.iy))
        assert key in cand_set
        c = cost(*key)
        costs[key] = c
        assert int(row.cost) == c
        assert int(row.n_self) == hist.get(key, 0)
        assert int(row.is_median) == (1 if key == (mx, my) else 0)
        assert int(row.optimal_ok) == 1
    order = sorted(costs, key=lambda k: (costs[k], k))
    ranks = {
        int(r.cost_rank): (int(r.ix), int(r.iy)) for r in out.itertuples()
    }
    assert [ranks[i + 1] for i in range(len(order))] == order
    densest = cands[0][0]
    regret = 1000 * costs[densest] // med_cost - 1000
    assert all(int(r.densest_regret_milli) == regret for r in out.itertuples())


# --------------------------------------------------------------------- R372
def test_quantile_normalize_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT source, n_chars // 50, count(*)"
        " FROM documents GROUP BY 1, 2"
    ).fetchall()
    per_src: dict[str, dict[int, int]] = {}
    pooled: dict[int, int] = {}
    for s, b, n in rows:
        per_src.setdefault(s, {})[int(b)] = int(n)
        pooled[int(b)] = pooled.get(int(b), 0) + int(n)
    pb = sorted(pooled)
    totp = sum(pooled.values())
    cump = {}
    c = 0
    for b in pb:
        c += pooled[b]
        cump[b] = c

    out = (
        load_all()["quantile_normalize"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    n_rows = sum(len(v) for v in per_src.values())
    assert len(out) == n_rows
    for row in out.itertuples():
        src, b = row.source, int(row.bin)
        hist = per_src[src]
        tot = sum(hist.values())
        cb = sum(v for k, v in hist.items() if k < b)
        pct = ((2 * cb + hist[b]) * 500000) // tot
        mapped = min(x for x in pb if cump[x] * 1000000 >= pct * totp)
        assert int(row.n) == hist[b]
        assert int(row.pct_ppm) == pct
        assert int(row.mapped_bin) == mapped
        assert int(row.shift) == mapped - b
    # normalization is anchored: the pooled-median region maps near itself,
    # and every mapped bin is a real pooled bin
    assert set(out.mapped_bin.astype(int)) <= set(pb)


# --------------------------------------------------------------------- R373
def test_youngdaly_matches_replay_and_brackets_optimum(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    (payload,) = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()})"
        " SELECT CAST(sum(CAST(w AS BIGINT) * CAST(h AS BIGINT) * 3)"
        " AS BIGINT) FROM tiles"
    ).fetchall()[0]
    delta = max(1, int(payload) // 200000)
    M = 3600000
    expect = []
    for k in range(16):
        w = delta * (1 << k)
        expect.append((k, w, 1000000 * delta // w + 1000000 * w // (2 * M)))
    best = min(w for *_, w in expect)
    best_k = min(k for k, _, w in expect if w == best)

    out = (
        load_all()["youngdaly_checkpoint"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == 16
    for row in out.itertuples():
        k = int(row.k)
        _, w, waste = expect[k]
        assert int(row.delta_ms) == delta
        assert int(row.w_ms) == w
        assert int(row.waste_ppm) == waste
        assert int(row.is_best) == (1 if waste == best else 0)
        assert int(row.bracket_ok) == (1 if best_k not in (0, 15) else 0)
    # the best rung is within one ladder step of the TRUE continuous
    # optimum W* = sqrt(2 delta M) (geometric ladder guarantee)
    wstar = math.sqrt(2 * delta * M)
    wbest = delta * (1 << best_k)
    assert wstar / 2 <= wbest <= wstar * 2
