"""R377-R379 batch: python replays + invariants for bullwhip_ratio,
metric_knn_rerank, texttiling_boundaries."""

from __future__ import annotations

import math

from tree_sitter_analyzer_spark import synth

from .conftest import SF_TINY, register_views

MLON = [
    int(math.floor(math.cos(math.radians(35.4 + 0.05 * (b + 0.5))) * 1e6
                   * 111319.49 / 1e6))
    for b in range(10)
]
MLAT = 111132


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------------------------- R377
def test_bullwhip_ratio_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    o = dict(duck.sql(
        "SELECT (dayofyear(CAST(o_orderdate AS DATE)) - 1) // 7,"
        " CAST(sum(CAST(floor(o_totalprice * 100e0) AS BIGINT)) AS BIGINT)"
        " FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1"
    ).fetchall())
    s = dict(duck.sql(
        "SELECT (dayofyear(CAST(l_shipdate AS DATE)) - 1) // 7,"
        " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)) AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall())
    o = {k: v for k, v in o.items() if k <= 51}
    s = {k: v for k, v in s.items() if k <= 51}
    to, ts = sum(o.values()), sum(s.values())
    vo = [5200 * o.get(w, 0) // to for w in range(52)]
    vs = [5200 * s.get(w, 0) // ts for w in range(52)]
    n = 52
    so, qo = sum(vo), sum(x * x for x in vo)
    ss, qs = sum(vs), sum(x * x for x in vs)
    cvo = 1000000 * (n * qo - so * so) // (so * so)
    cvs = 1000000 * (n * qs - ss * ss) // (ss * ss)
    bw = 1000 * cvs // max(cvo, 1)

    out = load_all()["bullwhip_ratio"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 52
    for row in out.itertuples():
        w = int(row.wk)
        assert int(row.demand_norm) == vo[w]
        assert int(row.upstream_norm) == vs[w]
        assert int(row.cv2_o_ppm) == cvo
        assert int(row.cv2_s_ppm) == cvs
        assert int(row.bullwhip_milli) == bw
    # normalization keeps weekly values near 100 at any SF
    assert 90 <= sum(vo) // 52 <= 100 and 90 <= sum(vs) // 52 <= 100


# --------------------------------------------------------------------- R378
def test_metric_knn_rerank_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    tiles = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()})"
        " SELECT i, CAST(floor(lon * 1000000e0) AS BIGINT),"
        " CAST(floor(lat * 1000000e0) AS BIGINT) FROM tiles"
    ).fetchall()
    qs = duck.sql(
        f"WITH qpoints AS ({synth.qpoints_sql()})"
        " SELECT query_id, CAST(floor(qlon * 1000000e0) AS BIGINT),"
        " CAST(floor(qlat * 1000000e0) AS BIGINT), qlat FROM qpoints"
    ).fetchall()
    expect = {}
    n_dis = 0
    for qid, qx, qy, qlat in qs:
        band = min(9, max(0, math.floor((qlat - 35.4) * 20.0)))
        ml = MLON[band]
        best_p = best_m = None
        for i, tx, ty in tiles:
            dx, dy = int(tx) - int(qx), int(ty) - int(qy)
            d2p = dx * dx + dy * dy
            d2m = _tdiv(dx * ml, 1000) ** 2 + _tdiv(dy * MLAT, 1000) ** 2
            if best_p is None or (d2p, i) < best_p:
                best_p = (d2p, i)
            if best_m is None or (d2m, i) < best_m:
                best_m = (d2m, i)
        expect[int(qid)] = (band, best_p, best_m)
        if best_p[1] != best_m[1]:
            n_dis += 1

    out = (
        load_all()["metric_knn_rerank"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == len(qs) == 50
    for row in out.itertuples():
        band, bp, bm = expect[int(row.query_id)]
        assert int(row.band) == band
        assert int(row.planar_nn) == bp[1]
        assert int(row.metric_nn) == bm[1]
        assert int(row.d2p_min) == bp[0]
        assert int(row.d2m_min) == bm[0]
        assert int(row.flipped) == (1 if bp[1] != bm[1] else 0)
        assert int(row.n_disagree) == n_dis
        assert int(row.disagree_milli) == 1000 * n_dis // 50


# --------------------------------------------------------------------- R379
def test_texttiling_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    k = 8
    expect = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        gaps = list(range(k, n - k + 1))  # 1-based pos k .. n-k
        if not gaps:
            continue
        jac = {}
        for g in gaps:
            left = set(toks[g - k:g])
            right = set(toks[g:g + k])
            uni = left | right
            jac[g] = 1000 * len(left & right) // len(uni)
        vals = [jac[g] for g in gaps]
        valleys = sum(
            1
            for a, b, c in zip(vals, vals[1:], vals[2:])
            if b < a and b < c
        )
        deepest = min(vals)
        dg = min(g for g in gaps if jac[g] == deepest)
        expect[int(doc_id)] = (
            len(gaps), 1000 * sum(vals) // (1000 * len(vals)),
            valleys, deepest, dg,
        )

    out = (
        load_all()["texttiling_boundaries"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == len(expect)
    for row in out.itertuples():
        ng, mj, nv, dj, dg = expect[int(row.doc_id)]
        assert int(row.n_gaps) == ng
        assert int(row.mean_jac_milli) == mj
        assert int(row.n_valleys) == nv
        assert int(row.deepest_jac_milli) == dj
        assert int(row.deepest_g) == dg
    # cohesion is a proper fraction somewhere: valleys exist corpus-wide
    assert out.n_valleys.astype(int).sum() > 0
