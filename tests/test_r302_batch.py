"""R302-R304 batch: python replays + invariants for adjusted_rand,
rocchio_expand, blob_census. Oracle parity (first two) rides
test_oracle_parity; blob_census is a decoded-pixel rows-only op with
the numpy reference replayed here."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .conftest import SF_TINY, register_views

_PACK = 268_435_456


# --------------------------------------------------------------------- R302
def test_adjusted_rand_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.hydrology import (
        ARI_BLOCK_SHIFT,
        DOUBLING_ROUNDS,
        FLOW_RES,
        _base_ctes,
    )
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.synth import oracle_ctes

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"{oracle_ctes()},\n{_base_ctes(FLOW_RES)}"
        " SELECT c.v, c.cx, c.cy, p.p FROM hy_v c"
        " JOIN hy_parent p ON p.v = c.v"
    ).fetchall()
    par = {int(v): int(p) for v, _, _, p in rows}
    coords = {int(v): (int(cx), int(cy)) for v, cx, cy, _ in rows}
    cap = 1 << DOUBLING_ROUNDS

    def basin(v):
        cur = v
        for _ in range(cap):
            cur = par[cur]
        return cur

    k = 1 << ARI_BLOCK_SHIFT
    cont = defaultdict(int)
    for v, (cx, cy) in coords.items():
        cont[(basin(v), (cx // k) * _PACK + cy // k)] += 1

    def c2(x):
        return x * (x - 1) // 2

    n = sum(cont.values())
    i2 = sum(c2(x) for x in cont.values())
    ai = defaultdict(int)
    bj = defaultdict(int)
    for (a, b), x in cont.items():
        ai[a] += x
        bj[b] += x
    a2 = sum(c2(x) for x in ai.values())
    b2 = sum(c2(x) for x in bj.values())
    c2n = c2(n)
    num2 = 2 * (i2 * c2n - a2 * b2)
    den2 = (a2 + b2) * c2n - 2 * a2 * b2
    out = load_all()["adjusted_rand"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_cells), int(r.n_basins), int(r.n_blocks)) == (
        n, len(ai), len(bj),
    )
    assert (int(r.i2), int(r.a2), int(r.b2)) == (i2, a2, b2)
    assert int(r.ari_sign) == (1 if num2 > 0 else (-1 if num2 < 0 else 0))
    assert int(r.ari_abs_milli) == (1000 * abs(num2)) // abs(den2)
    # ARI is bounded above by 1 (pair-counting identity)
    assert int(r.ari_abs_milli) <= 1000 or int(r.ari_sign) < 0


# --------------------------------------------------------------------- R303
def test_rocchio_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.search import (
        MAX_DOC_FREQ,
        ROCCHIO_EXP,
        ROCCHIO_FB,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    toks = defaultdict(lambda: defaultdict(int))
    for did, text in docs:
        for t in f"{text} topic{did % 8}".split():
            if t:
                toks[int(did)][t] += 1
    n_docs = len(toks)
    dl = {d: sum(tf.values()) for d, tf in toks.items()}
    avgdl = (1000 * sum(dl.values())) // n_docs
    df = defaultdict(int)
    for tf in toks.values():
        for t in tf:
            df[t] += 1
    cap = int(np.floor(MAX_DOC_FREQ * n_docs))
    q0 = sorted(set("dup filter window join".split()))

    def score(terms):
        out = {}
        for d, tf in toks.items():
            s = m = 0
            for t in terms:
                if t in tf and df[t] <= cap:
                    m += 1
                    s += ((1000000 // df[t]) * (22 * tf[t] * avgdl)) // (
                        10 * tf[t] * avgdl + 3 * avgdl + 9000 * dl[d]
                    )
            if m:
                out[d] = (s, m)
        return out

    base = score(q0)
    fb = sorted(base, key=lambda d: (-base[d][0], d))[:ROCCHIO_FB]
    cand = defaultdict(lambda: [0, 0])
    for d in fb:
        for t, tf in toks[d].items():
            cand[t][0] += tf
            cand[t][1] += 1
    exp = sorted(
        (
            t
            for t, (tfb, fbdf) in cand.items()
            if t not in q0 and fbdf >= 2 and df[t] <= cap
        ),
        key=lambda t: (-(1000000 // df[t]) * cand[t][0], t),
    )[:ROCCHIO_EXP]
    assert exp, "pigeonhole: 10 fb docs over 8 topics must collide"
    assert all(t.startswith("topic") for t in exp)
    final = score(q0 + exp)
    want = sorted(final, key=lambda d: (-final[d][0], d))[:10]
    out = load_all()["rocchio_expand"].spark_fn(spark, SF_TINY).toPandas()
    got = out.sort_values("rank")
    assert got.doc_id.tolist() == want
    for r in got.itertuples():
        assert int(r.bm25_micro) == final[int(r.doc_id)][0]
        assert int(r.n_matched) == final[int(r.doc_id)][1]
        assert int(r.was_in_base) == (1 if int(r.doc_id) in fb else 0)
    # the expansion genuinely re-ranks: at least one newcomer
    assert (got.was_in_base == 0).any()


# --------------------------------------------------------------------- R304
def test_blob_features_on_crafted_image():
    from tree_sitter_analyzer_spark.sources.multimodal import (
        blob_features_np,
    )

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[1:3, 1:3] = 255
    px[5:7, 5:7] = 255
    n_blobs, max_blob, fg = blob_features_np(px)
    assert (n_blobs, max_blob, fg) == (2, 4, 8)
    # one L-shaped 4-connected blob
    px2 = np.zeros((8, 8, 3), dtype=np.uint8)
    px2[1, 1:5] = 255
    px2[2:5, 1] = 255
    assert blob_features_np(px2) == (1, 7, 7)


def test_blob_census_matches_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.codec import (
        decode_px,
        encode_px,
        synth_pixels,
    )
    from tree_sitter_analyzer_spark.sources.multimodal import (
        blob_features_np,
    )

    register_views(duck, SF_TINY)
    meta = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        "SELECT image_id, w, h, fmt, tile_kind FROM tiles WHERE i <= 8000"
    ).fetchall()
    want = defaultdict(lambda: [0, 0, 0, 0])
    for image_id, w, h, fmt, kind in meta:
        px = decode_px(encode_px(synth_pixels(image_id, int(w), int(h)), fmt))
        nb, mx, fg = blob_features_np(px)
        cur = want[kind]
        cur[0] += 1
        cur[1] += nb
        cur[2] = max(cur[2], mx)
        cur[3] += fg
    out = load_all()["blob_census"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(want)
    for r in out.itertuples():
        n, sb, mx, fg = want[r.tile_kind]
        assert (int(r.n_tiles), int(r.sum_blobs)) == (n, sb)
        assert (int(r.max_blob), int(r.fg_px)) == (mx, fg)
        assert int(r.blobs_per_tile_milli) == (1000 * sb) // n
        assert int(r.mean_blob_px_milli) == (1000 * fg) // sb
