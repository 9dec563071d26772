"""R180-R183 batch: python replays + invariants for auc_eval,
hausdorff_pairs, priority_sample, kmv_set_ops. Oracle parity rides
test_oracle_parity; these pin the math against independent references.
"""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R180
def _auc_py(pairs: list[tuple[int, int]]) -> tuple[int, int, int]:
    """(n_pos, n_neg, auc_pm) from (pos, score) rows — midrank AUC via
    the score histogram, mirroring neither engine (plain python)."""
    hist: dict[int, list[int]] = {}
    for pos, s in pairs:
        np_nn = hist.setdefault(s, [0, 0])
        np_nn[0 if pos else 1] += 1
    cumneg, num2, n_pos, n_neg = 0, 0, 0, 0
    for s in sorted(hist):
        np_s, nn_s = hist[s]
        num2 += np_s * (2 * cumneg + nn_s)
        cumneg += nn_s
        n_pos += np_s
        n_neg += nn_s
    return n_pos, n_neg, (1000 * num2) // (2 * n_pos * n_neg)


def test_auc_matches_python_replay_and_brackets_chance(spark):
    from tree_sitter_analyzer_spark.operators.textstats import (
        AUC_POS_QUALITY, auc_eval, text_stats,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    base = text_stats(docs).toPandas()
    want = {}
    for scorer, expr in (
        ("diversity", lambda r: (1000 * r.n_distinct_tokens) // r.n_tokens),
        ("stop_density", lambda r: (1000 * r.n_stop) // r.n_tokens),
    ):
        pairs = [
            (int(r.quality >= AUC_POS_QUALITY), int(expr(r)))
            for r in base.itertuples()
        ]
        want[scorer] = _auc_py(pairs)

    got = {
        r.scorer: (int(r.n_pos), int(r.n_neg), int(r.auc_pm))
        for r in auc_eval(docs).toPandas().itertuples()
    }
    assert got == want
    # both sides of chance exercised, and the label split is balanced
    assert got["diversity"][2] > 500 > got["stop_density"][2]
    n_pos, n_neg, _ = got["diversity"]
    assert min(n_pos, n_neg) * 5 >= max(n_pos, n_neg) // 5


def test_auc_reversal_identity(spark):
    """AUC(score) + AUC(-score) == 1000 in exact rationals; the two
    integer floors differ from 1000 by at most 1."""
    from pyspark.sql import functions as F

    from tree_sitter_analyzer_spark.operators.textstats import (
        AUC_POS_QUALITY, text_stats,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    base = text_stats(docs).toPandas()
    fwd = [
        (int(r.quality >= AUC_POS_QUALITY),
         int((1000 * r.n_distinct_tokens) // r.n_tokens))
        for r in base.itertuples()
    ]
    rev = [(p, -s) for p, s in fwd]
    a1, a2 = _auc_py(fwd)[2], _auc_py(rev)[2]
    assert 999 <= a1 + a2 <= 1000
    _ = F  # spark fixture keeps the session warm for the next test


# --------------------------------------------------------------------- R181
def test_hausdorff_matches_python_replay(spark):
    from tree_sitter_analyzer_spark.operators import trajectory as traj

    pings = traj.pings_df(spark, SF_TINY)
    pts = {
        u: [(int(r.ix), int(r.iy)) for r in grp.itertuples()]
        for u, grp in traj._haus_pts(pings)
        .toPandas()
        .groupby("user_id")
    }
    cand = traj.traj_jaccard(pings).toPandas()
    got = {
        (int(r.user_a), int(r.user_b)): (int(r.h_ab), int(r.h_ba),
                                         int(r.h_sym))
        for r in traj.hausdorff_pairs(pings).toPandas().itertuples()
    }

    def directed(src, dst):
        return max(
            min(max(abs(ax - bx), abs(ay - by)) for bx, by in dst)
            for ax, ay in src
        )

    want = {}
    for r in cand.itertuples():
        a, b = int(r.user_a), int(r.user_b)
        if a in pts and b in pts:
            h_ab = directed(pts[a], pts[b])
            h_ba = directed(pts[b], pts[a])
            want[(a, b)] = (h_ab, h_ba, max(h_ab, h_ba))
    assert got == want
    assert len(got) > 0


# --------------------------------------------------------------------- R182
def test_priority_sample_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.packing import (
        PRIO_K, PRIO_R, priority_sample_audit,
    )

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT doc_id, source, n_chars FROM documents"
    ).fetchall()
    keyed = [
        (doc_id, source, int(w),
         int(w) * PRIO_R // ((md5int_py(str(doc_id)) % PRIO_R) + 1))
        for doc_id, source, w in rows
    ]
    ranked = sorted(keyed, key=lambda r: (-r[3], -r[0]))
    tau = ranked[PRIO_K][3]
    est: dict[str, list[int]] = {}
    for _, source, w, _q in ranked[:PRIO_K]:
        e = est.setdefault(source, [0, 0])
        e[0] += 1
        e[1] += max(w, tau)
    want = {}
    for source in {r[1] for r in keyed}:
        n_docs = sum(1 for r in keyed if r[1] == source)
        exact = sum(r[2] for r in keyed if r[1] == source)
        n_s, e_s = est.get(source, (0, 0))
        want[source] = (n_docs, n_s, exact, e_s,
                        1000 * abs(e_s - exact) // exact)

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = {
        r.source: (int(r.n_docs), int(r.n_sampled), int(r.exact_chars),
                   int(r.est_chars), int(r.err_pm))
        for r in priority_sample_audit(docs).toPandas().itertuples()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) == PRIO_K


def test_priority_sample_is_repartition_invariant(spark):
    from tree_sitter_analyzer_spark.operators.packing import (
        priority_sample_audit,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    key = lambda df: {
        r.source: (int(r.n_sampled), int(r.est_chars))
        for r in df.itertuples()
    }
    a = key(priority_sample_audit(docs.repartition(1)).toPandas())
    b = key(priority_sample_audit(docs.repartition(13)).toPandas())
    assert a == b


# --------------------------------------------------------------------- R183
def test_kmv_setops_membership_lemma_and_replay(spark, duck):
    """The containment lemma the estimator rests on: every union-sample
    hash's membership decided from the k-arrays equals membership in the
    FULL set — then the whole operator vs a python replay."""
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.sketch import (
        KMV_K, KMV_R, kmv_set_ops,
    )
    from tree_sitter_analyzer_spark import grid

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"{synth.oracle_ctes()} SELECT tile_kind, "
        f"{grid.cell_sql('lon', 'lat', 9)} AS cell FROM tiles"
    ).fetchall()
    cells: dict[str, set] = {}
    for kind, cell in rows:
        cells.setdefault(kind, set()).add(cell)
    hashes = {
        k: {(md5int_py(str(c)) % KMV_R) + 1 for c in v}
        for k, v in cells.items()
    }
    bk = {k: sorted(v)[:KMV_K] for k, v in hashes.items()}

    want = {}
    for ka in sorted(cells):
        for kb in sorted(cells):
            if ka >= kb:
                continue
            u = sorted(set(bk[ka]) | set(bk[kb]))[:KMV_K]
            for h in u:  # the lemma, hash by hash
                assert (h in set(bk[ka])) == (h in hashes[ka])
                assert (h in set(bk[kb])) == (h in hashes[kb])
            k_inter = sum(
                1 for h in u if h in hashes[ka] and h in hashes[kb]
            )
            kp = len(u)
            union_est = (
                kp if kp < KMV_K else (KMV_K - 1) * KMV_R // u[KMV_K - 1]
            )
            inter = len(cells[ka] & cells[kb])
            union = len(cells[ka] | cells[kb])
            want[(ka, kb)] = (
                inter,
                k_inter * union_est // kp,
                1000 * inter // union,
                1000 * k_inter // kp,
            )

    got = {
        (r.kind_a, r.kind_b): (int(r.inter_exact), int(r.inter_est),
                               int(r.jac_pm_exact), int(r.jac_pm_est))
        for r in kmv_set_ops(synth.tiles_df(spark, SF_TINY))
        .toPandas()
        .itertuples()
    }
    assert got == want
