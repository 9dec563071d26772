"""R296-R298 batch: python replays + invariants for randomized_response,
cuped_adjust, pr_auc_eval. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R296
def test_randomized_response_matches_mechanism_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, event_id, user_id FROM events"
    ).fetchall()
    agg = {}
    for t, eid, uid in rows:
        sens = 1 if uid % 5 == 0 else 0
        keep = md5int_py(f"rr#{eid}") % 4 < 3
        rep = sens if keep else 1 - sens
        n, ty, ry = agg.get(t, (0, 0, 0))
        agg[t] = (n + 1, ty + sens, ry + rep)
    out = (
        load_all()["randomized_response"]
        .spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == len(agg)
    for r in out.itertuples():
        n, ty, ry = agg[r.event_type]
        assert (int(r.n), int(r.true_yes), int(r.rep_yes)) == (n, ty, ry)
        num = 4 * ry - n
        sign = 1 if num > 0 else (-1 if num < 0 else 0)
        assert int(r.est_sign) == sign
        assert int(r.est_abs_pm) == (1000 * abs(num)) // (2 * n)
        assert int(r.err_pm) == sign * ((1000 * abs(num)) // (2 * n)) - (
            1000 * ty
        ) // n
    # channel inversion works: estimates land near the ~200 pm truth,
    # not near the raw ~350 pm reported rate
    est = (out.est_sign * out.est_abs_pm).to_numpy()
    raw_pm = (1000 * out.rep_yes / out.n).to_numpy()
    # RR noise sd at n~200 is ~61 pm; allow ~4 sigma
    assert (abs(est - out.true_pm.to_numpy()) < 250).all()
    assert (raw_pm > out.true_pm.to_numpy() + 100).all()


# --------------------------------------------------------------------- R297
def test_cuped_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o_custkey,"
        " CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1"
        " END AS period,"
        " CAST(floor(o_totalprice) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    pre, post = {}, {}
    for c, p, d in rows:
        (pre if p == 0 else post)[c] = (pre if p == 0 else post).get(
            c, 0
        ) + int(d)
    custs = set(pre) | set(post)
    xs = {c: pre.get(c, 0) // 10000 for c in custs}
    ys = {c: post.get(c, 0) // 10000 for c in custs}
    n = len(custs)
    mx = sum(xs.values()) // n
    my = sum(ys.values()) // n
    sxx = sum((xs[c] - mx) ** 2 for c in custs)
    syy = sum((ys[c] - my) ** 2 for c in custs)
    sxy = sum((xs[c] - mx) * (ys[c] - my) for c in custs)
    out = load_all()["cuped_adjust"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n), int(r.mean_pre_dkd), int(r.mean_post_dkd)) == (
        n, mx, my,
    )
    assert (int(r.sxx), int(r.syy)) == (sxx, syy)
    assert int(r.theta_sign) == (1 if sxy > 0 else (-1 if sxy < 0 else 0))
    assert int(r.theta_abs_milli) == (1000 * abs(sxy)) // sxx
    assert int(r.var_reduction_pm) == (
        ((1000 * abs(sxy)) // sxx) * abs(sxy)
    ) // syy
    # honest null: independent synthetic periods => rho^2 ~ 0 (CUPED
    # correctly reports ~nothing to gain on a persistence-free corpus)
    assert int(r.var_reduction_pm) < 50
    assert sxx > 0 and syy > 0  # but the moments themselves are real


# --------------------------------------------------------------------- R298
def test_pr_auc_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    qs = load_all()
    # reuse the engine's own per-doc scores via the auc base: rebuild
    # from text_stats (python side reads the oracle's lab CTE)
    from tree_sitter_analyzer_spark.operators.textstats import (
        AUC_POS_QUALITY,
        quality_oracle_ctes,
    )

    lab = duck.sql(
        f"WITH {quality_oracle_ctes('t')} "
        f"SELECT CAST(q.quality >= {AUC_POS_QUALITY} AS BIGINT),"
        " (1000 * c.n_distinct_tokens) // c.n_tokens,"
        " (1000 * c.n_stop) // c.n_tokens"
        " FROM t_q q JOIN t_cnt c ON c.doc_id = q.doc_id"
    ).fetchall()

    def replay(scores):
        hist = {}
        for pos, s in scores:
            np_, nn_ = hist.get(s, (0, 0))
            hist[s] = (np_ + pos, nn_ + 1 - pos)
        ctp = cfp = 0
        prev_p = None
        s2 = 0
        for s in sorted(hist, reverse=True):
            np_, nn_ = hist[s]
            ctp += np_
            cfp += nn_
            p = (1000 * ctp) // (ctp + cfp)
            if prev_p is None:
                prev_p = p
            s2 += np_ * (p + prev_p)
            prev_p = p
        return ctp, cfp, (s2 // 2) // ctp

    div = [(int(p), int(sd)) for p, sd, _ in lab]
    stp = [(int(p), int(ss)) for p, _, ss in lab]
    out = qs["pr_auc_eval"].spark_fn(spark, SF_TINY).toPandas()
    got = {r.scorer: r for r in out.itertuples()}
    for name, scores in (("diversity", div), ("stop_density", stp)):
        npos, nneg, ap = replay(scores)
        r = got[name]
        assert (int(r.n_pos), int(r.n_neg)) == (npos, nneg)
        assert int(r.prevalence_milli) == (1000 * npos) // (npos + nneg)
        assert int(r.pr_auc_milli) == ap
    # discrimination ordering mirrors the ROC harness: diversity above
    # prevalence, stop_density below it
    assert got["diversity"].pr_auc_milli > got["diversity"].prevalence_milli
    assert (
        got["stop_density"].pr_auc_milli
        < got["stop_density"].prevalence_milli
    )
