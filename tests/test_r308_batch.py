"""R308-R310 batch: python replays + invariants for bom_rollup,
decision_stump, perceptron_train. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R308
def test_bom_rollup_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    parts = [int(p) for (p,) in duck.sql(
        "SELECT p_partkey FROM part").fetchall()]
    exp = {}
    for p in parts:
        cur, qty, depth = p, 1, 0
        while cur // 4 >= 1:
            qty *= 1 + md5int_py(f"bom_{cur}") % 3
            cur //= 4
            depth += 1
        exp[p] = (cur, qty, depth)

    out = load_all()["bom_rollup"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert (int(r.root), int(r.path_qty), int(r.depth)) == exp[int(r.part)]
    # structure is real: every root is 0-3 and some part is deep
    roots = {int(r) for r in out.root}
    assert roots <= {0, 1, 2, 3}
    assert int(out.depth.max()) >= 2
    # doubling headroom: 5 rounds cover depth 2^5, far past the replay max
    assert int(out.depth.max()) <= 32


# --------------------------------------------------------------------- R309
def test_decision_stump_recovers_planted_rule(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    hist = defaultdict(lambda: [0, 0])
    for ok, ln, q in rows:
        rule = 1 if q >= 25 else 0
        coin = md5int_py(f"st_{int(ok)}_{int(ln)}") % 20
        y = 1 - rule if coin == 0 else rule
        g = hist[int(q)]
        g[0] += 1
        g[1] += y
    tn = sum(n for n, _ in hist.values())
    tp = sum(p for _, p in hist.values())

    def gini_milli(pos: int, n: int) -> int:
        p = (1000 * pos) // n
        return (2 * p * (1000 - p)) // 1000

    cn = cp = 0
    best = None
    objs = {}
    for q in sorted(hist):
        n, p = hist[q]
        cn += n
        cp += p
        if cn >= tn:
            continue
        obj = (cn * gini_milli(cp, cn)
               + (tn - cn) * gini_milli(tp - cp, tn - cn)) // tn
        objs[q] = (obj, cn, cp, tn - cn, tp - cp)
        packed = obj * 100000 + q
        if best is None or packed < best:
            best = packed
    bq = best % 100000
    obj, nl, pl, nr, pr = objs[bq]
    imp0 = gini_milli(tp, tn)

    out = load_all()["decision_stump"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.split_q), int(r.obj_milli), int(r.imp0_milli)) == (
        bq, obj, imp0,
    )
    assert (int(r.n_left), int(r.pos_left), int(r.n_right),
            int(r.pos_right)) == (nl, pl, nr, pr)
    acc = (1000 * (max(pl, nl - pl) + max(pr, nr - pr))) // tn
    assert int(r.acc_milli) == acc
    # the stump rediscovers the planted 24/25 boundary with a big gain
    assert bq == 24
    assert int(r.gain_milli) >= 300
    # the 1-in-20 flip caps stump accuracy just below 1000
    assert 900 <= acc < 1000


# --------------------------------------------------------------------- R310
def test_perceptron_matches_python_replay_and_learns(spark, duck):
    from tree_sitter_analyzer_spark.queries_pipeline import (
        _PC_ROUNDS,
        _PC_TRUE_W,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    ids = [int(d) for (d,) in duck.sql(
        "SELECT doc_id FROM documents").fetchall()]
    data = []
    a, b, c, dd = _PC_TRUE_W
    for did in ids:
        x = [md5int_py(f"pf{i}_{did}") % 21 - 10 for i in range(1, 5)]
        m = a * x[0] + b * x[1] + c * x[2] + dd * x[3]
        if m:
            data.append((x, 1 if m > 0 else -1))
    assert data

    w = [0, 0, 0, 0]
    bias = 0
    exp = []
    for r in range(_PC_ROUNDS + 1):
        miss = g1 = g2 = g3 = g4 = gb = 0
        for x, y in data:
            if y * (sum(wi * xi for wi, xi in zip(w, x)) + bias) <= 0:
                miss += 1
                g1 += y * x[0]
                g2 += y * x[1]
                g3 += y * x[2]
                g4 += y * x[3]
                gb += y
        exp.append((r, *w, bias, miss))
        if r < _PC_ROUNDS:
            w = [w[0] + g1, w[1] + g2, w[2] + g3, w[3] + g4]
            bias += gb

    out = load_all()["perceptron_train"].spark_fn(spark, SF_TINY).toPandas()
    got = sorted(
        (int(r["round"]), int(r.w1), int(r.w2), int(r.w3), int(r.w4),
         int(r.b), int(r.n_miss))
        for _, r in out.iterrows()
    )
    assert got == exp
    # round 0 counts every zero-margin row; training reduces misses
    assert exp[0][-1] == len(data)
    assert exp[-1][-1] < len(data) // 2
    # learned direction correlates with the planted hyperplane
    wf = exp[-1][1:5]
    assert sum(wi * ti for wi, ti in zip(wf, _PC_TRUE_W)) > 0
