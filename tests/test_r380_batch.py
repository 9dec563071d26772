"""R380-R382 batch: python replays + invariants for
markov_attribution, triplet_eval, learned_index_audit. The attribution
replay solves every linear system with Fractions (a different
algorithm than the generated cofactor SQL)."""

from __future__ import annotations

from fractions import Fraction

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views

STATES = ["view", "click", "signup", "error"]


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _solve(mat, rhs):
    """Exact Gaussian elimination over Fractions: solve M x = r."""
    n = len(mat)
    a = [[Fraction(v) for v in row] + [Fraction(rhs[i])]
         for i, row in enumerate(mat)]
    for c in range(n):
        p = next(r for r in range(c, n) if a[r][c] != 0)
        a[c], a[p] = a[p], a[c]
        for r in range(n):
            if r != c and a[r][c] != 0:
                f = a[r][c] / a[c][c]
                a[r] = [x - f * y for x, y in zip(a[r], a[c])]
    return [a[i][n] / a[i][i] for i in range(n)]


# --------------------------------------------------------------------- R380
def test_markov_attribution_matches_fraction_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pairs = duck.sql(
        "SELECT cur, nxt, count(*) FROM ("
        " SELECT event_type AS cur, lead(event_type) OVER ("
        " PARTITION BY user_id ORDER BY ts, event_id) AS nxt"
        " FROM events) t WHERE nxt IS NOT NULL GROUP BY 1, 2"
    ).fetchall()
    c = {(a, b): int(n) for a, b, n in pairs}
    t = {
        s: max(1, sum(n for (a, _), n in c.items() if a == s))
        for s in STATES
    }
    q = {
        (i, j): 1000 * c.get((STATES[i], STATES[j]), 0) // t[STATES[i]]
        for i in range(4) for j in range(4)
    }
    r = [1000 * c.get((s, "purchase"), 0) // t[s] for s in STATES]

    def conv(idx):
        mat = [
            [(1000 if i == j else 0) - q[(i, j)] for j in idx]
            for i in idx
        ]
        rhs = [r[i] for i in idx]
        sol = _solve(mat, rhs)
        b = sol[idx.index(0)]  # start state 'view'
        return int(1000000 * b.numerator // b.denominator) \
            if b.denominator == 1 else int((1000000 * b).__floor__()) \
            if b >= 0 else -int((-1000000 * b).__floor__())

    # the SQL computes (10^6 * adj.R) DIV det with truncation; redo that
    # exactly: b = num/det as a Fraction -> trunc(10^6 * num / det)
    def conv_trunc(idx):
        mat = [
            [(1000 if i == j else 0) - q[(i, j)] for j in idx]
            for i in idx
        ]
        rhs = [r[i] for i in idx]
        sol = _solve(mat, rhs)
        b = sol[idx.index(0)] * 1000000
        return _tdiv(b.numerator, b.denominator)

    base = conv_trunc([0, 1, 2, 3])
    expect = {"(none)": (base, 0)}
    effects = {}
    for k in (1, 2, 3):
        idx = [i for i in range(4) if i != k]
        pk = conv_trunc(idx)
        eff = max(0, 1000 - _tdiv(1000 * pk, max(base, 1)))
        expect[STATES[k]] = (pk, eff)
        effects[STATES[k]] = eff
    tot = sum(effects.values())

    out = (
        load_all()["markov_attribution"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == 4
    for row in out.itertuples():
        p, eff = expect[row.removed]
        assert int(row.p_conv_micro) == p
        assert int(row.base_micro) == base
        assert int(row.effect_milli) == eff
        share = 0 if row.removed == "(none)" or tot == 0 \
            else 1000 * eff // tot
        assert int(row.share_milli) == share
        assert int(row.det_pos) == 1
        # removing a channel can never HELP conversion
        assert p <= base


# --------------------------------------------------------------------- R381
def test_triplet_eval_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    import math

    vecs = {
        int(v): (int(lab), [math.floor(x * 1000) for x in emb])
        for v, emb, lab in [(a, c, b) for a, b, c in rows]
    }
    ids = sorted(vecs)
    by_label: dict[int, list[int]] = {}
    for v in ids:
        by_label.setdefault(vecs[v][0], []).append(v)
    stats: dict[int, list[int]] = {}
    for a in ids:
        lab, qa = vecs[a]
        same = [v for v in by_label[lab] if v != a]
        if not same:
            continue
        gt = [v for v in same if v > a]
        p = min(gt) if gt else min(same)
        diff = [v for v in ids if vecs[v][0] != lab]
        n = min(diff, key=lambda v: (md5int_py(f"trip_{a}_{v}"), v))
        qp, qn = vecs[p][1], vecs[n][1]
        d2p = sum((x - y) ** 2 for x, y in zip(qa, qp))
        d2n = sum((x - y) ** 2 for x, y in zip(qa, qn))
        st = stats.setdefault(lab, [0, 0, 0])
        st[0] += 1
        st[1] += 1 if d2p >= d2n else 0
        st[2] += d2n - d2p

    out = load_all()["triplet_eval"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(stats)
    for row in out.itertuples():
        na, nv, marg = stats[int(row.label)]
        assert int(row.n_anchors) == na
        assert int(row.n_violations) == nv
        assert int(row.violation_milli) == 1000 * nv // na
        assert int(row.mean_margin) == _tdiv(marg, na)
    # the synthetic labels carry no geometric structure, so the honest
    # corpus-wide reading is chance-level — pin non-degeneracy (not all
    # violations, not none), which is what makes the 50% readout
    # trustworthy rather than vacuous
    tot_a = sum(s[0] for s in stats.values())
    tot_v = sum(s[1] for s in stats.values())
    assert 0 < tot_v < tot_a


# --------------------------------------------------------------------- R382
def test_learned_index_audit_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT CAST(floor(o_totalprice * 100e0) AS BIGINT) // 100000,"
        " count(*) FROM orders GROUP BY 1"
    ).fetchall()
    hist = {int(b): int(n) for b, n in rows}
    total = sum(hist.values())
    shard_bins: dict[int, list[tuple[int, int]]] = {}
    cum = 0
    for b in sorted(hist):
        pos = 1000000 * cum // total
        sh = min(15, 16 * cum // total)
        shard_bins.setdefault(sh, []).append((b, pos))
        cum += hist[b]

    out = (
        load_all()["learned_index_audit"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == len(
        [s for s, bl in shard_bins.items()
         if len(bl) * sum(x * x for x, _ in bl)
         - sum(x for x, _ in bl) ** 2 > 0]
    )
    for row in out.itertuples():
        bl = shard_bins[int(row.shard)]
        nb = len(bl)
        sx = sum(x for x, _ in bl)
        sxx = sum(x * x for x, _ in bl)
        sy = sum(y for _, y in bl)
        sxy = sum(x * y for x, y in bl)
        den = nb * sxx - sx * sx
        bnum, anum = nb * sxy - sx * sy, sy * sxx - sx * sxy
        maxr = max(abs(anum + bnum * x - y * den) for x, y in bl)
        assert int(row.n_bins) == nb
        assert int(row.lo_ppm) == min(y for _, y in bl)
        assert int(row.hi_ppm) == max(y for _, y in bl)
        assert int(row.slope_micro) == _tdiv(1000000 * bnum, den)
        assert int(row.max_err_ppm) == maxr // den
        span = max(int(row.hi_ppm) - int(row.lo_ppm), 1)
        assert int(row.err_vs_span_milli) == 1000 * (maxr // den) // span
        # a linear model inside a range shard beats scanning the shard:
        # the residual window is a strict sub-span
        assert int(row.max_err_ppm) < max(span, 1) or span == 1
