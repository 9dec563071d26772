"""R329-R331 batch: python replays + invariants for pca_power,
ridge_2f, littles_law. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R329
def test_pca_power_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.similarity import (
        PCA_DIM, QUANT,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    vecs = duck.sql(
        f"SELECT list_transform(embedding, x -> GREATEST(LEAST("
        f"CAST(floor(x * {QUANT}e0) AS BIGINT), {QUANT}), -{QUANT}))"
        " FROM embeddings"
    ).fetchall()
    qs = [[int(x) for x in row[0]] for row in vecs]
    assert all(len(q) == PCA_DIM for q in qs)

    s = [[0] * PCA_DIM for _ in range(PCA_DIM)]
    for q in qs:
        for j in range(PCA_DIM):
            qj = q[j]
            if qj:
                row = s[j]
                for k in range(PCA_DIM):
                    row[k] += qj * q[k]
    smax = max(max(abs(x) for x in row) for row in s) or 1

    def norm(x, mx):
        return (1000 * x) // mx if x >= 0 else -((1000 * (-x)) // mx)

    spm = [[norm(x, smax) for x in row] for row in s]
    v = [1000] * PCA_DIM
    iters = []
    for _ in range(3):
        w = [sum(spm[j][k] * v[k] for k in range(PCA_DIM))
             for j in range(PCA_DIM)]
        wmax = max(max(abs(x) for x in w), 1)
        v = [norm(x, wmax) for x in w]
        iters.append(list(v))

    out = load_all()["pca_power"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == PCA_DIM
    for r in out.itertuples():
        j = int(r.j)
        assert (int(r.v1), int(r.v2), int(r.v3)) == (
            iters[0][j], iters[1][j], iters[2][j])
    # each iterate is exactly per-mille normalized
    for it in iters:
        assert max(abs(x) for x in it) == 1000
    # successive iterates align (power iteration converges in
    # direction): positive inner product between v2 and v3
    assert sum(a * b for a, b in zip(iters[1], iters[2])) > 0
    # the matrix is symmetric by construction
    for j in range(PCA_DIM):
        for k in range(j):
            assert s[j][k] == s[k][j]


# --------------------------------------------------------------------- R330
def test_ridge_2f_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import _RIDGE_L
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)), count(*),"
        " sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
        " AS BIGINT)),"
        " sum(CAST(floor(l_discount * 100e0) AS BIGINT))"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall()
    rmax = max(max(int(r[2]) for r in rows), 1)
    nmax = max(max(int(r[1]) for r in rows), 1)
    obs = [((100 * int(rev)) // rmax, (100 * int(n)) // nmax,
            int(sd) // int(n)) for _, n, rev, sd in rows]
    nd = len(obs)
    my = sum(y for y, _, _ in obs) // nd
    m1 = sum(x for _, x, _ in obs) // nd
    m2 = sum(x for _, _, x in obs) // nd
    a11 = sum((x1 - m1) ** 2 for _, x1, _ in obs) + _RIDGE_L
    a12 = sum((x1 - m1) * (x2 - m2) for _, x1, x2 in obs)
    a22 = sum((x2 - m2) ** 2 for _, _, x2 in obs) + _RIDGE_L
    b1 = sum((x1 - m1) * (y - my) for y, x1, _ in obs)
    b2 = sum((x2 - m2) * (y - my) for y, _, x2 in obs)
    det = a11 * a22 - a12 * a12
    n1, n2 = b1 * a22 - b2 * a12, a11 * b2 - a12 * b1

    out = load_all()["ridge_2f"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_days), int(r.a11), int(r.a12), int(r.a22),
            int(r.b1), int(r.b2), int(r.det)) == (
        nd, a11, a12, a22, b1, b2, det)
    assert int(r.w1_abs_milli) == (1000 * abs(n1)) // det
    assert int(r.w2_abs_milli) == (1000 * abs(n2)) // det
    sgn = lambda x: 1 if x > 0 else (-1 if x < 0 else 0)  # noqa: E731
    assert int(r.w1_sign) == sgn(n1) and int(r.w2_sign) == sgn(n2)
    # ridge regularization makes the system provably invertible
    assert det >= _RIDGE_L * (a11 - _RIDGE_L + a22 - _RIDGE_L + _RIDGE_L)
    assert det > 0
    # sanity: volume predicts revenue positively (planted correlation
    # of daily totals with daily counts)
    assert sgn(n1) == 1


# --------------------------------------------------------------------- R331
def test_littles_law_exact_identity(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(o.o_orderdate AS DATE)),"
        " LEAST(CAST(date_diff('day', DATE '1996-01-01',"
        " CAST(max(l.l_shipdate) AS DATE)) AS BIGINT) + 1, 366)"
        " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " WHERE year(o.o_orderdate) = 1996 GROUP BY o.o_orderkey, 1"
    ).fetchall()
    ivs = [(int(s), max(int(e), int(s))) for s, e in rows]
    n = len(ivs)
    od = sum(e - s + 1 for s, e in ivs)
    conc = defaultdict(int)
    for s, e in ivs:
        conc[s] += 1
        conc[e + 1] -= 1
    running, sweep, peak = 0, 0, 0
    for d in range(1, 367):
        running += conc.get(d, 0)
        sweep += running
        peak = max(peak, running)

    out = load_all()["littles_law"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_orders), int(r.od_direct), int(r.od_sweep),
            int(r.peak_open)) == (n, od, sweep, peak)
    # Little's law in integer form: both counting methods agree
    assert int(r.exact_match) == 1 and od == sweep
    assert int(r.l_milli) == (1000 * od) // 366
    assert int(r.w_milli) == (1000 * od) // n
    assert int(r.lambda_milli) == (1000 * n) // 366
    # L >= lambda (every order is in system at least one day)
    assert int(r.l_milli) >= int(r.lambda_milli)
