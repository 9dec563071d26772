"""R272-R274 batch: python replays + invariants for resolution_loss,
simpson_paradox, arc_elasticity. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R272
def test_resolution_loss_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    cells = Counter(
        duck.sql(
            f"WITH tiles AS ({synth.tiles_sql()}) "
            f"SELECT {ix_sql('lon', 9)}, {iy_sql('lat', 9)} FROM tiles"
        ).fetchall()
    )
    n_cells = len(cells)
    mu = sum(cells.values()) // n_cells
    sse0 = sum((n - mu) ** 2 for n in cells.values())

    out = (
        load_all()["resolution_loss"].spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("res")
        .reset_index(drop=True)
    )
    assert list(out.res) == [6, 7, 8]
    retained = {}
    for r in out.itertuples():
        res = int(r.res)
        shift = 1 << (9 - res)
        groups: dict[tuple, list[int]] = defaultdict(list)
        for (ix, iy), n in cells.items():
            groups[(ix // shift, iy // shift)].append(n)
        sse = sum(
            (n - sum(v) // len(v)) ** 2 for v in groups.values() for n in v
        )
        assert int(r.n_parents) == len(groups)
        assert int(r.n_cells) == n_cells
        assert int(r.sse) == sse
        assert int(r.retained_milli) == 1000 - (1000 * sse) // sse0
        retained[res] = int(r.retained_milli)
    # finer parents retain MORE of the variance — the MAUP monotone
    assert retained[8] >= retained[7] >= retained[6]
    assert retained[8] > 0


# --------------------------------------------------------------------- R273
def test_simpson_paradox_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag,"
        " CAST(floor(l_discount * 1000e0) AS BIGINT),"
        " CAST(floor(l_quantity + 0.5e0) AS BIGINT) FROM lineitem"
    ).fetchall()
    groups: dict[str, list] = defaultdict(list)
    for flag, x, y in rows:
        groups[flag].append((x, y))
        groups["_pooled"].append((x, y))

    out = load_all()["simpson_paradox"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.flag) == set(groups)
    for r in out.itertuples():
        pts = groups[r.flag]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        num = n * sxy - sx * sy
        assert int(r.n) == n
        assert int(r.cov_sign) == (1 if num > 0 else (-1 if num < 0 else 0))
        assert int(r.mean_x_milli) == (1000 * sx) // n
        assert int(r.mean_y_milli) == (1000 * sy) // n
    # non-degenerate: covariance signs are not all zero
    assert (out.cov_sign != 0).any()


# --------------------------------------------------------------------- R274
def test_arc_elasticity_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT CAST(floor(l_discount * 100e0) AS BIGINT),"
        " CAST(floor(l_extendedprice * (1e0 - l_discount) * 100e0)"
        " AS BIGINT),"
        " CAST(floor(l_quantity + 0.5e0) AS BIGINT) FROM lineitem"
    ).fetchall()
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for d, c, q in rows:
        a = agg[d]
        a[0] += 1
        a[1] += c
        a[2] += q
    m = {
        d: ((1000 * c) // n, (1000 * q) // n)
        for d, (n, c, q) in agg.items()
    }

    out = (
        load_all()["arc_elasticity"].spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("d1")
        .reset_index(drop=True)
    )
    assert list(out.d1) == sorted(d for d in m if d + 1 in m)
    for r in out.itertuples():
        p1, q1 = m[int(r.d1)]
        p2, q2 = m[int(r.d2)]
        assert (int(r.p1_milli), int(r.q1_milli)) == (p1, q1)
        assert (int(r.p2_milli), int(r.q2_milli)) == (p2, q2)
        num = (q2 - q1) * (p2 - p1)
        assert int(r.eps_sign) == (1 if num > 0 else (-1 if num < 0 else 0))
        assert int(r.eps_abs_milli) == (
            1000 * abs(q2 - q1) * (p2 + p1)
        ) // (abs(p2 - p1) * (q2 + q1))
        assert int(r.n_rows) == agg[int(r.d1)][0] + agg[int(r.d2)][0]
    # synthetic base prices are independent of discount, so per-bucket
    # mean net prices need NOT be monotone — pin only the structural
    # facts: all 10 adjacent ladder rows exist and signs are in range
    assert len(out) == 10
    assert set(out.eps_sign).issubset({-1, 0, 1})
