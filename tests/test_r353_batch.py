"""R353-R355 batch: python replays + invariants for als_halfstep,
rdd_estimate, conformance_replay. Oracle parity rides
test_oracle_parity; these tests recompute every output from the raw
parquet with an INDEPENDENT python implementation (md5int_py factors,
Fraction exact minimizers, list-sort trace replay) and pin the theory:
the exact ridge minimizer never loses to the zero factor, the RDD
design frames are the declared bandwidths, and conformance fitness is
the allowed-mass ratio."""

from __future__ import annotations

from fractions import Fraction

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV == DuckDB int //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _clamp(v: int, m: int = 200000) -> int:
    return max(-m, min(m, v))


# --------------------------------------------------------------------- R353
def test_als_halfstep_matches_fraction_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import _ALS_LAM
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    ratings = duck.sql(
        "SELECT o.o_custkey, l.l_partkey,"
        " LEAST(CAST(floor(sum(l.l_quantity)) AS BIGINT), 100)"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " GROUP BY 1, 2"
    ).fetchall()
    users: dict[int, dict[str, int]] = {}
    for cust, item, r in ratings:
        q1 = md5int_py(f"alsq1_{item}") % 7 - 3
        q2 = md5int_py(f"alsq2_{item}") % 7 - 3
        u = users.setdefault(
            int(cust),
            dict(n=0, s11=0, s22=0, s12=0, b1=0, b2=0, sse0=0),
        )
        u["n"] += 1
        u["s11"] += q1 * q1
        u["s22"] += q2 * q2
        u["s12"] += q1 * q2
        u["b1"] += q1 * int(r)
        u["b2"] += q2 * int(r)
        u["sse0"] += int(r) * int(r)

    out = load_all()["als_halfstep"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(users)
    lam = _ALS_LAM
    for row in out.itertuples():
        u = users[int(row.cust)]
        det = (u["s11"] + lam) * (u["s22"] + lam) - u["s12"] ** 2
        assert det > 0  # lambda > 0 makes the normal matrix pos-def
        x1 = _clamp(
            _tdiv(1000 * (u["b1"] * (u["s22"] + lam) - u["s12"] * u["b2"]), det)
        )
        x2 = _clamp(
            _tdiv(1000 * ((u["s11"] + lam) * u["b2"] - u["s12"] * u["b1"]), det)
        )
        fit = (
            1000000 * u["sse0"]
            + x1 * x1 * u["s11"] + x2 * x2 * u["s22"]
            + 2 * x1 * x2 * u["s12"]
            - 2000 * (x1 * u["b1"] + x2 * u["b2"])
        )
        assert (
            int(row.n_items), int(row.det), int(row.x1_milli),
            int(row.x2_milli), int(row.sse0), int(row.fit_scaled),
        ) == (u["n"], det, x1, x2, u["sse0"], fit)
        # Ridge-dominance theorem at the EXACT minimizer (Fraction): the
        # full objective fit + lam*|x|^2 at x* never exceeds its value at
        # x = 0 (which is sse0). The quantized milli factors only move the
        # objective by the quantization gap, so this is checked exactly on
        # the unquantized solution.
        fx1 = Fraction(u["b1"] * (u["s22"] + lam) - u["s12"] * u["b2"], det)
        fx2 = Fraction((u["s11"] + lam) * u["b2"] - u["s12"] * u["b1"], det)
        obj = (
            Fraction(u["sse0"])
            + fx1 * fx1 * u["s11"] + fx2 * fx2 * u["s22"]
            + 2 * fx1 * fx2 * u["s12"]
            - 2 * (fx1 * u["b1"] + fx2 * u["b2"])
            + lam * (fx1 * fx1 + fx2 * fx2)
        )
        assert obj <= u["sse0"]


# --------------------------------------------------------------------- R354
def test_rdd_estimate_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import (
        _RDD_CUT, _RDD_JUMP, _RDD_PLACEBO,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    daily = dict(
        duck.sql(
            "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
            " CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount))"
            " AS BIGINT)) // 1000 AS BIGINT)"
            " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
        ).fetchall()
    )
    y = {
        d: int(daily.get(d, 0)) + (_RDD_JUMP if d >= _RDD_CUT else 0)
        for d in range(123, 243)
    }

    def fit(lo: int, hi: int, cut: int) -> tuple[int, int, int]:
        ds = range(lo, hi + 1)
        n = len(ds)
        st = sum(d - cut for d in ds)
        st2 = sum((d - cut) ** 2 for d in ds)
        sy = sum(y[d] for d in ds)
        sty = sum((d - cut) * y[d] for d in ds)
        den = n * st2 - st * st
        return (
            _tdiv(1000 * (sy * st2 - st * sty), den),
            _tdiv(1000 * (n * sty - st * sy), den),
            n,
        )

    al, bl, nl = fit(123, _RDD_CUT - 1, _RDD_CUT)
    ar, br, nr = fit(_RDD_CUT, 242, _RDD_CUT)
    pl, _, _ = fit(123, _RDD_PLACEBO - 1, _RDD_PLACEBO)
    pr, _, _ = fit(_RDD_PLACEBO, _RDD_CUT - 1, _RDD_PLACEBO)

    out = load_all()["rdd_estimate"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_l), int(r.n_r)) == (nl, nr) == (60, 60)
    assert (int(r.a_left_milli), int(r.a_right_milli)) == (al, ar)
    assert (int(r.slope_left_milli), int(r.slope_right_milli)) == (bl, br)
    assert int(r.tau_milli) == ar - al
    assert int(r.placebo_milli) == pr - pl
    assert int(r.jump_milli) == 1000 * _RDD_JUMP
    # the planted jump is part of what tau measures: removing it from the
    # right-side intercept must shrink the absolute estimate.
    assert abs((ar - 1000 * _RDD_JUMP) - al) < abs(ar - al)


# --------------------------------------------------------------------- R355
def test_conformance_replay_matches_trace_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import _CF_ALLOWED
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT user_id,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        " // 86400000000 AS day, ts, event_id, event_type"
        " FROM events ORDER BY user_id, day, ts, event_id"
    ).fetchall()
    allowed = {a.strip("'") for a in _CF_ALLOWED}
    traces: dict[tuple[int, int], list[str]] = {}
    for uid, day, _, _, et in rows:
        traces.setdefault((int(uid), int(day)), []).append(et)
    pairs: dict[tuple[str, str], int] = {}
    for seq in traces.values():
        for cur, nxt in zip(seq, seq[1:]):
            pairs[(cur, nxt)] = pairs.get((cur, nxt), 0) + 1
    n_total = sum(pairs.values())
    ok_mass = sum(
        n for (c, x), n in pairs.items() if f"{c}>{x}" in allowed
    )
    fitness = _tdiv(1000 * ok_mass, n_total)

    out = (
        load_all()["conformance_replay"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == len(pairs)
    for row in out.itertuples():
        key = (row.cur, row.nxt)
        assert int(row.n_obs) == pairs[key]
        assert int(row.allowed) == (1 if f"{row.cur}>{row.nxt}" in allowed else 0)
        assert int(row.share_milli) == _tdiv(1000 * pairs[key], n_total)
        assert int(row.n_total) == n_total
        assert int(row.fitness_milli) == fitness
    # the declared model is a strict subset of what the uniform synthetic
    # traces do, so fitness is a proper fraction (not vacuously 0 or 1000)
    assert 0 < fitness < 1000
