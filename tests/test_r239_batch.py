"""R239-R241 batch: python replays + invariants for isotonic_calibration,
conformal_interval, did_estimator. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from fractions import Fraction

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------- R239
def _pava(pairs):
    """Textbook pool-adjacent-violators on [(n_pos, n)] bins; exact
    Fractions. Returns the fitted rate per input bin."""
    blocks = [[Fraction(p, 1), Fraction(n, 1), 1] for p, n in pairs]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
            p2, n2, c2 = out.pop()
            out[-1][0] += p2
            out[-1][1] += n2
            out[-1][2] += c2
    fit = []
    for p, n, c in out:
        fit.extend([p / n] * c)
    return fit


def test_isotonic_matches_textbook_pava(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    out = (
        load_all()["isotonic_calibration"]
        .spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("bin", ignore_index=True)
    )
    fit = _pava([(int(r.n_pos), int(r.n)) for r in out.itertuples()])
    for r, f in zip(out.itertuples(), fit):
        assert int(r.iso_pm) == (1000 * f.numerator) // f.denominator, (
            r.bin, r.iso_pm, f
        )
        assert int(r.rate_pm) == (1000 * int(r.n_pos)) // int(r.n)
    iso = out.iso_pm.tolist()
    assert iso == sorted(iso)  # monotone by construction
    assert int(out.pooled.sum()) > 0  # the raw table IS non-monotone here


# --------------------------------------------------------------------- R240
def test_conformal_interval_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o_orderpriority, o_orderkey % 3,"
        " CAST(floor(o_totalprice * 100e0) AS BIGINT) FROM orders"
    ).fetchall()
    by: dict[str, dict[int, list[int]]] = {}
    for prio, split, cents in rows:
        by.setdefault(prio, {0: [], 1: [], 2: []})[int(split)].append(
            int(cents)
        )
    out = load_all()["conformal_interval"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.priority) == set(by)
    for r in out.itertuples():
        tr, ca, te = (by[r.priority][i] for i in (0, 1, 2))
        pred = sum(tr) // len(tr)
        scores = sorted(abs(c - pred) for c in ca)
        n = len(scores)
        k = -(-(4 * (n + 1)) // 5)  # ceil(0.8*(n+1))
        q = scores[k - 1]
        cov = sum(abs(c - pred) <= q for c in te)
        assert int(r.pred_cents) == pred
        assert int(r.n_cal) == n and int(r.k) == k
        assert int(r.q_cents) == q
        assert int(r.n_test) == len(te) and int(r.n_covered) == cov
        assert int(r.coverage_milli) == (1000 * cov) // len(te)
        # the distribution-free guarantee, loosely banded on fixed data
        assert 600 <= int(r.coverage_milli) <= 1000


# --------------------------------------------------------------------- R241
def test_did_estimator_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT CAST(o_custkey % 2 = 0 AS BIGINT),"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', o_orderdate)"
        f" // {_DAY_US},"
        " CAST(floor(o_totalprice * 100e0) AS BIGINT) FROM orders"
    ).fetchall()

    def cells(pred_post, flt):
        c: dict[tuple[int, int], list[int]] = {}
        for t, d, cents in rows:
            if not flt(d):
                continue
            c.setdefault((int(t), int(pred_post(d))), [0, 0])
            c[(int(t), int(pred_post(d)))][0] += 1
            c[(int(t), int(pred_post(d)))][1] += int(cents)
        return c

    main = cells(lambda d: d >= 10408, lambda d: True)
    plc = cells(lambda d: d >= 9770, lambda d: d < 10408)

    def mean(c, t, p):
        n, s = c[(t, p)]
        return (1000 * s) // n

    effect = mean(main, 1, 1) - mean(main, 1, 0) - mean(main, 0, 1) + mean(
        main, 0, 0
    )
    placebo = mean(plc, 1, 1) - mean(plc, 1, 0) - mean(plc, 0, 1) + mean(
        plc, 0, 0
    )

    out = load_all()["did_estimator"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 4
    for r in out.itertuples():
        n, s = main[(int(r.treated), int(r.post))]
        assert int(r.n_orders) == n and int(r.sum_cents) == s
        assert int(r.mean_milli) == (1000 * s) // n
        assert int(r.effect_milli) == effect
        assert int(r.placebo_milli) == placebo
