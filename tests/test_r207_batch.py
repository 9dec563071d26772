"""R207-R209 batch: python replays + invariants for matrix_profile_daily,
trend_mk, kaplan_meier. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from fractions import Fraction

from .conftest import SF_TINY, register_views

_DAY_US = 86400000000


def _daily(duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" o_orderdate) // {_DAY_US} AS day,"
        " CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)"
        " FROM orders GROUP BY 1"
    ).fetchall()
    h = {int(d): int(v) for d, v in rows}
    d0, d1 = min(h), max(h)
    return [h.get(d, 0) for d in range(d0, d1 + 1)], d0


# --------------------------------------------------------------------- R207
def test_matrix_profile_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    v, d0 = _daily(duck)
    m, excl = 7, 4
    nw = len(v) - m + 1
    wins = [v[i : i + m] for i in range(nw)]
    prof: dict[int, tuple[int, int]] = {}
    for i in range(nw):
        best = None
        for j in range(nw):
            if abs(i - j) < excl:
                continue
            d = sum((wins[i][k] - wins[j][k]) ** 2 for k in range(m))
            if best is None or d < best[0] or (d == best[0] and j < best[1]):
                best = (d, j)
        prof[i] = best
    discords = sorted(prof, key=lambda i: (-prof[i][0], i))[:5]
    motifs = sorted(prof, key=lambda i: (prof[i][0], i))[:5]

    out = load_all()["matrix_profile_daily"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (r.kind, int(r.rank)): (int(r.day), int(r.nn_day), int(r.dist))
        for r in out.itertuples()
    }
    for rank, i in enumerate(discords, 1):
        d, j = prof[i]
        assert got[("discord", rank)] == (d0 + i, d0 + j, d)
    for rank, i in enumerate(motifs, 1):
        d, j = prof[i]
        assert got[("motif", rank)] == (d0 + i, d0 + j, d)
    # exclusion-zone invariant on every emitted row
    for r in out.itertuples():
        assert abs(int(r.day) - int(r.nn_day)) >= excl
        assert int(r.dist) >= 0


# --------------------------------------------------------------------- R208
def test_trend_mk_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    v, _ = _daily(duck)
    n = len(v)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += (v[j] > v[i]) - (v[j] < v[i])
            num = 1000 * (v[j] - v[i])
            den = j - i
            slopes.append(num // den)  # python floor div == SQL floor()
    tie: dict[int, int] = {}
    for x in v:
        tie[x] = tie.get(x, 0) + 1
    tsum = sum(t * (t - 1) * (2 * t + 5) for t in tie.values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tsum
    slopes.sort()
    tot = len(slopes)
    cum = 0
    sen = None
    seen = sorted(set(slopes))
    idx = 0
    counts = {}
    for x in slopes:
        counts[x] = counts.get(x, 0) + 1
    for x in seen:
        cum += counts[x]
        if 2 * cum >= tot:
            sen = x
            break
    zsq_num = 180000 * max(abs(s) - 1, 0) ** 2
    reject = 1 if zsq_num > 38416 * var18 else 0

    row = load_all()["trend_mk"].spark_fn(spark, SF_TINY).toPandas().iloc[0]
    assert int(row.n_days) == n
    assert int(row.s_stat) == s
    assert int(row.var18) == var18
    assert int(row.sen_slope_milli) == sen
    assert int(row.reject05) == reject
    want_verdict = (
        "no-trend" if not reject else ("increasing" if s > 0 else "decreasing")
    )
    assert row.verdict == want_verdict


# --------------------------------------------------------------------- R209
def test_kaplan_meier_matches_exact_rational_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    obs = duck.sql("""
WITH fv AS (SELECT user_id, min(ts) AS fv FROM events
            WHERE event_type = 'view' GROUP BY 1),
e AS (SELECT max(ts) AS tend FROM events),
fp AS (SELECT ev.user_id, min(ev.ts) AS fp FROM events ev
       JOIN fv ON fv.user_id = ev.user_id AND ev.ts > fv.fv
       WHERE ev.event_type = 'purchase' GROUP BY 1)
SELECT date_diff('microsecond', fv.fv, fp.fp) // 3600000000,
       date_diff('microsecond', fv.fv, e.tend) // 3600000000
FROM fv CROSS JOIN e LEFT JOIN fp ON fp.user_id = fv.user_id
""").fetchall()
    hist: dict[int, list[int]] = {}
    for raw, span in obs:
        event = raw is not None and raw <= 120 and raw <= span
        t = int(raw) if event else min(120, int(span))
        d, c = hist.setdefault(t, [0, 0])
        hist[t][0 if event else 1] += 1
    total = sum(d + c for d, c in hist.values())

    out = (
        load_all()["kaplan_meier"].spark_fn(spark, SF_TINY)
        .toPandas().sort_values("t").reset_index(drop=True)
    )
    assert len(out) == len(hist)
    s_exact = Fraction(1)
    na_exact = 0
    at_risk = total
    prev_s = 10**6
    for r in out.itertuples():
        t = int(r.t)
        d, c = hist[t]
        assert (int(r.n_risk), int(r.d_events), int(r.c_censored)) == (
            at_risk, d, c,
        )
        s_exact *= Fraction(at_risk - d, at_risk)
        na_exact += (1000000 * d) // at_risk
        # NA is integer-exact; KM's float fold may sit 1 micro off the
        # exact rational floor at worst
        assert int(r.na_micro) == na_exact
        want = (s_exact.numerator * 10**6) // s_exact.denominator
        assert abs(int(r.s_micro) - want) <= 1
        assert int(r.s_micro) <= prev_s  # survival is non-increasing
        prev_s = int(r.s_micro)
        at_risk -= d + c
    assert at_risk == 0  # bookkeeping closes
