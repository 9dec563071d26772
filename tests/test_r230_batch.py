"""R230-R232 batch: python replays + invariants for wasserstein_drift,
mcnemar_test, jenks_breaks. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R230
def test_wasserstein_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT source, n_chars FROM documents"
    ).fetchall()
    per_src: dict[str, list[int]] = {}
    for s, v in rows:
        per_src.setdefault(s, []).append(int(v))
    all_v = sorted({int(v) for _, v in rows})
    n = len(rows)
    expect = {}
    for s, vs in per_src.items():
        ns = len(vs)
        num = 0
        cs = ct = 0
        hist_s: dict[int, int] = {}
        for v in vs:
            hist_s[v] = hist_s.get(v, 0) + 1
        hist_t: dict[int, int] = {}
        for _, v in rows:
            hist_t[int(v)] = hist_t.get(int(v), 0) + 1
        for i, v in enumerate(all_v[:-1]):
            cs += hist_s.get(v, 0)
            ct += hist_t[v]
            num += abs(cs * n - ct * ns) * (all_v[i + 1] - v)
        expect[s] = (ns, (1000 * num) // (ns * n))

    out = load_all()["wasserstein_drift"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(per_src)
    got = {r.source: (int(r.n_docs), int(r.w1_millichars)) for r in out.itertuples()}
    assert got == expect
    # rnk is dense 1..K ordered by (w1 desc, source asc)
    ranked = sorted(expect, key=lambda s: (-expect[s][1], s))
    by_rank = {int(r.rnk): r.source for r in out.itertuples()}
    assert [by_rank[i + 1] for i in range(len(ranked))] == ranked


# --------------------------------------------------------------------- R231
def test_mcnemar_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.textstats import (
        LANG_MARKERS,
        STOPWORDS,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql("SELECT lang, text FROM documents").fetchall()
    markers = set(LANG_MARKERS["en"])
    stops = set(STOPWORDS)
    n_total = br = bw = ao = bo = 0
    for lang, text in rows:
        ws = [w for w in text.split(" ") if w != ""]
        ev_en = sum(1 for w in ws if w in markers)
        n_stop = sum(1 for w in ws if w in stops)
        truth = 1 if lang == "en" else 0
        a_ok = 1 if (1 if ev_en > 0 else 0) == truth else 0
        b_ok = 1 if (1 if 10 * n_stop >= len(ws) else 0) == truth else 0
        n_total += 1
        br += a_ok * b_ok
        bw += (1 - a_ok) * (1 - b_ok)
        ao += a_ok * (1 - b_ok)
        bo += (1 - a_ok) * b_ok

    out = load_all()["mcnemar_test"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (
        int(r.n_total), int(r.both_right), int(r.both_wrong),
        int(r.a_only), int(r.b_only),
    ) == (n_total, br, bw, ao, bo)
    d = max(abs(ao - bo) - 1, 0)
    chi2 = 0 if ao + bo == 0 else (1000 * d * d) // (ao + bo)
    assert int(r.chi2_milli) == chi2
    assert int(r.reject05) == int(1000000 * d * d > 3841459 * (ao + bo))
    # the paired design must not be degenerate (the zero-discordance trap)
    assert ao + bo > 0


# --------------------------------------------------------------------- R232
def test_jenks_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    counts = duck.sql(
        f"{synth.oracle_ctes()} "
        f"SELECT {grid.cell_sql('lon', 'lat', 8)} AS cell, count(*) AS n "
        "FROM tiles GROUP BY 1"
    ).fetchall()
    vh: dict[int, int] = {}
    for _, c in counts:
        vh[int(c)] = vh.get(int(c), 0) + 1
    vals = sorted(vh)
    assert len(vals) >= 3, "need >= 3 distinct density values for k=3"

    def cum(upto):
        nn = sum(vh[v] for v in vals if v <= upto)
        ss = sum(vh[v] * v for v in vals if v <= upto)
        return nn, ss

    tn, ts = cum(vals[-1])
    best = None
    for i, t1 in enumerate(vals):
        for t2 in vals[i + 1 :]:
            if t2 >= vals[-1]:
                continue
            n1, s1 = cum(t1)
            n2c, s2c = cum(t2)
            n2, s2 = n2c - n1, s2c - s1
            n3, s3 = tn - n2c, ts - s2c
            score = (
                (1000 * s1 * s1) // n1
                + (1000 * s2 * s2) // n2
                + (1000 * s3 * s3) // n3
            )
            key = (-score, t1, t2)
            if best is None or key < best:
                best = key
    score, t1, t2 = -best[0], best[1], best[2]

    out = load_all()["jenks_breaks"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 3
    assert set(out.break1) == {t1} and set(out.break2) == {t2}
    assert set(out.score_milli) == {score}
    by_cls = {int(r.class_id): r for r in out.itertuples()}
    # classes partition the value range, in order, and cover all cells
    assert by_cls[1].lo == vals[0] and by_cls[3].hi == vals[-1]
    assert by_cls[1].hi <= t1 < by_cls[2].lo
    assert by_cls[2].hi <= t2 < by_cls[3].lo
    assert sum(int(r.n_cells) for r in out.itertuples()) == sum(vh.values())
    assert sum(int(r.n_tiles) for r in out.itertuples()) == ts
    # per-class replay of stats
    for cid, (lo_b, hi_b) in {
        1: (None, t1), 2: (t1, t2), 3: (t2, None)
    }.items():
        sel = [
            v for v in vals
            if (lo_b is None or v > lo_b) and (hi_b is None or v <= hi_b)
        ]
        nc = sum(vh[v] for v in sel)
        st = sum(vh[v] * v for v in sel)
        r = by_cls[cid]
        assert (int(r.lo), int(r.hi), int(r.n_cells), int(r.n_tiles)) == (
            min(sel), max(sel), nc, st,
        )
        assert int(r.mean_milli) == (1000 * st) // nc
