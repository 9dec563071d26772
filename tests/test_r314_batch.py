"""R314-R316 batch: python replays + invariants for maximal_matching,
theil_sen, l_diversity. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R314
def test_maximal_matching_replay_and_invariants(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        MM_ROUNDS,
        _MM_PACK,
        edges_df,
        edges_sql,
        maximal_matching,
    )

    raw = duck.sql(edges_sql("bfs")).fetchall()
    edges = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d in raw if s != d
    }
    live = set(edges)
    matched: dict[tuple[int, int], int] = {}
    for r in range(MM_ROUNDS):
        keys = {
            e: md5int_py(f"mm{r}_{e[0]}_{e[1]}") * _MM_PACK
            + e[0] * 2048 + e[1]
            for e in live
        }
        vmin: dict[int, int] = {}
        for (u, v), k in keys.items():
            vmin[u] = min(vmin.get(u, k), k)
            vmin[v] = min(vmin.get(v, k), k)
        winners = [
            e for e, k in keys.items()
            if vmin[e[0]] == k and vmin[e[1]] == k
        ]
        for e in winners:
            matched[e] = r
        mv = {w for e in winners for w in e}
        live = {e for e in live if e[0] not in mv and e[1] not in mv}
    # MM_ROUNDS rounds drain the fixed graph completely
    assert not live

    out = maximal_matching(spark, edges_df(spark, "bfs")).toPandas()
    got = {
        (int(r.u), int(r.v)): int(r.mm_round) for r in out.itertuples()
    }
    assert got == matched

    # matching property: no vertex appears twice
    verts = [w for e in got for w in e]
    assert len(verts) == len(set(verts))
    # maximality / 2-approx vertex cover: matched endpoints cover EVERY edge
    cover = set(verts)
    assert all(u in cover or v in cover for u, v in edges)


# --------------------------------------------------------------------- R315
def test_theil_sen_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag,"
        " date_diff('day', DATE '1996-01-01', CAST(l_shipdate AS DATE)),"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " FROM lineitem WHERE year(l_shipdate) = 1996"
    ).fetchall()
    daily = defaultdict(lambda: defaultdict(int))
    for flag, x, dollars in rows:
        daily[flag][int(x)] += int(dollars)
    exp = {}
    for flag, dd in daily.items():
        y = [0] * 366
        for x, tot in dd.items():
            # python // floors; totals are non-negative so it matches DIV
            assert tot >= 0 and 0 <= x < 366
            y[x] = tot // 1000
        slopes = []
        for i in range(366):
            for j in range(i + 1, 366):
                d = y[j] - y[i]
                dx = j - i
                s = (1000 * d) // dx if d >= 0 else -((1000 * -d) // dx)
                slopes.append(s)
        slopes.sort()
        n = len(slopes)
        exp[flag] = (n, slopes[(n + 1) // 2 - 1])

    out = load_all()["theil_sen"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(exp)
    for r in out.itertuples():
        n, med = exp[r.flag]
        assert (int(r.n_pairs), int(r.ts_slope_milli)) == (n, med)
        assert n == 366 * 365 // 2


# --------------------------------------------------------------------- R316
def test_l_diversity_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.textstats import (
        RCL_C,
        RCL_L,
        _KANON_BAND,
        quality_oracle_ctes,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH {quality_oracle_ctes('rp')}"
        " SELECT d.lang, d.source,"
        f" CAST(d.n_chars AS BIGINT) // {_KANON_BAND},"
        " CASE WHEN q.quality >= 80 THEN 'A' WHEN q.quality >= 60 THEN 'B'"
        " WHEN q.quality >= 40 THEN 'C' ELSE 'D' END"
        " FROM documents d JOIN rp_q q ON q.doc_id = d.doc_id"
    ).fetchall()
    groups = defaultdict(Counter)
    for lang, source, band, grade in rows:
        groups[(lang, source, int(band))][grade] += 1
    exp = {}
    for key, cnt in groups.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        r1 = ranked[0][1]
        tail = sum(c for _, c in ranked[RCL_L - 1:])
        exp[key] = (
            sum(cnt.values()), len(cnt), r1, tail,
            1 if r1 < RCL_C * tail else 0,
        )

    out = load_all()["l_diversity"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(exp)
    flagged = 0
    for r in out.itertuples():
        key = (r.lang, r.source, int(r.len_band))
        assert (int(r.n), int(r.n_grades), int(r.r1), int(r.tail_l),
                int(r.rcl_ok)) == exp[key]
        flagged += 1 - int(r.rcl_ok)
    # the audit discriminates: both outcomes occur on the synthetic corpus
    assert 0 < flagged < len(exp)
