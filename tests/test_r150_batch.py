"""R150-R153 batch: python replays + invariants for ppr_seed0,
gap_fill_daily, trimmed_stats, label_propagation.
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views


def _q(name):
    from tree_sitter_analyzer_spark.registry import load_all

    return load_all()[name].spark_fn


def test_ppr_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        PR_SCALE, edges_df, edges_sql, ppr_fixed,
    )

    edges = [tuple(r) for r in duck.sql(edges_sql("dag")).fetchall()]
    verts = sorted({v for e in edges for v in e})
    outdeg = Counter(s for s, _ in edges)
    pr = {v: PR_SCALE if v == 0 else 0 for v in verts}
    base = PR_SCALE * 15 // 100
    for _ in range(3):
        sc = {v: 0 for v in verts}
        for s, d in edges:
            sc[d] += pr[s] // outdeg[s]
        pr = {
            v: (base if v == 0 else 0) + int(sc[v] * 85 / 100e0 // 1)
            for v in verts
        }
    got = ppr_fixed(spark, edges_df(spark, "dag"), 0).toPandas()
    assert len(got) == len(verts)
    gm = {int(r.v): int(r.ppr_micro) for r in got.itertuples()}
    assert gm == pr
    # teleport localization: nonzero rank only within the seed's 3-hop ball
    ball = {0}
    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)
    frontier = {0}
    for _ in range(3):
        frontier = {d for s in frontier for d in out[s]}
        ball |= frontier
    assert all(v in ball for v, m in gm.items() if m > 0)
    assert gm[0] >= base
    # simplified-variant mass bound: total rank never exceeds SCALE
    assert sum(gm.values()) <= PR_SCALE


def test_label_propagation_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        edges_df, edges_sql, label_propagation,
    )

    edges = [tuple(r) for r in duck.sql(edges_sql("bfs")).fetchall()]
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {v: v for v in nbrs}
    for _ in range(2):
        nxt = {}
        for v, nb in nbrs.items():
            cnt = Counter(lab[u] for u in nb)
            top = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == top)
        lab = nxt
    got = label_propagation(spark, edges_df(spark, "bfs")).toPandas()
    assert len(got) == len(lab)
    for r in got.itertuples():
        assert lab[int(r.v)] == int(r.label)
    # propagation actually coarsens: fewer distinct labels than vertices
    assert got["label"].nunique() < len(got)


def test_gap_fill_daily_locf(spark, duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT user_id,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        " // 86400000000 AS day, count(*) AS cnt"
        " FROM events WHERE event_type = 'signup' GROUP BY 1, 2"
    ).fetchall()
    obs = {(int(u), int(d)): int(c) for u, d, c in rows}
    span = defaultdict(lambda: [10**9, -(10**9)])
    for (u, d) in obs:
        span[u][0] = min(span[u][0], d)
        span[u][1] = max(span[u][1], d)
    got = _q("gap_fill_daily")(spark, SF_TINY).toPandas()
    expect_rows = sum(d1 - d0 + 1 for d0, d1 in span.values())
    assert len(got) == expect_rows
    gaps = 0
    for r in got.itertuples():
        u, d = int(r.user_id), int(r.day)
        if (u, d) in obs:
            assert int(r.was_gap) == 0
            assert int(r.cnt_filled) == obs[(u, d)]
        else:
            gaps += 1
            assert int(r.was_gap) == 1
            last = max(dd for (uu, dd) in obs if uu == u and dd < d)
            assert int(r.cnt_filled) == obs[(u, last)]
    # the LOCF path must actually be exercised at this scale
    assert gaps > 0
    # per-user output days are contiguous
    for u, sub in got.groupby("user_id"):
        days = sorted(int(x) for x in sub["day"])
        assert days == list(range(days[0], days[-1] + 1))


def test_trimmed_stats_replay(spark, duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, event_id,"
        " CAST(floor(value * 100e0) AS BIGINT) FROM events"
    ).fetchall()
    by_type = defaultdict(list)
    for t, e, c in rows:
        by_type[t].append((int(c), int(e)))
    got = _q("trimmed_stats")(spark, SF_TINY).toPandas()
    assert len(got) == len(by_type)
    for r in got.itertuples():
        vals = sorted(by_type[r.event_type])
        n = len(vals)
        kept = vals[n // 10: n - n // 10]
        assert int(r.n) == n
        assert int(r.n_kept) == len(kept) == n - 2 * (n // 10)
        s = sum(c for c, _ in kept)
        assert int(r.sum_kept_cents) == s
        assert int(r.mean_kept_cents) == s // len(kept)
        assert int(r.lo_cents) == min(c for c, _ in kept)
        assert int(r.hi_cents) == max(c for c, _ in kept)
        # trimming really trims: kept range is inside the full range
        assert int(r.lo_cents) >= vals[0][0]
        assert int(r.hi_cents) <= vals[-1][0]
