"""R172-R174: replays/invariants for cms_union_audit, burstiness_cv2,
local_clustering. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter

from .conftest import SF_TINY, register_views


def test_cms_union_audit_monoid_holds_and_bounds(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    q = load_all()["cms_union_audit"]
    got = q.spark_fn(spark, SF_TINY).toPandas()
    assert len(got) == 5
    # the monoid witness: merged sketch == direct sketch on every probe
    assert (got.merge_exact == 1).all()
    # CMS one-sided error: estimate never undercounts
    assert (got.merged_est >= got.exact_cnt).all()


def test_burstiness_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', ts) // 1000000,"
        " event_id FROM events ORDER BY 1, 2, 3"
    ).fetchall()
    series: dict[str, list] = {}
    for et, s, _ in rows:
        series.setdefault(et, []).append(s)
    want = {}
    for et, ss in series.items():
        d = [b - a for a, b in zip(ss, ss[1:])]
        n, S, S2 = len(d), sum(d), sum(x * x for x in d)
        want[et] = (n, S // n, 1000 * (n * S2 - S * S) // (S * S))
    q = load_all()["burstiness_cv2"]
    got = q.spark_fn(spark, SF_TINY).toPandas()
    gm = {
        r.event_type: (int(r.n_gaps), int(r.mean_gap_s), int(r.cv2_pm))
        for r in got.itertuples()
    }
    assert gm == want
    # uniform-ish synthetic arrivals sit below Poisson's 1000
    assert all(0 <= v[2] <= 3000 for v in want.values())


def test_local_clustering_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        edges_df, edges_sql, local_clustering,
    )

    und = {
        (min(a, b), max(a, b))
        for a, b in duck.sql(edges_sql("bfs")).fetchall()
        if a != b
    }
    adj: dict[int, set] = {}
    deg = Counter()
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        deg[a] += 1
        deg[b] += 1
    tv = Counter()
    for a, b in und:
        common = adj[a] & adj[b]
        for c in common:
            if c > b:  # canonical a<b<c counted once, credit 3 corners
                tv[a] += 1
                tv[b] += 1
                tv[c] += 1
    want = {
        v: (deg[v], tv[v], 2000 * tv[v] // (deg[v] * (deg[v] - 1)))
        for v in deg if deg[v] >= 2
    }
    got = local_clustering(edges_df(spark, "bfs")).toPandas()
    gm = {
        int(r.v): (int(r.deg), int(r.n_tri), int(r.lcc_pm))
        for r in got.itertuples()
    }
    assert gm == want
    # global consistency: per-vertex credits sum to 3x the triangle count
    n_tri_total = sum(tv.values())
    assert n_tri_total % 3 == 0 and n_tri_total > 0
