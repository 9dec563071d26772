"""R184-R185 batch: python replays + invariants for stress_centrality
and calibration_bins. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY


# --------------------------------------------------------------------- R184
def _edge_rows(duck):
    from tree_sitter_analyzer_spark.operators.graph import edges_sql

    rows = duck.sql(edges_sql("bfs")).fetchall()
    adj: dict[int, set] = {}
    for s, d in rows:
        if s == d:
            continue
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    return adj


def _stress_py(adj, sources):
    """Plain-python Brandes-shape replay: sigma via level BFS, f via
    reverse level fold, stress(v) = sum over sources of sigma*f."""
    stress: dict[int, int] = {}
    for s in sources:
        depth = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        while levels[-1]:
            nxt: dict[int, int] = {}
            for u in levels[-1]:
                for w in adj.get(u, ()):
                    if w in depth and depth[w] <= len(levels) - 1:
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[u]
            for w, sg in nxt.items():
                depth[w] = len(levels)
                sigma[w] = sg
            levels.append(sorted(nxt))
        f = {v: 0 for v in depth}
        for lvl in reversed(levels[:-1]):
            for v in lvl:
                f[v] = sum(
                    f[w] + 1
                    for w in adj.get(v, ())
                    if depth.get(w) == depth[v] + 1
                )
        for v in depth:
            if depth[v] >= 1:
                stress[v] = stress.get(v, 0) + sigma[v] * f[v]
    return stress


def test_stress_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        STRESS_SOURCES, STRESS_TOPK, edges_df, stress_centrality,
    )

    adj = _edge_rows(duck)
    stress = _stress_py(adj, STRESS_SOURCES)
    want = sorted(
        ((st, v) for v, st in stress.items()), key=lambda t: (-t[0], t[1])
    )[:STRESS_TOPK]
    want = {
        (rank + 1): (v, st) for rank, (st, v) in enumerate(want)
    }

    got = {
        int(r.rank): (int(r.v), int(r.stress))
        for r in stress_centrality(spark, edges_df(spark, "bfs"))
        .toPandas()
        .itertuples()
    }
    assert got == want
    assert got[1][1] > 0  # real signal, not an all-zero frame


def test_stress_depth_cap_covers_source_eccentricity(spark):
    """STRESS_DEPTH must exceed every sampled source's eccentricity or
    the backward fold would silently truncate path counts."""
    from pyspark.sql import functions as F

    from tree_sitter_analyzer_spark.operators.graph import (
        STRESS_DEPTH, STRESS_SOURCES, bfs_khop, edges_df,
    )

    e = edges_df(spark, "bfs").where("src <> dst")
    ue = e.unionByName(
        e.selectExpr("dst AS src", "src AS dst")
    ).dropDuplicates(["src", "dst"])
    for s in STRESS_SOURCES:
        reach = bfs_khop(spark, ue, [s], 20)
        ecc = reach.agg(F.max("depth")).collect()[0][0]
        assert ecc < STRESS_DEPTH
        assert reach.count() == 2000  # the graph is connected


# --------------------------------------------------------------------- R185
def test_calibration_matches_python_replay_and_folds(spark):
    from tree_sitter_analyzer_spark.operators.textstats import (
        AUC_POS_QUALITY, CAL_BINS, calibration_bins, text_stats,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    base = text_stats(docs).toPandas()
    bins: dict[int, list[int]] = {}
    for r in base.itertuples():
        s = (1000 * r.n_distinct_tokens) // r.n_tokens
        b = min(s // (1000 // CAL_BINS), CAL_BINS - 1)
        agg = bins.setdefault(int(b), [0, 0, 0])
        agg[0] += 1
        agg[1] += int(r.quality >= AUC_POS_QUALITY)
        agg[2] += int(s)
    want = {}
    for b, (n, n_pos, conf_sum) in bins.items():
        conf = conf_sum // n
        rate = (1000 * n_pos) // n
        want[b] = (n, n_pos, conf, rate, abs(conf - rate))
    ece = sum(v[0] * v[4] for v in want.values()) // sum(
        v[0] for v in want.values()
    )

    got = calibration_bins(docs).toPandas()
    gm = {
        int(r.bin): (int(r.n), int(r.n_pos), int(r.conf_pm),
                     int(r.rate_pm), int(r.gap_pm))
        for r in got.itertuples()
    }
    assert gm == want
    assert set(int(x) for x in got.ece_pm) == {ece}
    # the scorer discriminates (R180) but is NOT calibrated — the gap
    # the two harnesses exist to separate
    assert ece > 100


# --------------------------------------------------------------------- R186
def test_rate_policer_window_form_equals_sequential_recursion(spark, duck):
    """The load-bearing claim: the one-window Lindley closed form
    X_n = D_n - min(0, min_j D_j) equals the sequential token-bucket
    recursion X_n = max(0, X_{n-1} + cost - drain_delta), replayed in
    plain python per stream."""
    from tree_sitter_analyzer_spark.registry import load_all

    from .conftest import register_views

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, "
        "date_diff('second', TIMESTAMP '1970-01-01', ts) AS s, event_id "
        "FROM events ORDER BY event_type, s, event_id"
    ).fetchall()
    streams: dict[str, list[int]] = {}
    for et, s, _eid in rows:
        streams.setdefault(et, []).append(int(s))
    want = {}
    for et, ss in streams.items():
        n, t0, span = len(ss), ss[0], ss[-1] - ss[0]
        x, drain_prev, n_viol, max_x = 0, 0, 0, 0
        for s in ss:
            drain = (1000 * n * (s - t0)) // span
            x = max(0, x + 1000 - (drain - drain_prev))
            drain_prev = drain
            n_viol += x > 5000
            max_x = max(max_x, x)
        want[et] = (n, n_viol, (1000 * n_viol) // n, max_x)

    q = load_all()["rate_policer"]
    got = {
        r.event_type: (int(r.n_events), int(r.n_viol), int(r.viol_pm),
                       int(r.max_x_milli))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got == want
    # both outcome classes present
    assert all(0 < v[1] < v[0] for v in got.values())
