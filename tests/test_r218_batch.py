"""R218-R219 batch: python replays + invariants for bipartite_check and
harmonic_centrality. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import deque


def _graph(duck):
    from tree_sitter_analyzer_spark.operators.graph import edges_sql

    rows = duck.sql(edges_sql("bfs")).fetchall()
    adj: dict[int, set[int]] = {}
    edges = set()
    for s, d in rows:
        s, d = int(s), int(d)
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        edges.add((min(s, d), max(s, d)))
    return adj, edges


def _bfs(adj, sources):
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        v = dq.popleft()
        for u in adj.get(v, ()):
            if u not in dist:
                dist[u] = dist[v] + 1
                dq.append(u)
    return dist


# --------------------------------------------------------------------- R218
def test_bipartite_check_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    adj, edges = _graph(duck)
    comp: dict[int, int] = {}
    for v in sorted(adj):
        if v in comp:
            continue
        for u in _bfs(adj, [v]):
            comp[u] = v
    roots = sorted(set(comp.values()))
    dist = _bfs(adj, roots)  # each vertex reachable only from its own root
    want = {}
    for r in roots:
        vs = [v for v, c in comp.items() if c == r]
        es = [(u, w) for u, w in edges if comp[u] == r]
        odd = sum(1 for u, w in es if dist[u] % 2 == dist[w] % 2)
        want[r] = (len(vs), len(es), odd, 1 if odd == 0 else 0,
                   max(dist[v] for v in vs))

    out = load_all()["bipartite_check"].spark_fn(spark, "x").toPandas()
    got = {
        int(r.component): (
            int(r.n_vertices), int(r.n_edges), int(r.n_odd_edges),
            int(r.is_bipartite), int(r.max_depth),
        )
        for r in out.itertuples()
    }
    assert got == want
    # partition bookkeeping: vertex/edge totals close
    assert sum(v[0] for v in got.values()) == len(adj)
    assert sum(v[1] for v in got.values()) == len(edges)


# --------------------------------------------------------------------- R219
def test_harmonic_centrality_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        HARMONIC_CAP, HARMONIC_SEEDS, _HARMONIC_LCM,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    adj, _ = _graph(duck)
    want = {}
    for s in HARMONIC_SEEDS:
        dist = _bfs(adj, [s])
        reached = {v: d for v, d in dist.items() if 0 < d <= HARMONIC_CAP}
        want[s] = (
            len(reached),
            sum(_HARMONIC_LCM // d for d in reached.values()),
            sum(reached.values()),
        )
    out = load_all()["harmonic_centrality"].spark_fn(spark, "x").toPandas()
    got = {
        int(r.seed): (int(r.n_reached), int(r.harmonic_num), int(r.sum_dist))
        for r in out.itertuples()
    }
    assert got == want
    # all reciprocal distances are exact: lcm(1..12) divides every term
    for s, (n, h, _) in got.items():
        assert 0 < n and h % 1 == 0 and h <= n * _HARMONIC_LCM
