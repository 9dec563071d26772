"""R154-R155 batch: python replays + invariants for ktruss_edges,
modularity_score. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict


def _truss_replay(edges, k, rounds):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for _ in range(rounds):
        adj = defaultdict(set)
        for a, b in e:
            adj[a].add(b)
            adj[b].add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in e
        }
        e = {ab for ab in e if sup[ab] >= k - 2}
    adj = defaultdict(set)
    for a, b in e:
        adj[a].add(b)
        adj[b].add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in e}


def test_ktruss_matches_python_replay_and_converged(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        KTRUSS_K, KTRUSS_ROUNDS, _core_edges_sql, core_edges_df, ktruss,
    )

    edges = [tuple(r) for r in duck.sql(_core_edges_sql()).fetchall()]
    want = _truss_replay(edges, KTRUSS_K, KTRUSS_ROUNDS)
    assert want, "planted core must retain a non-empty truss"
    got = ktruss(spark, core_edges_df(spark)).toPandas()
    gm = {(int(r.a), int(r.b)): int(r.support) for r in got.itertuples()}
    assert gm == want
    # fixpoint reached: one more peel changes nothing
    assert _truss_replay(edges, KTRUSS_K, KTRUSS_ROUNDS + 1) == want
    # truss edges live inside the planted dense block plus whatever the
    # background sustains; every support honors the threshold
    assert all(s >= KTRUSS_K - 2 for s in gm.values())


def test_modularity_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        edges_df, edges_sql, label_propagation_oracle, modularity,
    )

    labels = {
        int(v): int(l)
        for v, l in duck.sql(label_propagation_oracle()).fetchall()
    }
    edges = [tuple(r) for r in duck.sql(edges_sql("bfs")).fetchall()]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    members, deg_sum, intra = Counter(), Counter(), Counter()
    for v, l in labels.items():
        members[l] += 1
        deg_sum[l] += deg[v]
    for a, b in und:
        if labels[a] == labels[b]:
            intra[labels[a]] += 1
    m = len(und)
    q1 = (
        1_000_000
        * (4 * m * sum(intra.values())
           - sum(d * d for d in deg_sum.values())
           + 4 * m * m)
        // (4 * m * m)
    )
    got = modularity(spark, edges_df(spark, "bfs")).toPandas()
    assert len(got) == len(members)
    for r in got.itertuples():
        lab = int(r.label)
        assert int(r.members) == members[lab]
        assert int(r.deg_sum) == deg_sum[lab]
        assert int(r.intra_edges) == intra[lab]
        assert int(r.q_plus1_micro) == q1
    # Q in (-1/2, 1] => micro in (500000, 2000000]
    assert 500_000 < q1 <= 2_000_000
