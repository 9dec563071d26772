"""R287-R289 batch: python replays + invariants for mst_boruvka,
motif_counts, louvain_move. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from .conftest import SF_TINY


def _und_edges(duck):
    from tree_sitter_analyzer_spark.operators.graph import edges_sql

    return duck.sql(
        "SELECT DISTINCT LEAST(src,dst) a, GREATEST(src,dst) b FROM ("
        + edges_sql("bfs")
        + ") WHERE src <> dst"
    ).fetchall()


# --------------------------------------------------------------------- R287
def test_mst_boruvka_equals_kruskal_on_unique_weights(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    edges = _und_edges(duck)

    def md5int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    we = sorted(
        ((1 + md5int(f"{a},{b}") % 100) * (1 << 44) + a * (1 << 22) + b, a, b)
        for a, b in edges
    )
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for _, a, b in we:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            mst.add((a, b))

    out = load_all()["mst_boruvka"].spark_fn(spark, SF_TINY).toPandas()
    got = set(zip(out.a.astype(int), out.b.astype(int)))
    # MST is unique under unique weights: Borůvka must equal Kruskal.
    assert got == mst
    # spanning forest: |MST| = V - #components
    verts = {v for e in edges for v in e}
    ncomp = len({find(v) for v in verts})
    assert len(got) == len(verts) - ncomp
    # weight column carried correctly
    for r in out.itertuples():
        assert int(r.w) == 1 + md5int(f"{int(r.a)},{int(r.b)}") % 100


# --------------------------------------------------------------------- R288
def test_motif_counts_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    edges = _und_edges(duck)
    adj: dict[int, set] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    stars3 = sum(
        len(s) * (len(s) - 1) * (len(s) - 2) // 6 for s in adj.values()
    )
    tri = sum(
        1
        for a, b in edges
        for c in adj[a]
        if c > b and c in adj[b]
    )
    codeg: dict[tuple, int] = defaultdict(int)
    for m, s in adj.items():
        ns = sorted(s)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                codeg[(ns[i], ns[j])] += 1
    sum_c2 = sum(c * (c - 1) // 2 for c in codeg.values())
    assert sum_c2 % 2 == 0  # every 4-cycle has exactly two diagonals
    c4 = sum_c2 // 2

    out = load_all()["motif_counts"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.n_vertices) == len(adj)
    assert int(r.n_edges) == len(edges)
    assert int(r.wedges) == wedges
    assert int(r.stars3) == stars3
    assert int(r.triangles) == tri
    assert int(r.cycles4) == c4

    # cross-check with the standalone triangle_count query
    tq = load_all()["triangle_count"].spark_fn(spark, SF_TINY).toPandas()
    assert int(tq.iloc[0, 0]) == tri


# --------------------------------------------------------------------- R289
def test_louvain_move_matches_python_gain_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import LOUVAIN_BLOCKS
    from tree_sitter_analyzer_spark.registry import load_all

    edges = _und_edges(duck)
    adj: dict[int, set] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    m = len(edges)
    k = {v: len(s) for v, s in adj.items()}
    c = {v: v % LOUVAIN_BLOCKS for v in adj}
    sig = defaultdict(int)
    for v in adj:
        sig[c[v]] += k[v]

    moved = {}
    for v in adj:
        evc: dict[int, int] = defaultdict(int)
        for u in adj[v]:
            evc[c[u]] += 1
        ca = c[v]
        ea = evc.get(ca, 0)
        siga = sig[ca] - k[v]
        best = None
        for cu in sorted(cc for cc in evc if cc != ca):
            g = 2 * m * (evc[cu] - ea) - k[v] * (sig[cu] - siga)
            if best is None or g > best[0]:
                best = (g, cu)
        if best is not None and best[0] > 0:
            moved[v] = best[1]
    c1 = {v: moved.get(v, c[v]) for v in adj}

    def q_milli(labels):
        ein = defaultdict(int)
        sg = defaultdict(int)
        for a, b in edges:
            if labels[a] == labels[b]:
                ein[labels[a]] += 1
        for v in adj:
            sg[labels[v]] += k[v]
        return sum((1000 * ein.get(C, 0)) // m for C in sg) - sum(
            (1000 * s * s) // (4 * m * m) for s in sg.values()
        )

    out = load_all()["louvain_move"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert int(r.n_vertices) == len(adj)
    assert int(r.n_edges) == m
    assert int(r.n_moved) == len(moved)
    assert int(r.n_comms_after) == len(set(c1.values()))
    q0, q1 = q_milli(c), q_milli(c1)
    assert int(r.q0_sign) * int(r.q0_abs_milli) == q0
    assert int(r.q1_sign) * int(r.q1_abs_milli) == q1
