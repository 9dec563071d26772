"""R163: walk_corpus python replay — the deterministic DeepWalk sampler
must equal a from-scratch python walk. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import Counter


def test_walk_corpus_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.graph import (
        WALK_LEN, WALK_MIN_CNT, WALK_WIN, edges_df, edges_sql, walk_corpus,
    )

    edges = {
        (a, b)
        for a, b in duck.sql(edges_sql("bfs")).fetchall()
        if a != b
    }
    nbrs: dict[int, list[int]] = {}
    verts = set()
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        verts.update((a, b))
    for v in nbrs:
        nbrs[v].sort()

    pairs: Counter = Counter()
    for start in verts:
        walk = [start]
        v = start
        for k in range(1, WALK_LEN + 1):
            out = nbrs.get(v)
            if not out:
                break
            r = md5int_py(f"{v}#{k}") % len(out)
            v = out[r]
            walk.append(v)
        for i in range(len(walk)):
            for j in range(i + 1, min(i + WALK_WIN, len(walk) - 1) + 1):
                pairs[(walk[i], walk[j])] += 1
    want = {p: c for p, c in pairs.items() if c >= WALK_MIN_CNT}

    got = walk_corpus(spark, edges_df(spark, "bfs")).toPandas()
    gm = {(int(r.a), int(r.b)): int(r.cnt) for r in got.itertuples()}
    assert gm == want
    assert len(gm) > 100  # the corpus has real mass
