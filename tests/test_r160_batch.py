"""R160-R161 batch: python replays for rich_club and edge_reciprocity.
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter


def _edges(duck, kind="bfs"):
    from tree_sitter_analyzer_spark.operators.graph import edges_sql

    return [tuple(r) for r in duck.sql(edges_sql(kind)).fetchall()]


def test_rich_club_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        RICH_KS, edges_df, rich_club,
    )

    und = {(min(a, b), max(a, b)) for a, b in _edges(duck) if a != b}
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    want = {}
    for k in RICH_KS:
        n_k = sum(1 for d in deg.values() if d > k)
        e_k = sum(1 for a, b in und if min(deg[a], deg[b]) > k)
        phi = (2000 * e_k) // (n_k * (n_k - 1)) if n_k >= 2 else 0
        want[k] = (n_k, e_k, phi)
    got = rich_club(spark, edges_df(spark, "bfs")).toPandas()
    gm = {
        int(r.k): (int(r.n_k), int(r.e_k), int(r.phi_milli))
        for r in got.itertuples()
    }
    assert gm == want
    # the ladder has signal: the lowest rung is populated and phi rises
    # (or stays) as the club tightens until the club empties
    assert want[RICH_KS[0]][0] > 2
    pops = [want[k] for k in RICH_KS if want[k][0] >= 2]
    assert len(pops) >= 2


def test_reciprocity_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        edges_df, reciprocity,
    )

    e = {(a, b) for a, b in _edges(duck) if a != b}
    n_recip = sum(1 for a, b in e if (b, a) in e)
    got = reciprocity(edges_df(spark, "bfs")).toPandas()
    r = got.iloc[0]
    assert int(r.n_edges) == len(e)
    assert int(r.n_recip) == n_recip
    assert int(r.n_mutual_pairs) == n_recip // 2
    assert int(r.r_pm) == 1000 * n_recip // len(e)
    # non-degenerate: some mutual pairs exist in the random graph
    assert n_recip > 0
