"""R140-R144 batch: python/numpy replays + structural invariants for
hits_ranks, link_prediction, seq_packing, ndcg_eval, dissimilarity_index.
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .conftest import SF_TINY


def _edges(duck, kind="bfs"):
    from tree_sitter_analyzer_spark.operators.graph import edges_sql

    return [tuple(r) for r in duck.sql(edges_sql(kind)).fetchall()]


def test_hits_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        HITS_SCALE, edges_df, hits_fixed,
    )

    edges = _edges(duck)
    verts = sorted({v for e in edges for v in e})
    h = {v: 1000 for v in verts}
    for _ in range(2):
        a = {v: 0 for v in verts}
        for s, d in edges:
            a[d] += h[s]
        h = {v: 0 for v in verts}
        for s, d in edges:
            h[s] += a[d]
    ma, mh = max(a.values()), max(h.values())
    expected = {
        v: (a[v] * HITS_SCALE // ma, h[v] * HITS_SCALE // mh) for v in verts
    }
    got = hits_fixed(spark, edges_df(spark, "bfs"), 2).toPandas()
    assert len(got) == len(verts)
    for r in got.itertuples():
        assert expected[int(r.v)] == (int(r.auth_q), int(r.hub_q))
    assert got["auth_q"].max() == HITS_SCALE
    assert got["hub_q"].max() == HITS_SCALE
    assert got["auth_q"].min() >= 0 and got["hub_q"].min() >= 0


def test_link_prediction_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        LP_DEG_CAP, LP_SCALE, edges_df, link_prediction,
    )

    und = {
        (min(s, d), max(s, d)) for s, d in _edges(duck) if s != d
    }
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores = Counter()
    cns = Counter()
    for z, nb in nbrs.items():
        if len(nb) > LP_DEG_CAP:
            continue
        w = LP_SCALE // (len(nb).bit_length() - 1)
        nb_sorted = sorted(nb)
        for i, u in enumerate(nb_sorted):
            for v in nb_sorted[i + 1:]:
                scores[(u, v)] += w
                cns[(u, v)] += 1
    cand = [
        (-aa, -cns[p], p[0], p[1])
        for p, aa in scores.items()
        if p not in und
    ]
    expected = sorted(cand)[:50]
    got = link_prediction(spark, edges_df(spark, "bfs")).toPandas()
    got = got.sort_values("rank", ignore_index=True)
    assert len(got) == 50
    for i, r in enumerate(got.itertuples()):
        aa, ncn, u, v = expected[i]
        assert (int(r.u), int(r.v)) == (u, v)
        assert (int(r.aa_micro), int(r.cn)) == (-aa, -ncn)
        assert (int(r.u), int(r.v)) not in und  # never an existing edge


def test_seq_packing_matches_python_replay(spark):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.packing import (
        PACK_CAP, PACK_SHARDS, seq_packing,
    )

    docs = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    shards = defaultdict(list)
    for r in docs.itertuples():
        grp = md5int_py(str(int(r.doc_id))) % PACK_SHARDS
        t = min(len([w for w in r.text.split(" ") if w]), PACK_CAP)
        shards[grp].append((int(r.doc_id), t))
    expected = {}
    for grp, rows in shards.items():
        bin_id, fill, n = 1, 0, 0
        for _, t in sorted(rows):
            if n and fill + t > PACK_CAP:
                expected[(grp, bin_id)] = (n, fill)
                bin_id, fill, n = bin_id + 1, 0, 0
            fill += t
            n += 1
        expected[(grp, bin_id)] = (n, fill)
    got = seq_packing(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert expected[(int(r.grp), int(r.bin_id))] == (
            int(r.n_docs), int(r.fill_tokens)
        )
        assert int(r.fill_tokens) <= PACK_CAP
    # every doc packed exactly once; bins contiguous from 1 per shard
    assert int(got["n_docs"].sum()) == len(docs)
    for grp, sub in got.groupby("grp"):
        bins = sorted(sub["bin_id"])
        assert bins == list(range(1, len(bins) + 1))


def test_ndcg_invariants_and_replay(spark):
    from tree_sitter_analyzer_spark.operators.search import (
        NDCG_K, bm25_search, ndcg_eval,
    )
    from tree_sitter_analyzer_spark.operators.textstats import text_stats
    from tree_sitter_analyzer_spark.queries_pipeline import SEARCH_QUERY

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    top = bm25_search(docs, SEARCH_QUERY, NDCG_K).toPandas()
    quality = {
        int(r.doc_id): int(r.quality) // 25
        for r in text_stats(docs).toPandas().itertuples()
    }
    disc = [int(1_000_000 // math.log2(r + 1)) for r in range(1, NDCG_K + 1)]
    got = ndcg_eval(docs, SEARCH_QUERY).toPandas()
    assert sorted(got["ranker"]) == ["bm25", "naive"]
    for ranker, order_col in (("bm25", "rank"), ("naive", "doc_id")):
        rels = [
            quality[int(r.doc_id)]
            for r in top.sort_values(order_col).itertuples()
        ]
        dcg = sum(rel * d for rel, d in zip(rels, disc))
        idcg = sum(rel * d for rel, d in zip(sorted(rels, reverse=True), disc))
        row = got[got["ranker"] == ranker].iloc[0]
        assert (int(row.dcg_scaled), int(row.idcg_scaled)) == (dcg, idcg)
        assert int(row.ndcg_milli) == 1000 * dcg // idcg
        assert 0 < int(row.ndcg_milli) <= 1000
    # the statistic must DISCRIMINATE on this corpus: the label multiset
    # varies within the pool, so at least one ranker is non-ideal
    assert int(got["ndcg_milli"].min()) < 1000


def test_dissimilarity_matches_numpy_replay(spark, duck):
    import numpy as np

    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.operators.pointpattern import (
        dissimilarity,
    )

    from .conftest import register_views

    register_views(duck, SF_TINY)
    pdf = duck.sql(
        f"{synth.oracle_ctes()} SELECT lon, lat, tile_kind FROM tiles"
    ).df()
    ix, iy = grid.np_ixiy(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 7
    )
    cells = ix.astype(np.int64) * 1_048_576 + iy.astype(np.int64)
    counts = Counter(zip(cells.tolist(), pdf["tile_kind"]))
    totals = Counter(pdf["tile_kind"])
    kinds = sorted(totals)
    cellset = sorted({c for c, _ in counts})
    got = dissimilarity(synth.tiles_df(spark, SF_TINY), res=7).toPandas()
    assert len(got) == len(kinds) * (len(kinds) - 1) // 2
    for r in got.itertuples():
        a, b = r.kind_a, r.kind_b
        num = sum(
            abs(
                counts.get((c, a), 0) * totals[b]
                - counts.get((c, b), 0) * totals[a]
            )
            for c in cellset
        )
        assert int(r.d_milli) == 500 * num // (totals[a] * totals[b])
        assert 0 <= int(r.d_milli) <= 1000
