"""Invariants for R124-R126 (doc keywords, zone shape, RFM segments)."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from tree_sitter_analyzer_spark import queries_relational as qrel
from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import search as search_ops
from tree_sitter_analyzer_spark.operators import zonal

from .conftest import SF_TINY


def test_doc_keywords_python_reference(spark):
    got = (
        search_ops.doc_keywords(
            spark.read.parquet(f"{SF_TINY}/documents.parquet")
        )
        .toPandas()
        .sort_values(["doc_id", "kw_rank"], ignore_index=True)
    )
    docs = pd.read_parquet(f"{SF_TINY}/documents.parquet")
    tf: dict[int, Counter] = {
        int(r.doc_id): Counter(t for t in r.text.split(" ") if t)
        for r in docs.itertuples(index=False)
    }
    dfreq = Counter()
    for c in tf.values():
        for t in c:
            dfreq[t] += 1
    want = []
    for d in sorted(tf):
        ws = sorted(
            ((tok, cnt * (1000000 // dfreq[tok])) for tok, cnt in tf[d].items()),
            key=lambda x: (-x[1], x[0]),
        )[: search_ops.KEYWORDS_PER_DOC]
        for rank, (tok, w) in enumerate(ws, start=1):
            want.append((d, rank, tok, w))
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_zone_shape_python_reference(spark):
    """Perimeter recomputed by set-membership neighbor counting; the
    Polsby-Popper milli score can never exceed the pi/4 isoperimetric
    ceiling for 4-connected cell sets (P >= 4*sqrt(n))."""
    tiles = synth.tiles_df(spark, SF_TINY)
    zones = synth.zones_df(spark)
    got = zonal.zone_shape(tiles, zones, res=9).toPandas().set_index(
        "polygon_id"
    )
    from pyspark.sql import functions as F
    from tree_sitter_analyzer_spark import grid
    from tree_sitter_analyzer_spark.operators.pip_join import pip_join

    cells = (
        pip_join(tiles, zones, res=9)
        .select(
            "polygon_id",
            F.expr(grid.ix_sql("lon", 9)).alias("ix"),
            F.expr(grid.iy_sql("lat", 9)).alias("iy"),
        )
        .distinct()
        .toPandas()
    )
    assert (got.compact_milli <= 786).all()  # floor(1000*pi/4) + 1
    assert (got.compact_milli > 0).all()
    for pid, g in cells.groupby("polygon_id"):
        pts = set(zip(g.ix, g.iy))
        perim = sum(
            (x + dx, y + dy) not in pts
            for x, y in pts
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        )
        row = got.loc[pid]
        assert row.n_cells == len(pts)
        assert row.perimeter == perim, pid
        assert row.perimeter == 4 * row.n_cells - 2 * row.n_adj


def test_rfm_scores_balanced_and_consistent(spark):
    got = qrel.q_rfm_segments(spark, SF_TINY).toPandas()
    n = len(got)
    assert n > 0
    for col, value_col, best_is_max in (
        ("r_score", "recency_days", False),
        ("f_score", "frequency", True),
        ("m_score", "monetary_cents", True),
    ):
        sizes = got[col].value_counts()
        assert set(sizes.index) <= {1, 2, 3}
        # row_number terciles: bucket sizes differ by at most 1
        assert sizes.max() - sizes.min() <= 1
        top = got.sort_values(
            value_col, ascending=not best_is_max
        ).iloc[0]
        assert top[col] == 3, col
    assert (
        got.segment
        == got.r_score * 100 + got.f_score * 10 + got.m_score
    ).all()
