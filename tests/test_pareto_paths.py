"""Invariants for the R120-R123 batch (skyline, SCD2, areal
interpolation, least-cost path, MMR) — independent python/pandas
references beside the cross-engine parity."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from tree_sitter_analyzer_spark import queries_relational as qrel
from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators import cost_distance as cd
from tree_sitter_analyzer_spark.operators import search as search_ops
from tree_sitter_analyzer_spark.operators import zonal

from .conftest import SF_TINY


def test_skyline_brute_dominance(spark):
    """The banded two-phase skyline equals the O(n²) python dominance
    check exactly."""
    got = qrel.q_part_skyline(spark, SF_TINY).toPandas()
    part = pd.read_parquet(f"{SF_TINY}/part.parquet")
    pts = [
        (int(r.p_partkey), int(r.p_size), int(np.floor(r.p_retailprice * 100)))
        for r in part.itertuples(index=False)
    ]
    want = set()
    for k, sz, pr in pts:
        dominated = any(
            s2 >= sz and p2 <= pr and (s2 > sz or p2 < pr)
            for _, s2, p2 in pts
        )
        if not dominated:
            want.add((k, sz, pr))
    assert set(map(tuple, got.values)) == want
    assert len(want) > 1


def test_scd2_interval_algebra(spark):
    """Per user: intervals tile exactly (valid_to == next valid_from),
    exactly one open current row, adjacent types differ, and n_events
    sums to the user's event count."""
    got = qrel.q_scd2_event_intervals(spark, SF_TINY).toPandas()
    ev = pd.read_parquet(f"{SF_TINY}/events.parquet")
    per_user = ev.groupby("user_id").size()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("valid_from_us").reset_index(drop=True)
        assert g.n_events.sum() == per_user[uid]
        assert (g.is_current.sum()) == 1
        assert g.valid_to_us.iloc[-1] == -1 and bool(g.is_current.iloc[-1])
        for i in range(len(g) - 1):
            assert g.valid_to_us.iloc[i] == g.valid_from_us.iloc[i + 1]
            assert g.event_type.iloc[i] != g.event_type.iloc[i + 1]


def test_areal_interpolation_conservation(spark):
    """Dasymetric shares conserve each zone's population up to the
    documented truncation bound: 1e6·pop − n_cells(z) < Σ alloc ≤
    1e6·pop — recomputed per zone in pandas."""
    tiles = synth.tiles_df(spark, SF_TINY)
    zones = synth.zones_df(spark)
    got = zonal.areal_interpolation(tiles, zones, res=8).toPandas()
    from tree_sitter_analyzer_spark import grid
    from tree_sitter_analyzer_spark.operators.pip_join import pip_join
    from pyspark.sql import functions as F

    matched = (
        pip_join(tiles, zones, res=9)
        .select("polygon_id", F.expr(grid.cell_sql("lon", "lat", 8)).alias("cell"))
        .toPandas()
    )
    pops = zones.selectExpr(
        "polygon_id", "1000 + (j * 7919) % 9000 AS pop"
    ).toPandas().set_index("polygon_id")["pop"]
    # recompute per-(zone, cell) allocations
    zc = matched.groupby(["polygon_id", "cell"]).size().rename("cnt").reset_index()
    zt = zc.groupby("polygon_id").cnt.sum()
    alloc = Counter()
    zone_sums = Counter()
    for r in zc.itertuples(index=False):
        a = (1_000_000 * int(pops[r.polygon_id]) * int(r.cnt)) // int(
            zt[r.polygon_id]
        )
        alloc[r.cell] += a
        zone_sums[r.polygon_id] += a
    got_map = dict(zip(got.cell, got.pop_micro))
    assert got_map == dict(alloc)
    n_cells = zc.groupby("polygon_id").size()
    for pid, s in zone_sums.items():
        full = 1_000_000 * int(pops[pid])
        assert full - int(n_cells[pid]) < s <= full, pid


def test_least_cost_path_validity(spark):
    """The traced corridor: starts at the global max-dist cell, each hop
    is 4-adjacent, dist strictly decreases by exactly the destination
    cell's cost band, and the chain ends at a seed (dist 0)."""
    tiles = synth.tiles_df(spark, SF_TINY)
    path = (
        cd.least_cost_path(spark, tiles)
        .toPandas()
        .sort_values("step", ignore_index=True)
    )
    dist = cd.cost_distance(spark, tiles).toPandas()
    cost = cd.costed_cells(tiles).toPandas().set_index("cell")["cost"]
    assert path.step.tolist() == list(range(len(path)))
    top = dist.sort_values(["dist", "cell"], ascending=[False, True]).iloc[0]
    assert (path.cell.iloc[0], path.dist.iloc[0]) == (top.cell, top.dist)
    assert path.dist.iloc[-1] == 0
    P = cd._PACK
    for i in range(len(path) - 1):
        t, u = path.iloc[i], path.iloc[i + 1]  # u = predecessor of t
        tx, ty = divmod(int(t.cell), P)
        ux, uy = divmod(int(u.cell), P)
        assert abs(tx - ux) + abs(ty - uy) == 1, f"step {i} not adjacent"
        # backlink edge u→t costs the DEST (t) cell's band
        assert t.dist - u.dist == cost[t.cell], f"step {i} wrong drop"


def _lev_bm25_pool(docs: pd.DataFrame, query: str, pool_n: int):
    """Python BM25 (same integer formula, independent code path)."""
    tf, dl, dfreq = {}, {}, Counter()
    for doc_id, text in zip(docs.doc_id, docs.text):
        cnt = Counter(t for t in text.split(" ") if t)
        tf[int(doc_id)] = cnt
        dl[int(doc_id)] = sum(cnt.values())
        for t in cnt:
            dfreq[t] += 1
    n_docs = len(dl)
    avgdl_milli = (1000 * sum(dl.values())) // n_docs
    df_cap = int(np.floor(search_ops.MAX_DOC_FREQ * n_docs))
    q_terms = sorted(set(query.split()))
    scored = []
    for d, cnt in tf.items():
        s, nm = 0, 0
        for t in q_terms:
            if t in cnt and dfreq[t] <= df_cap:
                nm += 1
                s += ((1000000 // dfreq[t]) * (22 * cnt[t] * avgdl_milli)) // (
                    10 * cnt[t] * avgdl_milli
                    + 3 * avgdl_milli
                    + 9000 * dl[d]
                )
        if nm:
            scored.append((d, s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:pool_n]


def test_mmr_greedy_python_replay(spark):
    """Full greedy replay in pure python: BM25 pool, distinct-token
    Jaccard sims, the 7·rel − 3·maxsim argmax at every step."""
    query = "dup filter window join"
    got = (
        search_ops.mmr_search(
            spark.read.parquet(f"{SF_TINY}/documents.parquet"), query
        )
        .toPandas()
        .sort_values("rank", ignore_index=True)
    )
    docs = pd.read_parquet(f"{SF_TINY}/documents.parquet")
    pool = _lev_bm25_pool(docs, query, search_ops.MMR_POOL)
    m = max(s for _, s in pool)
    rel = {d: (1000 * s) // m for d, s in pool}
    toksets = {
        int(r.doc_id): set(t for t in r.text.split(" ") if t)
        for r in docs.itertuples(index=False)
        if int(r.doc_id) in rel
    }

    def jac(a, b):
        i = len(toksets[a] & toksets[b])
        return (1000 * i) // (len(toksets[a]) + len(toksets[b]) - i)

    selected, rows = [], []
    for rank in range(1, search_ops.MMR_K + 1):
        best = None
        for d in sorted(rel):
            if d in selected:
                continue
            ms = max((jac(d, s) for s in selected), default=0)
            sc = (
                search_ops.MMR_LAMBDA_NUM * rel[d]
                - search_ops.MMR_LAMBDA_DEN * ms
            )
            if best is None or sc > best[0] or (sc == best[0] and d < best[1]):
                best = (sc, d, ms)
        selected.append(best[1])
        rows.append((rank, best[1], rel[best[1]], best[2], best[0]))
    assert [tuple(r) for r in got.itertuples(index=False)] == rows
    # diversity sanity: the MMR sequence must not equal plain BM25 order
    bm_order = [d for d, _ in pool[: search_ops.MMR_K]]
    assert [r[1] for r in rows] != bm_order
