"""Round-4 batch: independent python replays + invariants for
snapshot_diff_full (five-class diff with hash cross-matching) and
bidir_path (weighted bidirectional search with signature dedup).
Oracle parity rides test_oracle_parity; these replays recompute the
operator logic from the raw input frames (CLAUDE.md: two-engine parity
cannot catch a bug in shared SQL text — the replay can).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from .conftest import SF_TINY, register_views


# ----------------------------------------------------- snapshot_diff_full
def test_snapshot_diff_full_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        "SELECT i, image_id, phash FROM tiles"
    ).fetchall()
    v1 = {img: (int(i), int(ph)) for i, img, ph in rows}

    # v2 derivation (same residue classes as the operator)
    v2: dict[str, tuple[int, int]] = {}
    for i, img, ph in rows:
        i, ph = int(i), int(ph)
        if i % 50 == 7:
            continue
        key = img + "_rn" if i % 30 == 11 else img
        pos = i + 1000000 if i % 40 == 21 else i
        phv = ph + 1 if i % 20 == 3 else ph
        v2[key] = (pos, phv)
        if i % 60 == 5:
            v2[img + "_new"] = (i + 2000000, ph + 777)

    expected = set()
    gone, new = defaultdict(list), defaultdict(list)
    for img, (pos, ph) in v1.items():
        if img in v2:
            p2, h2 = v2[img]
            if ph != h2:
                expected.add((img, img, "changed"))
            elif pos != p2:
                expected.add((img, img, "moved"))
        else:
            gone[ph].append(img)
    for img, (pos, ph) in v2.items():
        if img not in v1:
            new[ph].append(img)
    for ph, olds in gone.items():
        olds.sort()
        news = sorted(new.get(ph, []))
        for k, old in enumerate(olds):
            if k < len(news):
                expected.add((old, news[k], "renamed"))
            else:
                expected.add((old, "", "removed"))
    for ph, news in new.items():
        news.sort()
        n_old = len(gone.get(ph, []))
        for k, nw in enumerate(news):
            if k >= n_old:
                expected.add(("", nw, "added"))

    out = load_all()["snapshot_diff_full"].spark_fn(spark, SF_TINY).toPandas()
    got = {(r.old_id, r.new_id, r.change) for r in out.itertuples()}
    assert got == expected
    # every class must be populated at the tiny sf (anti-vacuous pin)
    classes = {c for _, _, c in got}
    assert classes == {"added", "removed", "changed", "moved", "renamed"}


# ------------------------------------------------------------- bidir_path
def _graph_weighted_edges(duck):
    from tree_sitter_analyzer_spark.operators.graph import weighted_edges_sql

    return [
        (int(u), int(v), int(w))
        for u, v, w in duck.sql(weighted_edges_sql()).fetchall()
    ]


def test_bidir_path_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        BIDIR_DST_LO, BIDIR_HALF,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    edges = _graph_weighted_edges(duck)
    adj = defaultdict(list)
    for u, v, w in edges:
        adj[u].append((v, w))

    # Dijkstra from 0 — independent of both engines' Bellman-Ford
    dist: dict[int, int] = {0: 0}
    pq = [(0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))

    # shortest-path DAG, then full path enumeration (terminates: DAG)
    tight = defaultdict(list)
    for u, v, w in edges:
        if u in dist and v in dist and dist[u] + w == dist[v]:
            tight[u].append(v)
    paths = defaultdict(set)

    def walk(v, sig, hops):
        paths[v].add((sig, hops))
        for nx in tight[v]:
            walk(nx, f"{sig}->{nx}", hops + 1)

    walk(0, "0", 0)
    cap = 2 * BIDIR_HALF
    expected = {}
    for v, sigs in paths.items():
        if v < BIDIR_DST_LO:
            continue
        kept = sorted(s for s, h in sigs if h <= cap)
        if kept:
            expected[v] = (dist[v], len(kept), kept[0])
        # no-truncation pin: the hop cap must not be binding here — a
        # dropped path would silently understate n_paths in BOTH engines
        assert all(h <= cap for _, h in sigs), f"dst {v} has a >{cap}-hop path"

    out = load_all()["bidir_path"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.dst): (int(r.dist), int(r.n_paths), r.best_path)
        for r in out.itertuples()
    }
    assert got == expected
    assert len(got) > 100  # substantial destination layer


def test_bidir_path_dist_equals_weighted_sssp(spark):
    """Verdict #5 pin: the bidirectional distances equal the
    single-source Bellman-Ford distances on the shared layer."""
    from tree_sitter_analyzer_spark.operators import graph

    bd = graph.bidir_paths(spark, graph.weighted_edges_df(spark)).toPandas()
    ss = graph.weighted_sssp(spark, graph.weighted_edges_df(spark), 0).toPandas()
    ssd = dict(zip(ss.v.astype(int), ss.dist.astype(int)))
    assert len(bd) > 0
    for r in bd.itertuples():
        assert ssd[int(r.dst)] == int(r.dist)


# ------------------------------------------------------ home_work_commute
def test_home_work_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.trajectory import (
        HW_RES, _shift, pings_oracle_cte,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    s = _shift(HW_RES)
    rows = duck.sql(
        f"WITH {pings_oracle_cte()} "
        "SELECT user_id, CAST(ix AS BIGINT), CAST(iy AS BIGINT), "
        "date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        " // 3600000000 FROM pings"
    ).fetchall()
    counts = defaultdict(int)
    for uid, ix, iy, eh in rows:
        # python // is floor-division; SQL DIV truncates — identical only
        # on non-negative operands, which the walk guarantees (pinned):
        assert ix >= 0 and iy >= 0
        night = 1 if (eh % 24 >= 20 or eh % 24 < 6) else 0
        counts[(int(uid), int(ix) // s, int(iy) // s, night)] += 1
    best: dict[tuple[int, int], tuple] = {}
    for (uid, cx, cy, night), n in counts.items():
        key = (uid, night)
        cand = (-n, cx, cy)
        if key not in best or cand < best[key]:
            best[key] = cand
    expected = {}
    for uid in {u for u, _ in best}:
        if (uid, 1) in best and (uid, 0) in best:
            hn, hcx, hcy = best[(uid, 1)]
            dn, wcx, wcy = best[(uid, 0)]
            expected[uid] = (
                hcx, hcy, wcx, wcy, -hn, -dn,
                max(abs(hcx - wcx), abs(hcy - wcy)),
                1 if (hcx, hcy) == (wcx, wcy) else 0,
            )
    out = load_all()["home_work_commute"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.user_id): (
            int(r.home_cx), int(r.home_cy), int(r.work_cx), int(r.work_cy),
            int(r.n_night), int(r.n_day), int(r.commute_cheb),
            int(r.colocated),
        )
        for r in out.itertuples()
    }
    assert got == expected and len(got) > 0


# ------------------------------------------------------- set_cover_greedy
def test_set_cover_greedy_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.operators.zonal import (
        SC_CANDS, SC_RADIUS, SC_RES, SC_ROUNDS,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', SC_RES)}, {iy_sql('lat', SC_RES)}, count(*)"
        " FROM tiles GROUP BY 1, 2"
    ).fetchall()
    occ = {(int(x), int(y)): int(n) for x, y, n in rows}
    cand = sorted(occ, key=lambda c: (-occ[c], c))[:SC_CANDS]
    fids = {c: i + 1 for i, c in enumerate(cand)}
    uncovered = set(occ)
    expected, covered_total, picked = [], 0, set()
    for r in range(1, SC_ROUNDS + 1):
        gains = {}
        for c in cand:
            if fids[c] in picked:
                continue
            g = sum(
                1
                for dx in range(-SC_RADIUS, SC_RADIUS + 1)
                for dy in range(-SC_RADIUS, SC_RADIUS + 1)
                if (c[0] + dx, c[1] + dy) in uncovered
            )
            if g > 0:
                gains[c] = g
        if not gains:
            break
        best = min(gains, key=lambda c: (-gains[c], fids[c]))
        g = gains[best]
        picked.add(fids[best])
        covered_total += g
        uncovered = {
            u for u in uncovered
            if not (abs(u[0] - best[0]) <= SC_RADIUS
                    and abs(u[1] - best[1]) <= SC_RADIUS)
        }
        expected.append((r, fids[best], best[0], best[1], g,
                         covered_total, len(occ) - covered_total))
    out = load_all()["set_cover_greedy"].spark_fn(spark, SF_TINY).toPandas()
    got = [
        (int(r.round), int(r.fid), int(r.fcx), int(r.fcy), int(r.gain),
         int(r.covered_total), int(r.uncovered_left))
        for r in out.sort_values("round").itertuples()
    ]
    assert got == expected
    # greedy gains are non-increasing — the submodularity witness
    gains_seq = [g for _, _, _, _, g, _, _ in got]
    assert gains_seq == sorted(gains_seq, reverse=True)
