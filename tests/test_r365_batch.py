"""R365-R367 batch: python replays + invariants for
range_partition_plan, gale_shapley, densest_peel. The GS replay runs
the SEQUENTIAL McVitie-Wilson algorithm (a different algorithm than
the query's round-synchronous rounds — order-independence makes them
agree on the unique proposer-optimal stable matching); the peel replay
iterates dict degrees; the partition replay rebuilds both shardings."""

from __future__ import annotations

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R365
def test_range_partition_plan_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o_orderkey,"
        " CAST(floor(o_totalprice * 100e0) AS BIGINT) // 100000"
        " FROM orders"
    ).fetchall()
    total = len(rows)
    hist: dict[int, int] = {}
    for _, b in rows:
        hist[int(b)] = hist.get(int(b), 0) + 1
    cum = 0
    shard_of_bin = {}
    for b in sorted(hist):
        shard_of_bin[b] = min(15, 16 * cum // total)
        cum += hist[b]
    nr: dict[int, list] = {}
    for b, n in hist.items():
        s = shard_of_bin[b]
        e = nr.setdefault(s, [0, b, b])
        e[0] += n
        e[1] = min(e[1], b)
        e[2] = max(e[2], b)
    nh: dict[int, int] = {}
    for k, _ in rows:
        s = md5int_py(f"rps_{k}") % 16
        nh[s] = nh.get(s, 0) + 1
    ideal = total // 16

    out = (
        load_all()["range_partition_plan"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == len(nr)
    # range shards are contiguous AND non-overlapping in bin space
    ivs = sorted((v[1], v[2]) for v in nr.values())
    assert all(a2 < b1 for (_, a2), (b1, _) in zip(ivs, ivs[1:]))
    for row in out.itertuples():
        s = int(row.shard)
        assert (int(row.n_range), int(row.lo_bin), int(row.hi_bin)) \
            == tuple(nr[s])
        assert int(row.n_hash) == nh.get(s, 0)
        assert int(row.range_load_milli) == 1000 * nr[s][0] // ideal
        assert int(row.hash_load_milli) == 1000 * nh.get(s, 0) // ideal
        assert int(row.range_skew_milli) \
            == 1000 * max(v[0] for v in nr.values()) // ideal
        assert int(row.hash_skew_milli) == 1000 * max(nh.values()) // ideal


# --------------------------------------------------------------------- R366
def _sequential_gs(pref_m, pref_w):
    """Textbook sequential deferred acceptance (proposer-optimal)."""
    nxt = {m: 0 for m in pref_m}
    eng: dict[int, int] = {}  # w -> m
    free = list(pref_m)
    while free:
        m = free.pop()
        w = pref_m[m][nxt[m]]
        nxt[m] += 1
        if w not in eng:
            eng[w] = m
        else:
            cur = eng[w]
            if pref_w[w].index(m) < pref_w[w].index(cur):
                eng[w] = m
                free.append(cur)
            else:
                free.append(m)
    return eng


def test_gale_shapley_matches_sequential_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    sc = duck.sql(
        "SELECT l.l_suppkey % 8,"
        " CAST(('0x' || substr(md5('gsw_' || p.p_brand), 1, 8)) AS BIGINT)"
        "   % 8,"
        " CAST(floor(sum(l.l_quantity)) AS BIGINT),"
        " CAST(sum(CAST(floor(l.l_extendedprice) AS BIGINT)) AS BIGINT)"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " GROUP BY 1, 2"
    ).fetchall()
    qty = {(int(m), int(w)): int(q) for m, w, q, _ in sc}
    rev = {(int(m), int(w)): int(r) for m, w, _, r in sc}
    tb = {
        (m, w): md5int_py(f"gst_{m}_{w}")
        for m in range(8) for w in range(8)
    }
    pref_m = {
        m: sorted(range(8),
                  key=lambda w: (-qty.get((m, w), 0), tb[(m, w)], w))
        for m in range(8)
    }
    pref_w = {
        w: sorted(range(8),
                  key=lambda m: (-rev.get((m, w), 0), tb[(m, w)], m))
        for w in range(8)
    }
    eng = _sequential_gs(pref_m, pref_w)
    assert len(eng) == 8

    out = load_all()["gale_shapley"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 8
    for row in out.itertuples():
        m, w = int(row.supplier_grp), int(row.brand_grp)
        assert eng[w] == m
        assert int(row.his_rank) == pref_m[m].index(w) + 1
        assert int(row.her_rank) == pref_w[w].index(m) + 1
        assert int(row.n_matched) == 8
        assert int(row.blocking_pairs) == 0
        assert int(row.stable_ok) == 1
    # independent stability audit on the replayed matching
    match_m = {m: w for w, m in eng.items()}
    for m in range(8):
        for w in range(8):
            if (
                pref_m[m].index(w) < pref_m[m].index(match_m[m])
                and pref_w[w].index(m) < pref_w[w].index(eng[w])
            ):
                raise AssertionError(f"blocking pair {(m, w)}")


# --------------------------------------------------------------------- R367
def test_densest_peel_matches_iteration_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        CORE_BLOCK, V_CORE,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    from tree_sitter_analyzer_spark.operators import graph as g

    raw = duck.sql(
        f"SELECT u, v FROM (SELECT src AS u, dst AS v"
        f" FROM ({g._core_edges_sql()}) e WHERE src <> dst"
        f" UNION SELECT dst, src FROM ({g._core_edges_sql()}) e2"
        f" WHERE src <> dst) t"
    ).fetchall()
    adj: dict[int, set] = {}
    for u, v in raw:
        adj.setdefault(int(u), set()).add(int(v))
    rows = []
    for r in range(1, 7):
        n = len(adj)
        if n == 0:
            break
        e = sum(len(s) for s in adj.values()) // 2
        th = (3 * e) // (2 * n)
        rows.append((r, n, e, th, 1000 * e // n))
        keep = {u for u, s in adj.items() if len(s) > th}
        adj = {
            u: {v for v in s if v in keep}
            for u, s in adj.items() if u in keep
        }
        adj = {u: s for u, s in adj.items() if s}
    best = max(d for *_, d in rows)

    out = load_all()["densest_peel"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(rows)
    for row, exp in zip(out.sort_values("round").itertuples(), rows):
        assert (
            int(row.round), int(row.n_nodes), int(row.n_edges),
            int(row.threshold), int(row.density_milli),
        ) == exp
        assert int(row.is_best) == (1 if exp[4] == best else 0)
    # the planted core is found: best density ~ the dense block, and the
    # final census collapses onto the 300-node core inside 2000 vertices
    assert best > 2 * rows[0][4]
    assert rows[-1][1] <= 2 * CORE_BLOCK < V_CORE
