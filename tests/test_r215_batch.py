"""R215-R217 batch: python replays + invariants for kruskal_wallis,
wand_prune, gtest_independence. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import math

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R215
def test_kruskal_wallis_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql("SELECT source, n_chars FROM documents").fetchall()
    vals = sorted({int(v) for _, v in rows})
    cnt = {v: 0 for v in vals}
    per: dict[str, dict[int, int]] = {}
    for s, v in rows:
        cnt[int(v)] += 1
        per.setdefault(s, {})[int(v)] = per.setdefault(s, {}).get(int(v), 0) + 1
    cumb, c2 = 0, {}
    for v in vals:
        c2[v] = 2 * cumb + cnt[v] + 1  # 2 * average rank of value v
        cumb += cnt[v]
    n = len(rows)
    r2 = {s: sum(h * c2[v] for v, h in hv.items()) for s, hv in per.items()}
    ng = {s: sum(hv.values()) for s, hv in per.items()}
    k = len(per)
    tsum = sum(c**3 - c for c in cnt.values())
    a_milli = sum((1000 * r2[s] ** 2) // (4 * ng[s]) for s in per)
    h_milli = (12 * a_milli) // (n * (n + 1)) - 3000 * (n + 1)
    hc_milli = (h_milli * (n**3 - n)) // (n**3 - n - tsum)

    out = load_all()["kruskal_wallis"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == k
    got = {r.source: (int(r.ng), int(r.ranksum2)) for r in out.itertuples()}
    assert got == {s: (ng[s], r2[s]) for s in per}
    row = out.iloc[0]
    assert (int(row.n), int(row.k)) == (n, k)
    assert int(row.h_milli) == h_milli
    assert int(row.hc_milli) == hc_milli
    # rank bookkeeping: total 2*ranksum == N(N+1) (sum of 1..N doubled)
    assert sum(v[1] for v in got.values()) == n * (n + 1)


# --------------------------------------------------------------------- R216
def test_wand_prune_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok"
        " FROM documents"
    ).fetchall()
    tf: dict[tuple[int, str], int] = {}
    dl: dict[int, int] = {}
    for d, t in rows:
        if t == "":
            continue
        tf[(int(d), t)] = tf.get((int(d), t), 0) + 1
        dl[int(d)] = dl.get(int(d), 0) + 1
    n_docs = len(dl)
    avgdl = (1000 * sum(dl.values())) // n_docs
    dfq: dict[str, int] = {}
    for (_, t) in tf:
        dfq[t] = dfq.get(t, 0) + 1
    terms = [
        t for t in ("dup", "key", "value", "window")
        if dfq.get(t, 0) <= math.floor(0.9 * n_docs)
    ]
    tm = {
        (d, t): ((1000000 // dfq[t]) * (22 * f * avgdl))
        // (10 * f * avgdl + 3 * avgdl + 9000 * dl[d])
        for (d, t), f in tf.items() if t in terms
    }
    scores: dict[int, int] = {}
    for (d, _), v in tm.items():
        scores[d] = scores.get(d, 0) + v
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    theta = min(v for _, v in top)
    ub = {t: max(v for (_, tt), v in tm.items() if tt == t) for t in terms}
    skip = {
        d: sum(ub[t] for t in terms if (d, t) in tm) < theta for d in scores
    }
    want = {
        t: (dfq[t], ub[t], sum(1 for d in scores if (d, t) in tm and skip[d]))
        for t in terms
    }

    out = load_all()["wand_prune"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tok: (int(r.df), int(r.ub_micro), int(r.posting_skippable))
        for r in out.itertuples()
    }
    assert got == want
    row = out.iloc[0]
    assert int(row.theta_micro) == theta
    assert int(row.n_candidates) == len(scores)
    assert int(row.n_skippable) == sum(skip.values())
    # WAND soundness: no top-k doc is skippable
    for d, _ in top:
        assert not skip[d]


# --------------------------------------------------------------------- R217
def test_gtest_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {grid.ix_sql('lon', 4)} * 100000 + {grid.iy_sql('lat', 4)},"
        " tile_kind, count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    cells = {(int(b), k): int(c) for b, k, c in rows}
    rm: dict[int, int] = {}
    cm: dict[str, int] = {}
    for (b, k), c in cells.items():
        rm[b] = rm.get(b, 0) + c
        cm[k] = cm.get(k, 0) + c
    n = sum(cells.values())
    g_micro = sum(
        math.floor(2e6 * c * math.log(c * n / (rm[b] * cm[k])))
        for (b, k), c in cells.items()
    )
    out = load_all()["gtest_independence"].spark_fn(spark, SF_TINY).toPandas()
    row = out.iloc[0]
    assert (int(row.n), int(row.r_blocks), int(row.c_kinds)) == (
        n, len(rm), len(cm),
    )
    assert int(row.df) == (len(rm) - 1) * (len(cm) - 1)
    assert int(row.g_micro) == g_micro
    assert int(row.mi_micro) == max(g_micro, 0) // (2 * n)
    assert 0 <= int(row.cramers_v_milli) <= 1000
