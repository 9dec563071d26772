"""R362-R364 batch: python replays + invariants for hash_ring_audit,
apriori_triples, textrank_keywords. The ring replay re-derives every
assignment with hashlib and proves the minimal-disruption theorem
structurally; the A-priori replay recomputes the mean-anchored
thresholds and the downward-closure candidate set; the TextRank replay
iterates the milli PageRank recurrence directly."""

from __future__ import annotations

from itertools import combinations

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------------------------- R362
def test_hash_ring_audit_matches_hashlib_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    keys = duck.sql(
        "SELECT p_partkey,"
        " CAST(floor(p_retailprice * 100e0) AS BIGINT) FROM part"
    ).fetchall()
    pts = [
        (i // 16, md5int_py(f"ring_srv{i // 16}_v{i % 16}"), i)
        for i in range(9 * 16)
    ]

    def assign(hk: int, n_srv: int) -> int:
        cand = [(h, i, s) for s, h, i in pts if s < n_srv]
        ge = [(h * 256 + i, s) for h, i, s in cand if h >= hk]
        pool = ge if ge else [(h * 256 + i, s) for h, i, s in cand]
        return min(pool)[1]

    per_srv: dict[int, list[int]] = {}
    n_moved = n_to_new = 0
    total_load = 0
    for pk, load in keys:
        hk = md5int_py(f"ringkey_{pk}")
        s8, s9 = assign(hk, 8), assign(hk, 9)
        st = per_srv.setdefault(s8, [0, 0, 0])
        st[0] += 1
        st[1] += int(load)
        total_load += int(load)
        if s8 != s9:
            st[2] += 1
            n_moved += 1
            # minimal disruption: a moved key can only land on srv 8
            assert s9 == 8
            n_to_new += 1

    out = load_all()["hash_ring_audit"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(per_srv)
    for row in out.itertuples():
        st = per_srv[int(row.srv)]
        assert (int(row.n_keys), int(row.load_cents), int(row.n_lost)) \
            == tuple(st)
        assert int(row.load_milli) == 1000 * st[1] // total_load
        assert int(row.movement_milli) == 1000 * n_moved // len(keys)
        assert int(row.ideal_milli) == 111
        assert int(row.minimality_ok) == 1
    # vnode balance: no server hoards more than 3x its fair share
    assert max(s[0] for s in per_srv.values()) <= 3 * (len(keys) // 8 + 1)


# --------------------------------------------------------------------- R363
def test_apriori_triples_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT DISTINCT l.l_orderkey, p.p_brand FROM lineitem l"
        " JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    baskets: dict[int, set] = {}
    for oid, b in rows:
        baskets.setdefault(int(oid), set()).add(b)
    n_baskets = len(baskets)
    isup: dict[str, int] = {}
    for items in baskets.values():
        for i in items:
            isup[i] = isup.get(i, 0) + 1
    ms1 = max(2, n_baskets // 1000)
    f1 = {i for i, s in isup.items() if s >= ms1}
    bf = {o: sorted(i for i in items if i in f1)
          for o, items in baskets.items()}
    p_inc = sum(len(v) * (len(v) - 1) for v in bf.values())
    t_inc = sum(len(v) * (len(v) - 1) * (len(v) - 2) for v in bf.values())
    ms2 = max(2, p_inc // 600)
    ms3 = max(2, t_inc // 13800)
    psup: dict[tuple, int] = {}
    tsup: dict[tuple, int] = {}
    for v in bf.values():
        for pr in combinations(v, 2):
            psup[pr] = psup.get(pr, 0) + 1
        for tr in combinations(v, 3):
            tsup[tr] = tsup.get(tr, 0) + 1
    f2 = {p for p, s in psup.items() if s >= ms2}
    expect = {
        t: s
        for t, s in tsup.items()
        if s >= ms3
        and (t[0], t[1]) in f2 and (t[0], t[2]) in f2 and (t[1], t[2]) in f2
    }

    out = load_all()["apriori_triples"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(expect)
    for row in out.itertuples():
        t = (row.i1, row.i2, row.i3)
        assert t in expect
        assert int(row.support) == expect[t]
        assert int(row.support_ppm) == 1000000 * expect[t] // n_baskets
        assert int(row.minsup) == ms3
        assert int(row.n_baskets) == n_baskets
    # the prune is genuinely selective AND non-vacuous
    assert 0 < len(expect) < len(tsup)


# --------------------------------------------------------------------- R364
def test_textrank_keywords_matches_iteration_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    e0: dict[tuple, int] = {}
    for _, text in docs:
        toks = [t for t in text.split(" ") if t]
        for u, v in zip(toks, toks[1:]):
            if u == v:
                continue
            a, b = min(u, v), max(u, v)
            e0[(a, b)] = e0.get((a, b), 0) + 1
    edges: dict[str, dict[str, int]] = {}
    for (a, b), w in e0.items():
        edges.setdefault(a, {})[b] = w
        edges.setdefault(b, {})[a] = w
    w_out = {u: sum(nb.values()) for u, nb in edges.items()}
    r = {u: 1000 for u in edges}
    for _ in range(3):
        nxt = {}
        for v in edges:
            acc = sum(
                _tdiv(w * r[u], w_out[u])
                for u, w in ((u, edges[u][v]) for u in edges[v])
            )
            nxt[v] = 150 + _tdiv(850 * acc, 1000)
        r = nxt
    order = sorted(edges, key=lambda t: (-r[t], t))
    pos = {t: i + 1 for i, t in enumerate(order)}

    out = (
        load_all()["textrank_keywords"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == len(edges)
    for row in out.itertuples():
        t = row.tok
        assert int(row.degree) == len(edges[t])
        assert int(row.w_out) == w_out[t]
        assert int(row.rank_milli) == r[t]
        assert int(row.kw_pos) == pos[t]
    # the damping floor and mass conservation keep ranks in a sane band
    assert all(150 <= v for v in r.values())
