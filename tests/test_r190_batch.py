"""R190-R195 batch: python replays + invariants for weighted_quantiles,
ipf_balance, deletion_cascade, packing_audit, ks_test, data_profile.
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R190
def test_weighted_quantiles_match_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag, "
        "CAST(floor(l_extendedprice * 100e0) AS BIGINT) AS cents, "
        "CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS q FROM lineitem"
    ).fetchall()
    hist: dict[str, dict[int, int]] = {}
    for flag, cents, q in rows:
        h = hist.setdefault(flag, {})
        h[int(cents)] = h.get(int(cents), 0) + int(q)
    want = {}
    for flag, h in hist.items():
        wt = sum(h.values())
        cw, p25, med, p75 = 0, None, None, None
        for cents in sorted(h):
            cw += h[cents]
            if p25 is None and 4 * cw >= wt:
                p25 = cents
            if med is None and 2 * cw >= wt:
                med = cents
            if p75 is None and 4 * cw >= 3 * wt:
                p75 = cents
        want[flag] = (wt, p25, med, p75, p75 - p25)

    q = load_all()["weighted_quantiles"]
    got = {
        r.flag: (int(r.w_total), int(r.p25_cents), int(r.median_cents),
                 int(r.p75_cents), int(r.wiqr_cents))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got == want
    # the crossing property that DEFINES the weighted median
    for flag, (wt, p25, med, p75, _) in got.items():
        assert p25 <= med <= p75
        h = hist[flag]
        cum_below = sum(q for c, q in h.items() if c < med)
        cum_at = cum_below + h[med]
        assert 2 * cum_below < wt <= 2 * cum_at


# --------------------------------------------------------------------- R191
def test_ipf_matches_python_replay_and_converges(spark):
    from tree_sitter_analyzer_spark.operators import trajectory as traj

    pings = traj.pings_df(spark, SF_TINY)
    flows = {
        (int(r.origin_cell), int(r.dest_cell)): 1000 * int(r.n_users)
        for r in traj.od_flows(pings, 7).toPandas().itertuples()
    }
    outm: dict[int, int] = {}
    inm: dict[int, int] = {}
    for (o, d), f in flows.items():
        outm[o] = outm.get(o, 0) + f
        inm[d] = inm.get(d, 0) + f
    cells = set(outm) | set(inm)
    t = {c: (outm.get(c, 0) + inm.get(c, 0)) // 2 for c in cells}

    def errs(fl):
        rs: dict[int, int] = {}
        cs: dict[int, int] = {}
        for (o, d), f in fl.items():
            rs[o] = rs.get(o, 0) + f
            cs[d] = cs.get(d, 0) + f
        tt = sum(t.values())
        re = 1000 * sum(abs(rs.get(c, 0) - t[c]) for c in t) // tt
        ce = 1000 * sum(abs(cs.get(c, 0) - t[c]) for c in t) // tt
        return re, ce, sum(fl.values())

    want = {}
    cur = dict(flows)
    for it in range(traj.IPF_ROUNDS + 1):
        re, ce, tot = errs(cur)
        want[it] = (re, ce, tot)
        if it == traj.IPF_ROUNDS:
            break
        rs: dict[int, int] = {}
        for (o, d), f in cur.items():
            rs[o] = rs.get(o, 0) + f
        cur = {
            (o, d): (f * t[o]) // rs[o] for (o, d), f in cur.items()
        }
        cs: dict[int, int] = {}
        for (o, d), f in cur.items():
            cs[d] = cs.get(d, 0) + f
        cur = {
            (o, d): (f * t[d]) // cs[d] for (o, d), f in cur.items()
        }

    got = {
        int(r.iter): (int(r.row_err_pm), int(r.col_err_pm),
                      int(r.total_milli))
        for r in traj.ipf_balance(pings).toPandas().itertuples()
    }
    assert got == want
    last = traj.IPF_ROUNDS
    # balancing genuinely improves both margins
    assert got[last][0] < got[0][0]
    assert got[last][1] < got[0][1]
    assert got[0][0] > 0  # the initial matrix is really unbalanced


# --------------------------------------------------------------------- R192
def test_deletion_cascade_closes_and_counts(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    n_del_c = duck.sql(
        "SELECT count(*) FROM customer WHERE c_custkey % 97 = 0"
    ).fetchone()[0]
    n_del_o = duck.sql(
        "SELECT count(*) FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)"
    ).fetchone()[0]

    q = load_all()["deletion_cascade"]
    got = {
        r.tbl: (int(r.n_rows), int(r.n_deleted), int(r.orphans_after))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got["customer"][1] == n_del_c > 0
    assert got["orders"][1] == n_del_o > 0
    assert got["lineitem"][1] > 0
    assert all(v[2] == 0 for v in got.values())  # the cascade closed
    # deeper tables delete at least as many rows as their parent keys
    assert got["lineitem"][1] >= got["orders"][1]


# --------------------------------------------------------------------- R193
def test_packing_audit_bounds_hold(spark):
    from tree_sitter_analyzer_spark.operators.packing import packing_audit

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = packing_audit(docs).toPandas()
    assert len(got) == 16  # every shard audited
    for r in got.itertuples():
        assert r.lb_bins <= r.n_bins <= 2 * r.lb_bins  # next-fit bound
        assert 1000 <= r.ratio_pm <= 2000
        assert 0 <= r.waste_pm < 1000


# --------------------------------------------------------------------- R194
def test_ks_test_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT c.c_mktsegment, "
        "CAST(floor(o.o_totalprice * 100e0) AS BIGINT) "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"
    ).fetchall()
    s1 = sorted(int(c) for seg, c in rows if seg == "BUILDING")
    s2 = sorted(int(c) for seg, c in rows if seg == "MACHINERY")
    n1, n2 = len(s1), len(s2)
    support = sorted(set(s1) | set(s2))
    import bisect

    dnum, at = 0, None
    for v in support:
        c1 = bisect.bisect_right(s1, v)
        c2 = bisect.bisect_right(s2, v)
        d = abs(c1 * n2 - c2 * n1)
        if d > dnum:
            dnum, at = d, v
    d_pm = (1000 * dnum) // (n1 * n2)
    reject = int(d_pm * d_pm * n1 * n2 > 1844164 * (n1 + n2))

    q = load_all()["ks_test"]
    r = q.spark_fn(spark, SF_TINY).toPandas().iloc[0]
    assert (int(r.n1), int(r.n2)) == (n1, n2)
    assert int(r.d_pm) == d_pm
    assert int(r.d_at_cents) == at
    assert int(r.reject05) == reject
    assert 0 < d_pm < 1000  # a real, non-degenerate statistic


# --------------------------------------------------------------------- R195
def test_data_profile_matches_independent_counts(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    n, nd_cust, mx = duck.sql(
        "SELECT count(*), count(DISTINCT o_custkey), max(o_orderkey) "
        "FROM orders"
    ).fetchone()

    q = load_all()["data_profile"]
    got = {
        r.col: (int(r.n_rows), int(r.n_null), int(r.n_distinct),
                r.min_s, r.max_s)
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert len(got) == 6
    assert got["o_custkey"][2] == nd_cust
    assert got["o_orderkey"][4] == str(mx)
    assert all(v[0] == n for v in got.values())
    assert got["o_orderkey"][1] == 0  # keys are complete
    assert got["o_orderkey"][2] == n  # ...and unique


# --------------------------------------------------------------------- R196
def test_shuffle_audit_contrast(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    q = load_all()["shuffle_audit"]
    got = {
        r.variant: (int(r.n_docs), int(r.n_runs), int(r.max_run))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    n = got["shuffled"][0]
    assert got["by_source"][0] == n
    # the baseline's runs ARE the per-source shares (20 sources)
    assert got["by_source"][1] == 20
    assert got["by_source"][2] == n // 20
    # the md5 order behaves like a random permutation: with 20 equal
    # sources, P(run of length >= 7 somewhere) < 1e-5
    assert got["shuffled"][2] < 7
    assert got["shuffled"][1] > got["by_source"][1] * 10


# --------------------------------------------------------------------- R197
def test_mad_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, CAST(floor(value * 100e0) AS BIGINT) "
        "FROM events"
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, c in rows:
        series.setdefault(et, []).append(int(c))

    def hist_median(vals):
        hist: dict[int, int] = {}
        for v in vals:
            hist[v] = hist.get(v, 0) + 1
        n, cw = len(vals), 0
        for v in sorted(hist):
            cw += hist[v]
            if 2 * cw >= n:
                return v

    want = {}
    for et, vals in series.items():
        med = hist_median(vals)
        mad = hist_median([abs(v - med) for v in vals])
        want[et] = (len(vals), med, mad)

    q = load_all()["mad_stats"]
    got = {
        r.event_type: (int(r.n), int(r.median_cents), int(r.mad_cents))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got == want
    assert all(v[2] > 0 for v in got.values())


# --------------------------------------------------------------------- R198
def test_chi2_dow_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT (date_diff('microsecond', TIMESTAMP '1970-01-01', ts) "
        "// 86400000000 + 4) % 7, count(*) FROM events GROUP BY 1"
    ).fetchall()
    counts = {int(d): int(c) for d, c in rows}
    n = sum(counts.values())
    chi2 = (1000 * sum((7 * o - n) ** 2 for o in counts.values())) // (7 * n)

    q = load_all()["chi2_dow"]
    r = q.spark_fn(spark, SF_TINY).toPandas().iloc[0]
    assert int(r.n_events) == n
    assert int(r.n_days_seen) == len(counts) == 7
    assert int(r.chi2_milli) == chi2
    assert int(r.reject05) == int(chi2 > 12592)


# --------------------------------------------------------------------- R199
def test_containment_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.dedup import (
        BLOCK_W, CONT_MAX_DF, CONT_MIN_PM, containment_pairs,
    )

    register_views(duck, SF_TINY)
    rows = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    blocks: dict[int, set] = {}
    for doc_id, text in rows:
        ws = [t for t in text.split(" ") if t]
        bs = {
            md5int_py(" ".join(ws[i * BLOCK_W:(i + 1) * BLOCK_W]))
            for i in range(len(ws) // BLOCK_W)
        }
        if bs:
            blocks[int(doc_id)] = bs
    df: dict[int, int] = {}
    for bs in blocks.values():
        for h in bs:
            df[h] = df.get(h, 0) + 1
    rare = {h for h, c in df.items() if c <= CONT_MAX_DF}
    inv: dict[int, list[int]] = {}
    for d, bs in blocks.items():
        for h in bs & rare:
            inv.setdefault(h, []).append(d)
    inter: dict[tuple[int, int], int] = {}
    for docs_ in inv.values():
        for a in docs_:
            for b in docs_:
                if a != b:
                    inter[(a, b)] = inter.get((a, b), 0) + 1
    want = {}
    for (a, b), n in inter.items():
        pm = (1000 * n) // len(blocks[a])
        if pm >= CONT_MIN_PM:
            want[(a, b)] = (len(blocks[a]), n, pm)

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.n_blocks_a), int(r.inter),
                                       int(r.containment_pm))
        for r in containment_pairs(docs).toPandas().itertuples()
    }
    assert got == want
    assert len(got) > 10
    # asymmetry is real: the two directions of some pair score
    # differently (|A| != |B|), or one direction fails the threshold
    assert any(
        (b, a) not in got or got[(a, b)][2] != got[(b, a)][2]
        for (a, b) in got
    )


# --------------------------------------------------------------------- R200
def test_ann_dim_audit_ladder_invariants(spark):
    from tree_sitter_analyzer_spark.operators.similarity import (
        DIMS_LADDER, ann_dim_audit,
    )

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    got = {
        int(r.dims): (int(r.matched), int(r.recall_pm))
        for r in ann_dim_audit(emb).toPandas().itertuples()
    }
    assert set(got) == set(DIMS_LADDER)
    # the full width IS the ground truth
    assert got[DIMS_LADDER[-1]] == (25, 1000)
    # truncation genuinely costs recall on this corpus
    assert all(got[d][1] < 1000 for d in DIMS_LADDER[:-1])
    assert all(0 <= got[d][0] <= 25 for d in DIMS_LADDER)


# --------------------------------------------------------------------- R201
def test_rbo_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT doc_id % 2, w, count(*) FROM ("
        "  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))"
        "    AS w FROM documents) WHERE w <> '' GROUP BY 1, 2"
    ).fetchall()
    cnt: dict[int, dict[str, int]] = {0: {}, 1: {}}
    for half, w, c in rows:
        cnt[int(half)][w] = int(c)
    K = 16
    tops = {
        h: [w for w, _ in sorted(
            cnt[h].items(), key=lambda t: (-t[1], t[0])
        )[:K]]
        for h in (0, 1)
    }
    import math
    from functools import reduce

    L = reduce(math.lcm, range(1, K + 1)) * (1 << K)
    coef = {d: L // (d * (1 << d)) for d in range(1, K + 1)}
    want, cumnum = {}, 0
    for d in range(1, K + 1):
        inter = len(set(tops[0][:d]) & set(tops[1][:d]))
        cumnum += coef[d] * inter
        denom = sum(coef[e] * e for e in range(1, d + 1))
        want[d] = (inter, (1000 * cumnum) // denom)

    q = load_all()["rbo_drift"]
    got = {
        int(r.d): (int(r.inter_d), int(r.agree_pm))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got == want
    # identity sanity on the python reference: a list vs itself is 1000
    cum, full = 0, tops[0]
    for d in range(1, K + 1):
        cum += coef[d] * d
        assert (1000 * cum) // sum(
            coef[e] * e for e in range(1, d + 1)
        ) == 1000
    assert len(full) == K


# --------------------------------------------------------------------- R202
def test_pip_annulus_partitions_outer_membership(spark):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import pip_join

    tiles = synth.tiles_df(spark, SF_TINY)
    zones = synth.zones_df(spark)
    got = pip_join.pip_annulus(tiles, zones).toPandas()
    assert (got.n_annulus + got.n_hole == got.n_outer).all()
    # the hole genuinely removes matches somewhere
    assert got.n_hole.sum() > 0
    assert (got.n_annulus > 0).any()
    # consistency with the plain PIP join: same outer pair count
    outer = pip_join.pip_join(tiles, zones, how="inner").count()
    assert int(got.n_outer.sum()) == outer


# --------------------------------------------------------------------- R203
def test_dedup_threshold_curve_is_monotone_and_anchored(spark):
    from tree_sitter_analyzer_spark.operators import dedup
    from tree_sitter_analyzer_spark.registry import load_all

    q = load_all()["dedup_threshold_curve"]
    got = {
        int(r.threshold_milli): (int(r.n_pairs), int(r.n_docs_affected))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    ts = sorted(got)
    assert ts == [500, 600, 700, 800, 900]
    for lo, hi in zip(ts, ts[1:]):
        assert got[lo][0] >= got[hi][0]
        assert got[lo][1] >= got[hi][1]
    # anchored to the ngram_jaccard operator's own pair set at t=0.5
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    assert got[500][0] == dedup.token_jaccard_pairs(docs, 500).count()
    assert got[900][0] > 0  # signal survives even the strictest knob


# --------------------------------------------------------------------- R205
def test_source_shift_diagonal_and_replay(spark, duck):
    import numpy as np

    from tree_sitter_analyzer_spark.operators.similarity import (
        QUANT, source_shift,
    )

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT d.source, e.embedding FROM embeddings e "
        "JOIN documents d ON d.doc_id = e.vec_id"
    ).fetchall()
    sums: dict[str, np.ndarray] = {}
    for src, emb in rows:
        q = np.floor(np.array(emb, dtype=np.float64) * QUANT).astype(
            np.int64
        )
        sums[src] = sums.get(src, np.zeros(64, dtype=np.int64)) + q
    want = {}
    for a in sums:
        for b in sums:
            if a <= b:
                dot = int(np.dot(sums[a], sums[b]))
                na = int(np.dot(sums[a], sums[a]))
                nb = int(np.dot(sums[b], sums[b]))
                import math

                want[(a, b)] = int(
                    math.floor(1e6 * dot / math.sqrt(float(na) * nb))
                )

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = {
        (r.source_a, r.source_b): int(r.cos_micro)
        for r in source_shift(emb, docs).toPandas().itertuples()
    }
    assert got == want
    # the diagonal IS the identity
    assert all(got[(a, b)] == 1000000 for (a, b) in got if a == b)
    assert len(got) == 20 * 21 // 2


# --------------------------------------------------------------------- R205b
def test_rrf_weights_match_formula(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    q = load_all()["rrf_fusion"]
    got = q.spark_fn(spark, SF_TINY).toPandas()
    assert len(got) == 10
    for r in got.itertuples():
        # the literal weight table IS floor(1e6/(60+rank)), both lists
        assert int(r.rrf_scaled) == (
            10**6 // (60 + int(r.r_txt)) + 10**6 // (60 + int(r.r_vec))
        )
        assert 1 <= int(r.r_txt) <= 40 and 1 <= int(r.r_vec) <= 40
    # fused order is (rrf desc, doc_id) — verify the emitted ranking
    vals = list(zip(-got.rrf_scaled, got.doc_id))
    assert vals == sorted(vals)


# --------------------------------------------------------------------- R206
def test_occ_conflict_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators import trajectory  # noqa: F401
    from tree_sitter_analyzer_spark.streaming.incremental import (
        OCC_MOD_A, OCC_MOD_B, OCC_PART, occ_conflict_audit,
    )

    register_views(duck, SF_TINY)
    ids = [r[0] for r in duck.sql("SELECT doc_id FROM documents").fetchall()]
    parts: dict[int, list[int]] = {}
    for d in ids:
        p = parts.setdefault(int(d) // OCC_PART, [0, 0])
        p[0] |= int(d) % OCC_MOD_A == 0
        p[1] |= int(d) % OCC_MOD_B == 0
    pa = sum(a for a, _ in parts.values())
    pb = sum(b for _, b in parts.values())
    nc = sum(a and b for a, b in parts.values())

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    r = occ_conflict_audit(docs).toPandas().iloc[0]
    assert (int(r.parts_total), int(r.parts_a), int(r.parts_b),
            int(r.n_conflict)) == (len(parts), pa, pb, nc)
    assert int(r.n_conflict) <= min(pa, pb)
    assert 0 < int(r.n_conflict) < len(parts)  # varied, not degenerate
    assert int(r.must_retry) == 1
