"""Invariants for the synthetic-partsupp TPC-H completion (Q2/Q9/Q11/Q20)
and the Gopher repetition rules — independent python references beside
the cross-engine parity the sweep provides.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from tree_sitter_analyzer_spark import queries_relational as qrel
from tree_sitter_analyzer_spark.operators import textstats

from .conftest import SF_TINY


def test_partsupp_shape(spark):
    """Exactly 4 DISTINCT suppliers per part, keys in range, attributes
    bounded — at every tested scale the synthetic stays 4·|part| rows."""
    for sf in (SF_TINY, "/root/testdata/sf0.01"):
        ps = qrel._partsupp(spark, sf).toPandas()
        n_part = len(pd.read_parquet(f"{sf}/part.parquet"))
        n_supp = len(pd.read_parquet(f"{sf}/supplier.parquet"))
        assert len(ps) == 4 * n_part
        per_part = ps.groupby("ps_partkey").ps_suppkey.nunique()
        assert (per_part == 4).all(), "collision in the supplier stride"
        assert ps.ps_suppkey.between(0, n_supp - 1).all()
        assert ps.ps_availqty.between(1, 5000).all()
        assert ps.ps_supplycost_cents.between(100, 99999).all()


def test_min_cost_supplier_is_minimum(spark):
    """Every reported (part, supplier) row carries that part's true
    minimum cost among region suppliers — recomputed in pandas."""
    got = qrel.q_min_cost_supplier(spark, SF_TINY).toPandas()
    ps = qrel._partsupp(spark, SF_TINY).toPandas()
    sup = pd.read_parquet(f"{SF_TINY}/supplier.parquet")
    nat = pd.read_parquet(f"{SF_TINY}/nation.parquet")
    reg = pd.read_parquet(f"{SF_TINY}/region.parquet")
    part = pd.read_parquet(f"{SF_TINY}/part.parquet")
    eur = reg[reg.r_name == "EUROPE"].r_regionkey.iloc[0]
    eur_sups = set(
        sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .loc[lambda d: d.n_regionkey == eur, "s_suppkey"]
    )
    sel_parts = set(
        part[(part.p_size <= 3) & (part.p_type == "ECONOMY")].p_partkey
    )
    cand = ps[
        ps.ps_partkey.isin(sel_parts) & ps.ps_suppkey.isin(eur_sups)
    ]
    want_min = cand.groupby("ps_partkey").ps_supplycost_cents.min()
    assert set(got.p_partkey) == set(want_min.index)
    for r in got.itertuples(index=False):
        assert r.cost_cents == want_min[r.p_partkey]
        assert r.s_suppkey in eur_sups


def test_product_profit_totals(spark):
    """Total profit over all groups equals the pandas recompute from the
    raw joined frame (revenue cents minus cost·qty)."""
    got = qrel.q_product_profit(spark, SF_TINY).toPandas()
    ps = qrel._partsupp(spark, SF_TINY).toPandas()
    li = pd.read_parquet(f"{SF_TINY}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_TINY}/part.parquet")
    widgets = set(part[part.p_name.str.contains("widget")].p_partkey)
    j = li[li.l_partkey.isin(widgets)].merge(
        ps,
        left_on=["l_partkey", "l_suppkey"],
        right_on=["ps_partkey", "ps_suppkey"],
    )
    import numpy as np

    rev = np.floor(j.l_extendedprice * (1 - j.l_discount) * 100).astype(
        "int64"
    )
    cost = (j.ps_supplycost_cents * j.l_quantity.astype("int64")).astype(
        "int64"
    )
    assert int(got.profit_cents.sum()) == int((rev - cost).sum())
    assert len(got) > 0


def test_stock_value_share_threshold(spark):
    """Every returned part clears the cross-multiplied threshold, and no
    returned value exceeds the recomputed per-part maximum."""
    got = qrel.q_stock_value_share(spark, SF_TINY).toPandas()
    assert len(got) > 0
    ps = qrel._partsupp(spark, SF_TINY).toPandas()
    sup = pd.read_parquet(f"{SF_TINY}/supplier.parquet")
    nat = pd.read_parquet(f"{SF_TINY}/nation.parquet")
    reg = pd.read_parquet(f"{SF_TINY}/region.parquet")
    asia = reg[reg.r_name == "ASIA"].r_regionkey.iloc[0]
    asia_sups = set(
        sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .loc[lambda d: d.n_regionkey == asia, "s_suppkey"]
    )
    sv = (
        ps[ps.ps_suppkey.isin(asia_sups)]
        .assign(v=lambda d: d.ps_supplycost_cents * d.ps_availqty)
        .groupby("ps_partkey")
        .v.sum()
    )
    total = int(sv.sum())
    want = {k: int(v) for k, v in sv.items() if 2000 * v > total}
    assert dict(zip(got.ps_partkey, got.value_cents)) == want


def test_excess_stock_definition(spark):
    """Each reported supplier's n_excess_parts equals the pandas recount
    of (large-part, pair-shipped, availqty > 2·shipped) hits."""
    got = qrel.q_excess_stock_suppliers(spark, SF_TINY).toPandas()
    assert len(got) > 0
    ps = qrel._partsupp(spark, SF_TINY).toPandas()
    li = pd.read_parquet(f"{SF_TINY}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_TINY}/part.parquet")
    large = set(part[part.p_name.str.startswith("large")].p_partkey)
    shipped = (
        li[li.l_shipdate >= "1996-01-01"]
        .assign(q=lambda d: d.l_quantity.astype("int64"))
        .groupby(["l_partkey", "l_suppkey"])
        .q.sum()
    )
    hits = Counter()
    for r in ps.itertuples(index=False):
        if r.ps_partkey not in large:
            continue
        key = (r.ps_partkey, r.ps_suppkey)
        if key in shipped.index and r.ps_availqty > 2 * shipped[key]:
            hits[r.ps_suppkey] += 1
    assert dict(zip(got.s_suppkey, got.n_excess_parts)) == dict(hits)


def test_repetition_python_reference(spark):
    """Exact recompute of top2/top3/rep5 milli fractions in pure python
    for every document."""
    got = (
        textstats.repetition_stats(
            spark.read.parquet(f"{SF_TINY}/documents.parquet")
        )
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF_TINY}/documents.parquet")
    assert len(got) == len(docs)
    both_classes = set()
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        g2 = Counter(zip(toks, toks[1:]))
        g3 = Counter(zip(toks, toks[1:], toks[2:]))
        g5 = Counter(zip(*(toks[i:] for i in range(5))))
        top2 = (1000 * 2 * max(g2.values())) // n if g2 else 0
        top3 = (1000 * 3 * max(g3.values())) // n if g3 else 0
        n5 = sum(g5.values())
        rep5 = (1000 * (n5 - len(g5))) // n5 if n5 else 0
        row = got.loc[doc_id]
        assert (row.n_tokens, row.top2_milli, row.top3_milli, row.rep5_milli) == (
            n, top2, top3, rep5,
        ), f"doc {doc_id}"
        want_pass = (
            top2 <= textstats.GOPHER_TOP2_MAX_MILLI
            and top3 <= textstats.GOPHER_TOP3_MAX_MILLI
            and rep5 <= textstats.GOPHER_REP5_MAX_MILLI
        )
        assert bool(row.gopher_pass) == want_pass
        both_classes.add(want_pass)
    # the synthetic corpus must exercise BOTH outcomes or the flag is
    # vacuous (the interval_join lesson applied to classifiers)
    assert both_classes == {True, False}
