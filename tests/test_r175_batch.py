"""R175-R177: replays/invariants for compaction_plan, kanon_audit,
assortativity. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import duckdb

from .conftest import SF_TINY


def test_compaction_plan_matches_python_replay_and_conserves(spark):
    from tree_sitter_analyzer_spark.operators.packing import (
        COMPACT_TARGET, compaction_plan,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT source, doc_id, n_chars FROM"
        f" '{SF_TINY}/documents.parquet' ORDER BY source, doc_id"
    ).fetchall()
    con.close()
    want: dict = {}
    totals: dict = {}
    cur: dict = {}
    for src, _, sz in rows:
        before = cur.get(src, 0)
        b = before // COMPACT_TARGET
        n, t = want.get((src, b), (0, 0))
        want[(src, b)] = (n + 1, t + sz)
        cur[src] = before + sz
        totals[src] = totals.get(src, 0) + sz

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = compaction_plan(docs).toPandas()
    gm = {
        (r.source, int(r.bin)): (int(r.n_files), int(r.total_bytes))
        for r in got.itertuples()
    }
    assert gm == want
    # conservation: group bytes sum to the partition's total
    for src, tot in totals.items():
        assert sum(t for (s, _), (_, t) in gm.items() if s == src) == tot
    # fill discipline: every non-final bin ends within one file of target
    for r in got.itertuples():
        assert int(r.fill_pm) > 0


def test_kanon_audit_flags_and_totals(spark):
    from tree_sitter_analyzer_spark.operators.textstats import (
        KANON_K, KANON_L, kanon_audit,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = kanon_audit(docs).toPandas()
    assert int(got.n.sum()) == 500  # every doc lands in exactly one group
    assert ((got.k_ok == 1) == (got.n >= KANON_K)).all()
    assert ((got.l_ok == 1) == (got.n_grades >= KANON_L)).all()
    # both outcomes exist: some groups pass, some violate
    assert 0 < int((got.k_ok == 1).sum()) < len(got)


def test_assortativity_matches_python_replay_and_is_positive(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        _core_edges_sql, assortativity, core_edges_df,
    )

    und = {
        (min(a, b), max(a, b))
        for a, b in duck.sql(_core_edges_sql()).fetchall()
        if a != b
    }
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    sym = [(a, b, 0) for a, b in und] + [(b, a, 1) for a, b in und]
    rx = {
        row: i + 1
        for i, row in enumerate(
            sorted(sym, key=lambda r: (deg[r[0]], r[0], r[1], r[2]))
        )
    }
    ry = {
        row: i + 1
        for i, row in enumerate(
            sorted(sym, key=lambda r: (deg[r[1]], r[0], r[1], r[2]))
        )
    }
    m = len(sym)
    sd2 = sum((rx[r] - ry[r]) ** 2 for r in sym)
    num = 1000 * m * (m * m - 1) - 6000 * sd2
    den = m * (m * m - 1)
    got = assortativity(spark, core_edges_df(spark)).toPandas().iloc[0]
    assert int(got.m_endpoints) == m
    assert int(got.rho_sign) == (1 if num >= 0 else -1)
    assert int(got.rho_abs_milli) == abs(num) // den
    # the planted dense block makes the degree elite interconnected
    assert int(got.rho_sign) == 1 and int(got.rho_abs_milli) > 300
