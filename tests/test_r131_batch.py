"""Independent references and structural invariants for the R131-R134
batch: 2SFCA accessibility, DSIR importance weights, Benford audit,
dedup survivor selection. Oracle parity at sf0.001 rides the
auto-discovered test_oracle_parity suite."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

from .conftest import SF_TINY


# --- R131 2SFCA ---------------------------------------------------------------


def test_2sfca_matches_python_and_conserves(spark):
    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.operators.zonal import (
        FCA_RADIUS, FCA_SUP_THR, accessibility_2sfca,
    )

    tiles = synth.tiles_df(spark, SF_TINY)
    occ = Counter()
    cells = tiles.selectExpr(
        f"{grid.ix_sql('lon', 7)} AS cx", f"{grid.iy_sql('lat', 7)} AS cy"
    ).toPandas()
    for r in cells.itertuples():
        occ[(int(r.cx), int(r.cy))] += 1

    def near(cx, cy):
        return [
            ((cx + dx, cy + dy), occ[(cx + dx, cy + dy)])
            for dx in range(-FCA_RADIUS, FCA_RADIUS + 1)
            for dy in range(-FCA_RADIUS, FCA_RADIUS + 1)
            if (cx + dx, cy + dy) in occ
        ]

    rj, dpop_sum = {}, 0
    for (cx, cy), n in occ.items():
        if n >= FCA_SUP_THR:
            dpop = sum(p for _, p in near(cx, cy))
            rj[(cx, cy)] = 10**6 * n // dpop
            dpop_sum += dpop
    expected = {}
    for (cx, cy), n in occ.items():
        sup = [rj[c] for c, _ in near(cx, cy) if c in rj]
        expected[(cx, cy)] = (n, len(sup), sum(sup))

    got = accessibility_2sfca(tiles).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert expected[(int(r.cx), int(r.cy))] == (
            int(r.pop), int(r.n_supply), int(r.a_micro),
        )
    # conservation: sum(pop_i * A_i) in (1e6*S_total - sum dpop, 1e6*S_total]
    lhs = sum(occ[c] * a for c, (_, _, a) in expected.items())
    s_total = sum(n for n in occ.values() if n >= FCA_SUP_THR)
    assert 10**6 * s_total - dpop_sum < lhs <= 10**6 * s_total
    # both outcome classes populated
    assert 0 < sum(1 for _, _, a in expected.values() if a > 0) < len(expected)


# --- R132 DSIR ----------------------------------------------------------------


def test_dsir_matches_python_reference(spark):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.textstats import (
        DSIR_BUCKETS, DSIR_HOLDOUT_MOD, DSIR_KEEP_MILLI, dsir_weights,
    )

    docs = pq.read_table(f"{SF_TINY}/documents.parquet").to_pandas()
    grams = {}
    for r in docs.itertuples():
        ts = [t for t in r.text.split(" ") if t]
        grams[r.doc_id] = [
            md5int_py(f"{a} {b}") % DSIR_BUCKETS for a, b in zip(ts, ts[1:])
        ]
    t_b: Counter = Counter()
    r_b: Counter = Counter()
    for d, gs in grams.items():
        (t_b if d % DSIR_HOLDOUT_MOD == 0 else r_b).update(gs)
    tt, rr = sum(t_b.values()), sum(r_b.values())
    lr = {
        b: 1000 * (t_b[b] + 1) * (rr + DSIR_BUCKETS)
        // ((r_b[b] + 1) * (tt + DSIR_BUCKETS))
        for b in set(t_b) | set(r_b)
    }
    got = dsir_weights(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).toPandas()
    train = {d: gs for d, gs in grams.items()
             if d % DSIR_HOLDOUT_MOD != 0 and gs}
    assert len(got) == len(train)
    for r in got.itertuples():
        gs = train[r.doc_id]
        imp = sum(lr[b] for b in gs) // len(gs)
        assert (int(r.n_grams), int(r.imp_milli)) == (len(gs), imp), r.doc_id
        assert bool(r.keep) == (imp >= DSIR_KEEP_MILLI)
    keeps = got["keep"].sum()
    assert 0 < keeps < len(got)


# --- R133 Benford -------------------------------------------------------------


def test_benford_audit_structure(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    got = (
        load_all()["benford_audit"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert sorted(got["digit"]) == [str(d) for d in range(1, 10)]
    assert got["exp_milli"].sum() == 995  # sum of the floored literals
    # floor truncation loses < 1 milli per digit
    assert 991 <= got["obs_milli"].sum() <= 1000
    assert (got["dev_milli"] == (got["obs_milli"] - got["exp_milli"]).abs()).all()
    # amounts are uniform-ish, not Benford: the audit must actually flag it
    assert got["dev_milli"].max() > 50


# --- R134 survivors -----------------------------------------------------------


def test_survivors_consistent_with_clusters(spark):
    from tree_sitter_analyzer_spark.operators.textstats import text_stats
    from tree_sitter_analyzer_spark.registry import load_all

    qs = load_all()
    surv = qs["dedup_survivors"].spark_fn(spark, SF_TINY).toPandas()
    clus = qs["dedup_clusters"].spark_fn(spark, SF_TINY).toPandas()
    # same clusters, same sizes as the min-id clustering query
    a = surv[["cluster_id", "n_docs"]].sort_values("cluster_id",
                                                   ignore_index=True)
    b = clus[["cluster_id", "n_docs"]].sort_values("cluster_id",
                                                   ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    q = text_stats(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).toPandas().set_index("doc_id")["quality"]
    for r in surv.itertuples():
        assert r.n_dups == r.n_docs - 1 >= 1
        assert q[r.survivor_doc_id] == r.survivor_quality
        # the survivor is at least as good as the min-id representative
        assert r.survivor_quality >= q[r.cluster_id]
