"""R164-R165: python replays for rendezvous_audit (incl. the HRW
monotonicity proof witness) and ab_test_harness. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

import duckdb

from .conftest import SF_TINY, register_views


def test_rendezvous_matches_python_replay_and_hrw_monotonicity(spark):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.packing import (
        RDV_N, rendezvous_audit,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM '{SF_TINY}/documents.parquet'"
        ).fetchall()
    ]
    con.close()

    def assign(doc_id, n):
        return max(
            (md5int_py(f"s{s}#{doc_id}") * 16 + s) for s in range(n)
        ) % 16

    a8 = {d: assign(d, RDV_N) for d in ids}
    a9 = {d: assign(d, RDV_N + 1) for d in ids}
    moved = sum(1 for d in ids if a8[d] != a9[d])
    # HRW monotonicity: every moved key moved TO the new shard
    assert all(a9[d] == RDV_N for d in ids if a8[d] != a9[d])
    loads = {}
    for d in ids:
        loads[a8[d]] = loads.get(a8[d], 0) + 1

    q = load_all()["rendezvous_audit"]
    got = q.spark_fn(spark, SF_TINY).toPandas().iloc[0]
    assert int(got.n_keys) == len(ids)
    assert int(got.moved) == moved
    assert int(got.moved_not_to_new) == 0
    assert int(got.max_load) == max(loads.values())
    assert int(got.min_load) == min(loads.values())
    assert int(got.churn_pm) == 1000 * moved // len(ids)
    # churn is in the ballpark of the theoretical 1/(N+1)
    assert 30 <= int(got.churn_pm) <= 350


def test_ab_harness_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT user_id, max(CASE WHEN event_type = 'purchase'"
        " AND CAST(floor(value * 100e0) AS BIGINT) >= 15000"
        " THEN 1 ELSE 0 END) FROM events GROUP BY 1"
    ).fetchall()
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for uid, c in rows:
        arm = md5int_py(str(uid)) % 2
        n[arm] += 1
        conv[arm] += c
    q = load_all()["ab_test_harness"]
    got = q.spark_fn(spark, SF_TINY).toPandas().iloc[0]
    assert (int(got.n_c), int(got.conv_c)) == (n[0], conv[0])
    assert (int(got.n_t), int(got.conv_t)) == (n[1], conv[1])
    assert int(got.rate_c_pm) == 1000 * conv[0] // n[0]
    assert int(got.rate_t_pm) == 1000 * conv[1] // n[1]
    num = conv[1] * n[0] - conv[0] * n[1]
    assert int(got.lift_sign) == (1 if num >= 0 else -1)
    assert int(got.lift_abs_pm) == 1000 * abs(num) // max(conv[0] * n[1], 1)
    assert n[0] > 0 and n[1] > 0  # both arms populated (15 users at sf0.001)
    assert 0 < conv[0] + conv[1] < n[0] + n[1]  # conversion is non-degenerate
