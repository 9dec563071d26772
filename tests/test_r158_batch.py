"""R158-R159 batch: python replays + invariants for kmv_cardinality and
ewma_anomalies. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


def _tiles_cells(duck):
    from tree_sitter_analyzer_spark import grid, synth

    register_views(duck, SF_TINY)
    return duck.sql(
        f"{synth.oracle_ctes()} SELECT tile_kind, "
        f"{grid.cell_sql('lon', 'lat', 9)} AS cell FROM tiles"
    ).fetchall()


def test_kmv_matches_python_replay_and_is_accurate(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.sketch import (
        KMV_K, KMV_R, kmv_cardinality,
    )
    from tree_sitter_analyzer_spark import synth

    by_kind: dict[str, set] = {}
    hashes: dict[str, set] = {}
    for kind, cell in _tiles_cells(duck):
        by_kind.setdefault(kind, set()).add(cell)
        hashes.setdefault(kind, set()).add(
            (md5int_py(str(cell)) % KMV_R) + 1
        )
    want = {}
    for kind, hs in hashes.items():
        bk = sorted(hs)[:KMV_K]
        exact = len(by_kind[kind])
        est = (
            len(bk) if len(bk) < KMV_K
            else (KMV_K - 1) * KMV_R // bk[KMV_K - 1]
        )
        want[kind] = (exact, len(bk), est,
                      abs(1000 * est - 1000 * exact) // exact)

    got = kmv_cardinality(synth.tiles_df(spark, SF_TINY)).toPandas()
    gm = {
        r.tile_kind: (int(r.n_exact), int(r.n_held), int(r.kmv_est),
                      int(r.err_milli))
        for r in got.itertuples()
    }
    assert gm == want
    # k=64 keeps the estimator inside ~4 standard errors (1/sqrt(64))
    assert all(v[3] < 500 for v in gm.values())


def test_kmv_is_repartition_invariant(spark):
    from tree_sitter_analyzer_spark.operators.sketch import kmv_cardinality
    from tree_sitter_analyzer_spark import synth

    tiles = synth.tiles_df(spark, SF_TINY)
    a = kmv_cardinality(tiles.repartition(1)).toPandas()
    b = kmv_cardinality(tiles.repartition(13)).toPandas()
    key = lambda df: {
        r.tile_kind: (int(r.n_held), int(r.kmv_est))
        for r in df.itertuples()
    }
    assert key(a) == key(b)


def test_ewma_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, "
        "date_diff('microsecond', TIMESTAMP '1970-01-01', ts) "
        "  // 86400000000 AS day, count(*) AS n "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict[str, list] = {}
    for et, day, n in rows:
        series.setdefault(et, []).append((day, n))
    want = {}
    for et, sd in series.items():
        for t in range(8, len(sd)):
            day, n = sd[t]
            s = sum(sd[t - i][1] * (1 << (8 - i)) for i in range(1, 9))
            want[(et, day)] = (
                n, s // 255,
                1 if n * 255 >= s else -1,
                (1000 * abs(n * 255 - s)) // max(s, 1),
                1 if 1000 * abs(n * 255 - s) > 500 * max(s, 1) else 0,
            )
    q = load_all()["ewma_anomalies"]
    got = q.spark_fn(spark, SF_TINY).toPandas()
    gm = {
        (r.event_type, int(r.day)): (
            int(r.n), int(r.ewma_pred), int(r.dev_sign),
            int(r.dev_abs_pm), int(r.is_anomaly),
        )
        for r in got.itertuples()
    }
    assert gm == want
    # both outcome classes exist at this scale (noisy small-SF counts
    # fire the 50% rule; smooth larger SFs legitimately do not)
    assert {v[4] for v in gm.values()} == {0, 1}
