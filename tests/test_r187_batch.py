"""R187-R189 batch: python replays + invariants for block_dedup,
forecast_eval, fs_linkage. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R187
def test_block_dedup_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.dedup import (
        BLOCK_W, block_dedup,
    )

    register_views(duck, SF_TINY)
    rows = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    blocks = []  # (doc_id, blk, btxt)
    for doc_id, text in rows:
        ws = [t for t in text.split(" ") if t]
        for i in range(len(ws) // BLOCK_W):
            blocks.append(
                (int(doc_id), i,
                 " ".join(ws[i * BLOCK_W:(i + 1) * BLOCK_W]))
            )
    first = {}
    for doc_id, blk, btxt in blocks:
        key = doc_id * 1024 + blk
        if btxt not in first or key < first[btxt]:
            first[btxt] = key
    want = {}
    for doc_id, blk, btxt in blocks:
        agg = want.setdefault(doc_id, [0, 0, []])
        agg[0] += 1
        kept = first[btxt] == doc_id * 1024 + blk
        agg[1] += 0 if kept else 1
        if kept:
            agg[2].append((blk, btxt))
    expect = {
        d: (n, dr, (1000 * (n - dr)) // n,
            md5int_py(" ".join(t for _, t in sorted(parts))))
        for d, (n, dr, parts) in want.items()
    }

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = {
        int(r.doc_id): (int(r.n_blocks), int(r.n_dropped),
                        int(r.kept_pm), int(r.kept_md5i))
        for r in block_dedup(docs).toPandas().itertuples()
    }
    assert got == expect
    # non-vacuous: some blocks actually drop, and not everything drops
    total_drop = sum(v[1] for v in got.values())
    assert 0 < total_drop < sum(v[0] for v in got.values())
    # conservation: drops == duplicate block occurrences
    assert total_drop == len(blocks) - len(first)


# --------------------------------------------------------------------- R188
def test_forecast_eval_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, "
        "date_diff('microsecond', TIMESTAMP '1970-01-01', ts) "
        "// 86400000000 AS day FROM events"
    ).fetchall()
    daily: dict[str, dict[int, int]] = {}
    for et, day in rows:
        daily.setdefault(et, {})[int(day)] = (
            daily.get(et, {}).get(int(day), 0) + 1
        )
    want = {}
    for et, dd in daily.items():
        d0, d1 = min(dd), max(dd)
        half = d0 + (d1 - d0) // 2
        y = {d: dd.get(d, 0) for d in range(d0, d1 + 1)}
        b = sum(abs(y[d] - y[d - 1]) for d in range(d0 + 1, half + 1))
        nb = half - d0
        mu = sum(y[d] for d in range(d0, half + 1)) // (half - d0 + 1)
        test_days = range(half + 1, d1 + 1)
        na = len(list(test_days))
        a1 = sum(abs(y[d] - y[d - 1]) for d in test_days)
        a7 = sum(abs(y[d] - y[d - 7]) for d in test_days)
        am = sum(abs(y[d] - mu) for d in test_days)
        for model, a in (("naive1", a1), ("snaive7", a7),
                         ("trainmean", am)):
            want[(et, model)] = (na, (1000 * a * nb) // (na * max(b, 1)))

    q = load_all()["forecast_eval"]
    got = {
        (r.event_type, r.model): (int(r.n_test), int(r.mase_pm))
        for r in q.spark_fn(spark, SF_TINY).toPandas().itertuples()
    }
    assert got == want
    assert len(got) == 15  # 5 types x 3 models


# --------------------------------------------------------------------- R189
def test_fs_linkage_envelope_invariants(spark):
    from tree_sitter_analyzer_spark.operators.dedup import fs_linkage

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    r = fs_linkage(docs).toPandas().iloc[0]
    n_docs, n_cand = int(r.n_docs), int(r.n_cand)
    n_true, tp, fp, fn = (int(r.n_true_cand), int(r.tp), int(r.fp),
                          int(r.fn))
    assert n_docs == 500
    assert tp + fn == n_docs            # every true pair accounted for
    assert tp <= n_true <= n_docs       # blocking can only lose truth
    assert n_true < n_docs              # the lang mutation DOES cost recall
    assert 0 < fp < 10                  # rare but present false matches
    assert fn > 0
    assert int(r.prec_pm) == 1000 * tp // (tp + fp)
    assert int(r.rec_pm) == 1000 * tp // n_docs
    assert n_cand > 10 * n_docs         # blocking yields real non-matches


def test_fs_linkage_odds_threshold_is_load_bearing(spark):
    """At an absurd odds bar nothing is declared — the declare step is
    really driven by the likelihood ratios, not by the blocking."""
    from tree_sitter_analyzer_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    original = dedup.FS_ODDS
    try:
        dedup.FS_ODDS = 10**9
        r = dedup.fs_linkage(docs).toPandas().iloc[0]
        assert int(r.tp) == 0 and int(r.fp) == 0
    finally:
        dedup.FS_ODDS = original
