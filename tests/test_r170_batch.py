"""R170-R171: python replays for decile_drift and langid_agreement.
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


def test_decile_drift_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT o_orderkey, CAST(floor(o_totalprice * 100e0) AS BIGINT),"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', o_orderdate)"
        " // 86400000000 FROM orders"
    ).fetchall()
    days = [d for _, _, d in rows]
    mid = (min(days) + max(days) + 1) // 2
    train = sorted(
        (c, k) for k, c, d in rows if d < mid
    )
    n = len(train)
    edges = [train[(i * n) // 10 - 1][0] for i in range(1, 10)]

    def bucket(c):
        return sum(1 for e in edges if c > e)

    ht, hs = [0] * 10, [0] * 10
    for k, c, d in rows:
        (ht if d < mid else hs)[bucket(c)] += 1
    nt, ns = sum(ht), sum(hs)
    sum_abs = sum(abs(ht[b] * ns - hs[b] * nt) for b in range(10))
    tv = (500 * sum_abs) // (nt * ns)

    q = load_all()["decile_drift"]
    got = q.spark_fn(spark, SF_TINY).toPandas()
    gm = {
        int(r.bucket): (int(r.n_train), int(r.n_serve),
                        int(r.dshare_abs_pm), int(r.tv_pm))
        for r in got.itertuples()
    }
    for b in range(10):
        dd = (1000 * abs(ht[b] * ns - hs[b] * nt)) // (nt * ns)
        assert gm[b] == (ht[b], hs[b], dd, tv)
    # train deciles are even by construction (edges frozen on train)
    assert max(ht) - min(ht) <= 1
    # real drift exists between the two halves
    assert tv > 0


def test_langid_agreement_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.textstats import (
        LANG_MARKERS, langid_agreement,
    )

    register_views(duck, SF_TINY)
    rows = duck.sql("SELECT lang, text FROM documents").fetchall()
    langs = list(LANG_MARKERS)
    n, agree = 0, 0
    rmarg: dict[str, int] = {}
    cmarg: dict[str, int] = {}
    for lang, text in rows:
        ws = [w for w in text.split(" ") if w]
        ev = {
            lg: sum(1 for w in ws if w in set(LANG_MARKERS[lg]))
            for lg in langs
        }
        best = max(ev.values())
        guess = "unknown"
        if best > 0:
            guess = next(lg for lg in langs if ev[lg] == best)
        n += 1
        agree += lang == guess
        rmarg[lang] = rmarg.get(lang, 0) + 1
        cmarg[guess] = cmarg.get(guess, 0) + 1
    rc = sum(r * cmarg.get(k, 0) for k, r in rmarg.items())

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = langid_agreement(docs).toPandas().iloc[0]
    assert int(got.n) == n
    assert int(got.n_agree) == agree
    assert int(got.po_pm) == 1000 * agree // n
    assert int(got.pe_pm) == 1000 * rc // (n * n)
    num = n * agree - rc
    assert int(got.kappa_sign) == (1 if num >= 0 else -1)
    assert int(got.kappa_abs_pm) == 1000 * abs(num) // (n * n - rc)
