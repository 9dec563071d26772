"""R245-R247 batch: python replays + invariants for vocab_coverage,
heaps_law, watermark_detect. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views


def _doc_rows(duck):
    register_views(duck, SF_TINY)
    return duck.sql(
        "SELECT doc_id, source, text FROM documents ORDER BY doc_id"
    ).fetchall()


# --------------------------------------------------------------------- R245
def test_vocab_coverage_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    rows = _doc_rows(duck)
    tf: dict[str, Counter] = defaultdict(Counter)
    for _, src, text in rows:
        for tok in text.split(" "):
            if tok:
                tf[src][tok] += 1

    out = load_all()["vocab_coverage"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.source) == set(tf)
    for r in out.itertuples():
        c = tf[r.source]
        n = sum(c.values())
        d = len(c)
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        assert int(r.n_tokens) == n and int(r.n_types) == d
        assert int(r.f1) == f1 and int(r.f2) == f2
        assert int(r.chao1) == d + (f1 * (f1 - 1)) // (2 * (f2 + 1))
        assert int(r.gt_unseen_milli) == (1000 * f1) // n
        # the estimator never claims fewer species than observed
        assert int(r.chao1) >= d
        # unseen mass is a probability: within [0, 1000]
        assert 0 <= int(r.gt_unseen_milli) <= 1000


# --------------------------------------------------------------------- R246
def test_heaps_law_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    rows = _doc_rows(duck)
    mx = max(r[0] for r in rows) + 1
    per_bucket_tokens = Counter()
    per_bucket_docs = Counter()
    first_bucket: dict[str, int] = {}
    for did, _, text in rows:  # rows sorted by doc_id → min() semantics
        b = (did * 10) // mx
        per_bucket_docs[b] += 1
        for tok in text.split(" "):
            if tok:
                per_bucket_tokens[b] += 1
                if tok not in first_bucket:
                    first_bucket[tok] = b
    new_types = Counter(first_bucket.values())

    out = (
        load_all()["heaps_law"].spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert list(out.bucket) == sorted(per_bucket_tokens)
    cum_t = cum_v = 0
    prev_v = None
    for r in out.itertuples():
        b = int(r.bucket)
        cum_t += per_bucket_tokens[b]
        cum_v += new_types.get(b, 0)
        assert int(r.n_docs) == per_bucket_docs[b]
        assert int(r.cum_tokens) == cum_t
        assert int(r.new_types) == new_types.get(b, 0)
        assert int(r.cum_types) == cum_v
        assert int(r.type_token_milli) == (1000 * cum_v) // cum_t
        want_g = 0 if prev_v is None else (1000 * cum_v) // prev_v
        assert int(r.growth_milli) == want_g
        prev_v = cum_v
    # Heaps: the type-token ratio decays as the corpus grows (the tiny
    # synthetic vocabulary saturates early, so growth_milli itself can
    # flatline at exactly 1000 — pin the TTR decay instead).
    ttr = [int(x) for x in out.type_token_milli]
    assert ttr[-1] < ttr[0]
    g = [int(x) for x in out.growth_milli][1:]
    assert all(x >= 1000 for x in g)  # cum_types is non-decreasing


# --------------------------------------------------------------------- R247
def test_watermark_detect_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    rows = _doc_rows(duck)
    per_src: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for _, src, text in rows:
        toks = [t for t in text.split(" ") if t]
        n = g = 0
        for prev, cur in zip(toks, toks[1:]):
            n += 1
            g += md5int_py(f"{prev}|{cur}") % 4 == 0
        if n:
            per_src[src].append((n, g))

    out = load_all()["watermark_detect"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.source) == set(per_src)
    any_flagged = 0
    for r in out.itertuples():
        docs = per_src[r.source]
        z2s = [
            (1000 * (4 * g - n) ** 2) // (3 * n) if 4 * g > n else 0
            for n, g in docs
        ]
        assert int(r.n_docs) == len(docs)
        assert int(r.flagged) == sum(z >= 4000 for z in z2s)
        assert int(r.green_milli) == (
            1000 * sum(g for _, g in docs)
        ) // sum(n for n, _ in docs)
        assert int(r.mean_z2_milli) == sum(z2s) // len(docs)
        # unwatermarked corpus: green rate must sit near gamma=250 milli
        assert 150 <= int(r.green_milli) <= 350
        any_flagged += int(r.flagged)
    # the detector is roughly calibrated on unwatermarked text: the
    # shared ~30-word vocabulary makes per-doc green counts correlated
    # (not iid binomial), so allow up to 10% false positives — far
    # below what a real watermark (green rate >> gamma) would trip.
    assert any_flagged <= len(rows) // 10
