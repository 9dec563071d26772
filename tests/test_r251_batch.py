"""R251-R253 batch: python replays + invariants for ngram_novelty,
seq_patterns, kfold_eval. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views


def _isqrt_exact(v: int) -> int:
    s0 = math.floor(math.sqrt(float(v)))
    if (s0 + 1) * (s0 + 1) <= v:
        return s0 + 1
    if s0 * s0 > v:
        return s0 - 1
    return s0


# --------------------------------------------------------------------- R251
def test_ngram_novelty_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT doc_id, source, text FROM documents"
    ).fetchall()
    doc_grams: dict[int, set] = {}
    doc_src: dict[int, str] = {}
    df: Counter = Counter()
    for did, src, text in rows:
        toks = [t for t in text.split(" ") if t]
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        doc_grams[did] = grams
        doc_src[did] = src
        for g in grams:
            df[g] += 1

    out = load_all()["ngram_novelty"].spark_fn(spark, SF_TINY).toPandas()
    by_src: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for did, grams in doc_grams.items():
        if grams:
            uniq = sum(1 for g in grams if df[g] == 1)
            by_src[doc_src[did]].append((len(grams), uniq))
    assert set(out.source) == set(by_src)
    for r in out.itertuples():
        docs = by_src[r.source]
        gs = sum(g for g, _ in docs)
        us = sum(u for _, u in docs)
        assert int(r.n_docs) == len(docs)
        assert int(r.grams) == gs and int(r.unique_grams) == us
        assert int(r.novelty_milli) == (1000 * us) // gs
        assert int(r.mean_doc_novelty_milli) == sum(
            (1000 * u) // g for g, u in docs
        ) // len(docs)
        # tiny shared vocabulary → most 3-grams recur across docs
        assert int(r.novelty_milli) < 900


# --------------------------------------------------------------------- R252
def test_seq_patterns_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts,"
        " event_id"
    ).fetchall()
    seqs: dict[int, list[str]] = defaultdict(list)
    for uid, et in rows:
        seqs[uid].append(et)
    support: Counter = Counter()
    users_with: Counter = Counter()
    for _, s in seqs.items():
        types = set(s)
        for t in types:
            users_with[t] += 1
        for a in types:
            for b in types:
                if a != b:
                    # any-gap: some A strictly before some B
                    first_a = s.index(a)
                    last_b = len(s) - 1 - s[::-1].index(b)
                    if first_a < last_b:
                        support[(a, b)] += 1

    out = load_all()["seq_patterns"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 20  # 5 types, all ordered pairs present
    for r in out.itertuples():
        sup = support[(r.a, r.b)]
        assert int(r.support) == sup
        assert int(r.users_with_a) == users_with[r.a]
        assert int(r.conf_milli) == (1000 * sup) // users_with[r.a]
    # any-gap support dominates adjacent-transition support by
    # construction; with long sequences confidence should be high
    assert out.conf_milli.median() > 500


# --------------------------------------------------------------------- R253
def test_kfold_eval_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag, l_orderkey % 5, "
        "CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT) "
        "FROM lineitem"
    ).fetchall()
    cells: dict[tuple, list[int]] = defaultdict(lambda: [0, 0, 0])
    for flag, fold, d in rows:
        c = cells[(flag, fold)]
        c[0] += 1
        c[1] += d
        c[2] += d * d
    tot: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for (flag, _), (n, sd, _) in cells.items():
        tot[flag][0] += n
        tot[flag][1] += sd

    out = load_all()["kfold_eval"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(cells) == 15
    for r in out.itertuples():
        n, sd, sd2 = cells[(r.flag, int(r.fold))]
        nt, st = tot[r.flag]
        m = (st - sd) // (nt - n)
        sse = sd2 - 2 * m * sd + n * m * m
        assert int(r.n_test) == n
        assert int(r.train_mean_dollars) == m
        assert int(r.rmse_dollars) == _isqrt_exact(sse // n)
        # the train-mean model is unbiased-ish: RMSE is of the same
        # order as the (huge) revenue spread, not near zero
        assert int(r.rmse_dollars) > 0
    # folds agree to within a few percent on RMSE (homogeneous folds)
    for flag, grp in out.groupby("flag"):
        lo, hi = grp.rmse_dollars.min(), grp.rmse_dollars.max()
        assert hi - lo < hi // 5
