"""R224-R226 batch: python replays + invariants for
contribution_bounding, markov_stationary, bigram_surprisal. Oracle
parity rides test_oracle_parity."""

from __future__ import annotations

import math

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R224
def test_contribution_bounding_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    counts = [
        int(c) for (c,) in duck.sql(
            "SELECT count(*) FROM events GROUP BY user_id"
        ).fetchall()
    ]
    total = sum(counts)
    kept = sum(min(c, 100) for c in counts)
    srt = sorted(counts)
    cum, p95 = 0, None
    for v in srt:
        cum += 1
        if p95 is None and 20 * cum >= 19 * len(srt):
            p95 = v
            break
    # crossing on the value histogram == index crossing on sorted values
    row = (
        load_all()["contribution_bounding"]
        .spark_fn(spark, SF_TINY).toPandas().iloc[0]
    )
    assert int(row.total_rows) == total
    assert int(row.kept_rows) == kept
    assert int(row.n_users) == len(counts)
    assert int(row.n_clipped_users) == sum(1 for c in counts if c > 100)
    assert int(row.max_contribution) == max(counts)
    assert int(row.p95_contribution) == p95
    assert int(row.dropped_milli) == (1000 * (total - kept)) // total
    assert int(row.kept_rows) <= int(row.total_rows)


# --------------------------------------------------------------------- R225
def test_markov_stationary_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql("""
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type, nxt, count(*) FROM seq WHERE nxt IS NOT NULL
GROUP BY 1, 2""").fetchall()
    n = {(c, x): int(v) for c, x, v in rows}
    t: dict[str, int] = {}
    for (c, _), v in n.items():
        t[c] = t.get(c, 0) + v
    states = sorted(t)
    pi = {s: 1000000 // len(states) for s in states}
    trace = {(0, s): pi[s] for s in states}
    for k in range(1, 5):
        nxt: dict[str, int] = {}
        for (c, x), v in n.items():
            nxt[x] = nxt.get(x, 0) + (pi[c] * v) // t[c]
        pi = nxt
        for s, p in pi.items():
            trace[(k, s)] = p

    out = load_all()["markov_stationary"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.iteration), r.state): int(r.pi_micro)
        for r in out.itertuples()
    }
    assert got == trace
    # mass conservation up to the documented floor leak: one floor per
    # TRANSITION term per step (<= 25 micro on the 5x5 chain)
    for k in range(5):
        mass = sum(v for (it, _), v in got.items() if it == k)
        assert 1000000 - 25 * k <= mass <= 1000000


# --------------------------------------------------------------------- R226
def test_bigram_surprisal_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    toks = {int(d): [w for w in txt.split(" ") if w] for d, txt in docs}
    c2: dict[tuple[str, str], int] = {}
    vocab = set()
    for d, ws in toks.items():
        if d % 2 == 0:
            vocab.update(ws)
            for a, b in zip(ws, ws[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), v in c2.items():
        c1[a] = c1.get(a, 0) + v
    V = len(vocab)
    scored = []
    for d, ws in toks.items():
        if d % 2 == 0 or len(ws) < 2:
            continue
        s = sum(
            math.floor(1e6 * math.log(
                (c1.get(a, 0) + V) / (c2.get((a, b), 0) + 1)))
            for a, b in zip(ws, ws[1:])
        )
        nb = len(ws) - 1
        scored.append((-(s // nb), d, nb, s))
    scored.sort()
    want = {
        rank: (d, nb, s, -neg)
        for rank, (neg, d, nb, s) in enumerate(scored[:15], 1)
    }
    out = load_all()["bigram_surprisal"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.rank): (
            int(r.doc_id), int(r.n_bigrams), int(r.sur_micro),
            int(r.per_tok_micro),
        )
        for r in out.itertuples()
    }
    assert got == want
    # per-token surprisal is non-increasing down the ranking
    vals = [got[r][3] for r in sorted(got)]
    assert vals == sorted(vals, reverse=True)
