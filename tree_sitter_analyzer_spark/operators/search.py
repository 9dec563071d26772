"""Ranked text search: token-overlap prefilter → cosine rerank (T1/T6).

Re-expresses the reference's two-phase semantic search
(``semantic_search.py:26-60``: BM25 narrows the pool, token-vector cosine
reranks) over document text:

1. candidate phase — inverted-index style: explode query terms, join on
   token equality, score candidates by matched-term count with an
   IDF-like weight (rarer tokens score higher);
2. over-fetch k·4 candidates (the reference's ``k*4 (min k+50)`` rule,
   ``_ast_cache_query.py:169-175``);
3. exact rerank — quantized cosine over full token-count vectors
   (intersection-weighted dot product), then ``row_number() <= k``.

Everything is joins + window functions — token-equality joins ARE the
inverted index at scale (shuffle co-partitions by token; hot tokens are
the skew case → stopword-style frequency cap, the reference's noise
blacklist P5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tokens appearing in more than this fraction of docs carry no signal —
# the noise-symbol suppression analog (_codegraph_query_selection.py:24-47).
MAX_DOC_FREQ = 0.5


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf) term frequencies."""
    return (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )


def search_captions(
    docs: DataFrame, query: str, k: int = 10, overfetch: int = 4
) -> DataFrame:
    """Top-k docs for a whitespace query string.

    Returns (rank, doc_id, n_matched, score_micro) — integers only, fully
    deterministic (ties → doc_id).
    """
    # Lazy corpus size: a 1-row aggregate cross-joined in, NOT an eager
    # docs.count() — building a search plan must trigger no Spark jobs
    # (the chain surface composes .search() at plan-build time; --explain
    # must not execute). floor() on BOTH engines: bare CAST would diverge
    # for odd n_docs (CAST rounds in DuckDB).
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    toks = _doc_tokens(docs)
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    toks = (
        toks.join(df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .where(
            F.col("df")
            <= F.expr(f"CAST(floor({MAX_DOC_FREQ}e0 * n_docs) AS BIGINT)")
        )
        .drop("n_docs")
    )
    # Three downstream subtrees (candidates, norms, query dots) read toks;
    # without a lineage barrier each re-runs tokenize+explode+df-join
    # (Catalyst does not CSE across action subtrees).
    toks = toks.localCheckpoint(eager=False)

    q_terms = sorted(set(t for t in query.split() if t))
    qdf = docs.sparkSession.createDataFrame(
        [(t,) for t in q_terms], "tok string"
    )

    # phase 1: candidate scoring by rarity-weighted matched-term count.
    cand = (
        toks.join(F.broadcast(qdf), "tok")
        # reciprocal-df weight instead of ln-IDF: same monotonicity, but
        # pure rational arithmetic — ln() can differ by 1 ulp between the
        # JVM and libm, which would break cross-engine floor() parity.
        .withColumn("idf_milli", F.expr("CAST(floor(1000000e0 / df) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum(F.col("idf_milli") * F.col("tf")).alias("prescore"),
        )
    )
    pool = cand.orderBy(F.desc("prescore"), "doc_id").limit(max(k * overfetch, k + 50))

    # phase 2: exact rerank — cosine between the query's term-count vector
    # (all 1s) and the doc's tf vector restricted to query terms, against
    # the doc's full tf norm. Quantized to micro units.
    doc_norm = toks.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm2")
    )
    dots = (
        toks.join(F.broadcast(qdf), "tok")
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dot"))
    )
    reranked = (
        pool.join(dots, "doc_id")
        .join(doc_norm, "doc_id")
        .withColumn(
            "score_micro",
            F.expr(
                f"CAST(floor(1e6 * dot / sqrt(CAST(norm2 AS DOUBLE) * {len(q_terms)}e0)) AS BIGINT)"
            ),
        )
    )
    win = Window.orderBy(F.desc("score_micro"), "doc_id")
    return (
        reranked.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(F.col("rank").cast("bigint").alias("rank"), "doc_id", "n_matched", "score_micro")
    )


def search_captions_oracle(query: str, k: int = 10, overfetch: int = 4) -> str:
    q_terms = sorted(set(t for t in query.split() if t))
    q_values = ", ".join(f"('{t}')" for t in q_terms)
    pool_n = max(k * overfetch, k + 50)
    return f"""
WITH toks_raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
toks0 AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks_raw WHERE tok <> ''
  GROUP BY doc_id, tok
),
n AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks0 GROUP BY tok),
toks AS (
  SELECT t.doc_id, t.tok, t.tf, d.df FROM toks0 t JOIN dfreq d USING (tok)
  WHERE d.df <= (SELECT CAST(floor({MAX_DOC_FREQ}e0 * n_docs) AS BIGINT) FROM n)
),
qterms(tok) AS (VALUES {q_values}),
cand AS (
  SELECT doc_id, count(*) AS n_matched,
         sum(CAST(floor(1000000e0 / df) AS BIGINT) * tf) AS prescore
  FROM toks JOIN qterms USING (tok) GROUP BY doc_id
),
pool AS (SELECT * FROM cand ORDER BY prescore DESC, doc_id LIMIT {pool_n}),
doc_norm AS (SELECT doc_id, sum(tf * tf) AS norm2 FROM toks GROUP BY doc_id),
dots AS (
  SELECT doc_id, sum(tf) AS dot FROM toks JOIN qterms USING (tok) GROUP BY doc_id
)
SELECT rank, doc_id, n_matched, score_micro FROM (
  SELECT p.doc_id, p.n_matched,
         CAST(floor(1e6 * d.dot / sqrt(CAST(nm.norm2 AS DOUBLE) * {len(q_terms)}e0)) AS BIGINT)
           AS score_micro,
         row_number() OVER (
           ORDER BY CAST(floor(1e6 * d.dot / sqrt(CAST(nm.norm2 AS DOUBLE) * {len(q_terms)}e0)) AS BIGINT) DESC,
                    p.doc_id) AS rank
  FROM pool p JOIN dots d USING (doc_id) JOIN doc_norm nm USING (doc_id)
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# R117: BM25 ranked retrieval — the reference's first-phase ranking
# function (semantic_search.py BM25 pool) made exact and cross-engine.
#
# Okapi BM25 with k1 = 6/5, b = 3/4, spelled ENTIRELY in integer rational
# arithmetic so DuckDB reproduces it bit-for-bit: with avgdl_milli =
# (1000·TL) DIV N, the per-term saturation tf·(k1+1)/(tf + k1(1−b) +
# k1·b·dl/avgdl) cross-multiplies to
#     (22·tf·avgdl_milli) / (10·tf·avgdl_milli + 3·avgdl_milli + 9000·dl)
# and the IDF is the same reciprocal-df weight as caption_search
# (1000000 DIV df — ln() is engine-divergent at the ulp level). Using
# avgdl (not TL) keeps every intermediate bounded by DOCUMENT lengths —
# magnitudes never grow with corpus size, so the integer forms hold at
# any N.
# ---------------------------------------------------------------------------


def bm25_search(docs: DataFrame, query: str, k: int = 10) -> DataFrame:
    """Top-k docs by integer BM25: (rank, doc_id, n_matched, bm25_micro).

    Scale shape: the candidate set is the union of the query terms'
    posting lists (token equi-join = the inverted index), per-doc length
    and df frames are two rollups of the same token frame, and only
    candidates are scored — the corpus is never ranked wholesale.
    """
    toks0 = _doc_tokens(docs).localCheckpoint(eager=False)
    dl = toks0.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.expr("(1000 * sum(dl)) DIV count(*)").alias("avgdl_milli"),
    )
    dfreq = toks0.groupBy("tok").agg(F.count("*").alias("df"))
    q_terms = sorted(set(t for t in query.split() if t))
    qdf = docs.sparkSession.createDataFrame([(t,) for t in q_terms], "tok string")
    scored = (
        toks0.join(F.broadcast(qdf), "tok")
        .join(dfreq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .where(
            F.col("df")
            <= F.expr(f"CAST(floor({MAX_DOC_FREQ}e0 * n_docs) AS BIGINT)")
        )
        .withColumn(
            "term_micro",
            F.expr(
                "((1000000 DIV df) * (22 * tf * avgdl_milli))"
                " DIV (10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl)"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum("term_micro").alias("bm25_micro"),
        )
    )
    w = Window.orderBy(F.desc("bm25_micro"), "doc_id")
    return (
        scored.orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "n_matched", "bm25_micro")
    )


def bm25_oracle(query: str, k: int = 10) -> str:
    q_terms = sorted(set(t for t in query.split() if t))
    q_values = ", ".join(f"('{t}')" for t in q_terms)
    return f"""
WITH bm_raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
bm_toks AS (
  SELECT doc_id, tok, count(*) AS tf FROM bm_raw WHERE tok <> ''
  GROUP BY doc_id, tok
),
bm_dl AS (SELECT doc_id, sum(tf) AS dl FROM bm_toks GROUP BY doc_id),
bm_stats AS (
  SELECT count(*) AS n_docs, (1000 * sum(dl)) // count(*) AS avgdl_milli
  FROM bm_dl),
bm_df AS (SELECT tok, count(*) AS df FROM bm_toks GROUP BY tok),
bm_q(tok) AS (VALUES {q_values}),
bm_scored AS (
  SELECT t.doc_id, count(*) AS n_matched,
         sum(((1000000 // d.df) * (22 * t.tf * s.avgdl_milli))
             // (10 * t.tf * s.avgdl_milli + 3 * s.avgdl_milli
                 + 9000 * l.dl)) AS bm25_micro
  FROM bm_toks t
  JOIN bm_q USING (tok)
  JOIN bm_df d USING (tok)
  JOIN bm_dl l USING (doc_id)
  CROSS JOIN bm_stats s
  WHERE d.df <= CAST(floor({MAX_DOC_FREQ}e0 * s.n_docs) AS BIGINT)
  GROUP BY t.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS INT)
         AS rank,
       doc_id, n_matched, bm25_micro
FROM bm_scored
ORDER BY bm25_micro DESC, doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# R123: MMR diversified retrieval (Carbonell & Goldstein 1998, public) —
# the de-duplicating reranker every retrieval stack needs: after the
# BM25 pool, pick k docs greedily by
#     mmr = 7·rel_milli − 3·max_{s in selected} jac_milli(c, s)
# (λ = 0.7 cross-multiplied to integers; rel_milli = 1000·bm25 DIV pool
# max; similarity = exact distinct-token Jaccard in milli). Ties break
# by doc_id, so the greedy sequence is fully deterministic and the
# DuckDB oracle replicates it with k unrolled pick CTEs (the kcore
# chained-CTE discipline; sims MATERIALIZED against re-inlining).
# Scale: stage 1 (BM25 pool) is the distributed part; the rerank
# operates on the POOL×POOL bounded frame (40×40) — standard two-stage
# retrieval, never corpus-wide.
# ---------------------------------------------------------------------------

MMR_POOL = 40
MMR_K = 8
MMR_LAMBDA_NUM = 7   # score = 7·rel − 3·maxsim (λ=0.7, integer)
MMR_LAMBDA_DEN = 3


def mmr_search(
    docs: DataFrame, query: str, k: int = MMR_K, pool_n: int = MMR_POOL
) -> DataFrame:
    """(rank, doc_id, rel_milli, max_sim_milli, mmr_score): greedy MMR
    selection over the BM25 top-``pool_n`` pool."""
    pool0 = bm25_search(docs, query, pool_n).localCheckpoint(eager=True)
    pmax = pool0.agg(F.max("bm25_micro").alias("m"))
    pool = (
        pool0.crossJoin(F.broadcast(pmax))
        .selectExpr("doc_id", "(1000 * bm25_micro) DIV m AS rel_milli")
        .localCheckpoint(eager=True)
    )
    # exact distinct-token Jaccard inside the pool (both directions)
    ptoks = (
        _doc_tokens(docs)
        .join(F.broadcast(pool.select("doc_id")), "doc_id")
        .select("doc_id", "tok")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = ptoks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    inter = (
        ptoks.alias("x")
        .join(ptoks.alias("y"), "tok")
        .where(F.expr("x.doc_id != y.doc_id"))
        .groupBy(
            F.expr("x.doc_id").alias("a_id"), F.expr("y.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("inter"))
    )
    sims = (
        inter.join(
            sizes.select(F.col("doc_id").alias("a_id"), F.col("n_tok").alias("na")),
            "a_id",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b_id"), F.col("n_tok").alias("nb")),
            "b_id",
        )
        .selectExpr(
            "a_id", "b_id", "(1000 * inter) DIV (na + nb - inter) AS jac_milli"
        )
        .localCheckpoint(eager=True)
    )
    selected = None
    for rank in range(1, k + 1):
        rem = (
            pool
            if selected is None
            else pool.join(selected.select("doc_id"), "doc_id", "left_anti")
        )
        if selected is None:
            msim = rem.withColumn("max_sim_milli", F.lit(0).cast("bigint"))
        else:
            hit = (
                sims.join(
                    selected.select(F.col("doc_id").alias("b_id")), "b_id"
                )
                .groupBy(F.col("a_id").alias("doc_id"))
                .agg(F.max("jac_milli").alias("ms"))
            )
            msim = rem.join(hit, "doc_id", "left").withColumn(
                "max_sim_milli", F.expr("coalesce(ms, CAST(0 AS BIGINT))")
            )
        pick = (
            msim.withColumn(
                "mmr_score",
                F.expr(
                    f"{MMR_LAMBDA_NUM} * rel_milli"
                    f" - {MMR_LAMBDA_DEN} * max_sim_milli"
                ),
            )
            .orderBy(F.desc("mmr_score"), "doc_id")
            .limit(1)
            .select(
                F.lit(rank).alias("rank"),
                "doc_id",
                "rel_milli",
                "max_sim_milli",
                "mmr_score",
            )
        )
        selected = (
            pick if selected is None else selected.unionByName(pick)
        ).localCheckpoint(eager=True)
    return selected


def mmr_oracle(
    query: str, k: int = MMR_K, pool_n: int = MMR_POOL
) -> str:
    picks = []
    for i in range(1, k + 1):
        if i == 1:
            prev_set = "SELECT CAST(NULL AS BIGINT) AS doc_id WHERE FALSE"
        else:
            prev_set = " UNION ALL ".join(
                f"SELECT doc_id FROM mmr_pick_{j}" for j in range(1, i)
            )
        picks.append(f"""mmr_prev_{i} AS MATERIALIZED ({prev_set}),
mmr_pick_{i} AS MATERIALIZED (
  SELECT {i} AS rank, c.doc_id, c.rel_milli,
         coalesce((SELECT max(s.jac_milli) FROM mmr_sims s
                   WHERE s.a_id = c.doc_id
                     AND s.b_id IN (SELECT doc_id FROM mmr_prev_{i})),
                  CAST(0 AS BIGINT)) AS max_sim_milli,
         {MMR_LAMBDA_NUM} * c.rel_milli
           - {MMR_LAMBDA_DEN} * coalesce(
               (SELECT max(s.jac_milli) FROM mmr_sims s
                WHERE s.a_id = c.doc_id
                  AND s.b_id IN (SELECT doc_id FROM mmr_prev_{i})),
               CAST(0 AS BIGINT)) AS mmr_score
  FROM mmr_pooln c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM mmr_prev_{i})
  ORDER BY mmr_score DESC, c.doc_id LIMIT 1)""")
    union = "\nUNION ALL ".join(
        f"SELECT * FROM mmr_pick_{i}" for i in range(1, k + 1)
    )
    return f"""
WITH mmr_pool AS ({bm25_oracle(query, pool_n)}),
mmr_pooln AS MATERIALIZED (
  SELECT doc_id,
         (1000 * bm25_micro) // (SELECT max(bm25_micro) FROM mmr_pool)
           AS rel_milli
  FROM mmr_pool),
mmr_toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> '' AND doc_id IN (SELECT doc_id FROM mmr_pooln)),
mmr_sizes AS (SELECT doc_id, count(*) AS n_tok FROM mmr_toks GROUP BY 1),
mmr_sims AS MATERIALIZED (
  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
         (1000 * count(*)) // (za.n_tok + zb.n_tok - count(*)) AS jac_milli
  FROM mmr_toks x
  JOIN mmr_toks y ON x.tok = y.tok AND x.doc_id != y.doc_id
  JOIN mmr_sizes za ON za.doc_id = x.doc_id
  JOIN mmr_sizes zb ON zb.doc_id = y.doc_id
  GROUP BY x.doc_id, y.doc_id, za.n_tok, zb.n_tok),
{",".join(picks)}
SELECT CAST(rank AS BIGINT) AS rank, doc_id, rel_milli, max_sim_milli,
       mmr_score
FROM ({union})"""


# ---------------------------------------------------------------------------
# R124: per-document keyword extraction — top-3 TF-IDF terms per doc
# (the keyword/tag generation stage of a corpus pipeline). Weight =
# tf · (10^6 DIV df), the same reciprocal-df integer IDF as the ranked
# searches; rank ties break by token text, so the per-doc top-3 is
# fully deterministic. Shape: token-frame groupBy (doc-keyed) + one
# df rollup broadcast back + one doc-keyed window — no corpus-wide sort.
# ---------------------------------------------------------------------------

KEYWORDS_PER_DOC = 3


def doc_keywords(docs: DataFrame, k: int = KEYWORDS_PER_DOC) -> DataFrame:
    """(doc_id, kw_rank, tok, weight): top-k TF-IDF tokens per doc."""
    toks = _doc_tokens(docs).localCheckpoint(eager=False)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("weight"), F.asc("tok")
    )
    return (
        toks.join(dfreq, "tok")
        .withColumn("weight", F.expr("tf * (1000000 DIV df)"))
        .withColumn("kw_rank", F.row_number().over(w))
        .where(F.col("kw_rank") <= k)
        .select("doc_id", "kw_rank", "tok", "weight")
    )


def doc_keywords_oracle(k: int = KEYWORDS_PER_DOC) -> str:
    return f"""
WITH kw_toks AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2),
kw_df AS (SELECT tok, count(*) AS df FROM kw_toks GROUP BY 1),
kw_w AS (
  SELECT t.doc_id, t.tok, t.tf * (1000000 // d.df) AS weight,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf * (1000000 // d.df) DESC, t.tok)
           AS kw_rank
  FROM kw_toks t JOIN kw_df d USING (tok))
SELECT doc_id, CAST(kw_rank AS INT) AS kw_rank, tok, weight
FROM kw_w WHERE kw_rank <= {k}"""


# ---------------------------------------------------------------------------
# R143: NDCG@k ranking-quality evaluation (Järvelin & Kekäläinen 2002,
# public) — the retrieval family gets its own eval operator: the BM25
# top-k is graded by an INDEPENDENT editorial label (the text_stats
# quality score, DIV 25 → grades 0-4) and the discounted gain of two
# rankers over the same pool is compared to the ideal reordering:
# 'bm25' (the ranker's order) vs 'naive' (doc_id order — retrieval
# without ranking, the control every eval needs). The 1/log2(r+1)
# discount is the one float in NDCG, so it is precomputed ONCE in Python
# as integer micro-literals shared verbatim by both engines — the
# compared result is pure integer arithmetic:
#     dcg_scaled  = Σ_r rel_r · disc_r,   disc_r = floor(1e6/log2(r+1))
#     idcg_scaled = same over rel sorted desc (order-specific tie-break;
#                   the value depends only on the sorted rel multiset)
#     ndcg_milli  = (1000 · dcg) DIV idcg
# Scale: the label join and both evaluations operate on the
# already-bounded top-k frame — O(k) regardless of corpus size.
# ---------------------------------------------------------------------------

import math as _math

from .textstats import text_stats, text_stats_oracle

NDCG_K = 10
_NDCG_DISC = [
    int(1_000_000 // _math.log2(r + 1)) for r in range(1, NDCG_K + 1)
]


def _disc_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {r} THEN {d}" for r, d in enumerate(_NDCG_DISC, start=1)
    )
    return f"(CASE {rank_col} {whens} ELSE 0 END)"


def ndcg_eval(docs: DataFrame, query: str, k: int = NDCG_K) -> DataFrame:
    """(ranker, dcg_scaled, idcg_scaled, ndcg_milli) for rankers
    'bm25' and 'naive' over the BM25 top-k pool."""
    assert k == NDCG_K, "discount table is precomputed for NDCG_K"
    top = bm25_search(docs, query, k)
    rel = text_stats(docs).selectExpr("doc_id", "quality DIV 25 AS rel")
    base = top.join(rel, "doc_id").localCheckpoint(eager=True)
    outs = []
    for ranker, order in (("bm25", "rank"), ("naive", "doc_id")):
        w = Window.orderBy(order)
        iw = Window.orderBy(F.desc("rel"), order)
        outs.append(
            base.withColumn("r", F.row_number().over(w))
            .withColumn("ir", F.row_number().over(iw))
            .selectExpr(
                f"'{ranker}' AS ranker",
                f"rel * {_disc_case('r')} AS g",
                f"rel * {_disc_case('ir')} AS ig",
            )
            .groupBy("ranker")
            .agg(
                F.sum("g").alias("dcg_scaled"),
                F.sum("ig").alias("idcg_scaled"),
            )
            .selectExpr(
                "ranker",
                "dcg_scaled",
                "idcg_scaled",
                "(1000 * dcg_scaled) DIV idcg_scaled AS ndcg_milli",
            )
        )
    return outs[0].unionByName(outs[1])


def ndcg_oracle(query: str, k: int = NDCG_K) -> str:
    assert k == NDCG_K
    rows = []
    for ranker, order in (("bm25", "rank"), ("naive", "doc_id")):
        rows.append(f"""
  SELECT '{ranker}' AS ranker,
         rel * {_disc_case(f"(row_number() OVER (ORDER BY {order}))")} AS g,
         rel * {_disc_case(
             f"(row_number() OVER (ORDER BY rel DESC, {order}))"
         )} AS ig
  FROM ndcg_base""")
    both = "\n  UNION ALL\n".join(rows)
    return f"""
WITH ndcg_top AS ({bm25_oracle(query, k)}),
ndcg_rel AS (
  SELECT doc_id, quality // 25 AS rel FROM ({text_stats_oracle()})
),
ndcg_base AS (
  SELECT t.rank, t.doc_id, r.rel
  FROM ndcg_top t JOIN ndcg_rel r USING (doc_id)
),
ndcg_rows AS ({both}
)
SELECT ranker, sum(g) AS dcg_scaled, sum(ig) AS idcg_scaled,
       (1000 * sum(g)) // sum(ig) AS ndcg_milli
FROM ndcg_rows GROUP BY ranker
"""


# ---------------------------------------------------------------------------
# R216: WAND pruning audit — how much of the posting lists the
# upper-bound heap walk (Broder 2003 "Efficient query evaluation using
# a two-level retrieval process") never has to score. Exact and
# integer: per query term the max achievable BM25 contribution over
# its posting (UB_t); the true top-k threshold theta = the k-th exact
# BM25 score; a candidate doc is WAND-skippable iff the sum of the
# UBs of the terms it matches is < theta. Emitted per term (posting
# length, UB, skippable entries) with theta and the global candidate/
# skippable counts attached. Scale: rides the same inverted-index
# token equi-join as bm25_search — posting-sized, never corpus-sized.
# ---------------------------------------------------------------------------


def wand_prune_audit(
    docs: DataFrame, query: str, k: int = 10, max_df: float = 0.9
) -> DataFrame:
    """``max_df`` is deliberately looser than bm25_search's noise cap:
    WAND exists to mix rare and common terms — the skipping win comes
    precisely from common terms' low upper bounds."""
    toks0 = _doc_tokens(docs).localCheckpoint(eager=False)
    dl = toks0.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.expr("(1000 * sum(dl)) DIV count(*)").alias("avgdl_milli"),
    )
    dfreq = toks0.groupBy("tok").agg(F.count("*").alias("df"))
    q_terms = sorted(set(t for t in query.split() if t))
    qdf = docs.sparkSession.createDataFrame(
        [(t,) for t in q_terms], "tok string"
    )
    terms = (
        toks0.join(F.broadcast(qdf), "tok")
        .join(dfreq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .where(
            F.col("df")
            <= F.expr(f"CAST(floor({max_df}e0 * n_docs) AS BIGINT)")
        )
        .withColumn(
            "term_micro",
            F.expr(
                "((1000000 DIV df) * (22 * tf * avgdl_milli))"
                " DIV (10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl)"
            ),
        )
        .select("tok", "doc_id", "df", "term_micro")
        .localCheckpoint(eager=False)
    )
    doc_scores = terms.groupBy("doc_id").agg(
        F.expr("CAST(sum(term_micro) AS BIGINT)").alias("score")
    )
    theta = (
        doc_scores.orderBy(F.desc("score"), "doc_id")
        .limit(k)
        .agg(F.expr("CAST(min(score) AS BIGINT) AS theta_micro"))
    )
    ub = terms.groupBy("tok").agg(
        F.expr("CAST(max(term_micro) AS BIGINT)").alias("ub_micro"),
        F.expr("CAST(max(df) AS BIGINT)").alias("df"),
    )
    doc_ub = (
        terms.join(ub.select("tok", "ub_micro"), "tok")
        .groupBy("doc_id")
        .agg(F.expr("CAST(sum(ub_micro) AS BIGINT)").alias("ub_sum"))
        .crossJoin(F.broadcast(theta))
        .selectExpr(
            "doc_id",
            "CASE WHEN ub_sum < theta_micro THEN 1 ELSE 0 END AS skip",
        )
        .localCheckpoint(eager=False)
    )
    glob = doc_ub.agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.expr("CAST(sum(skip) AS BIGINT) AS n_skippable"),
    )
    per_term = (
        terms.join(doc_ub, "doc_id")
        .groupBy("tok")
        .agg(F.expr("CAST(sum(skip) AS BIGINT) AS posting_skippable"))
        .join(ub, "tok")
    )
    return (
        per_term.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(glob))
        .select(
            "tok", "df", "ub_micro", "posting_skippable",
            "theta_micro", "n_candidates", "n_skippable",
        )
    )


def wand_prune_oracle(query: str, k: int = 10, max_df: float = 0.9) -> str:
    q_terms = sorted(set(t for t in query.split() if t))
    q_values = ", ".join(f"('{t}')" for t in q_terms)
    return f"""
WITH wp_raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
wp_toks AS (
  SELECT doc_id, tok, count(*) AS tf FROM wp_raw WHERE tok <> ''
  GROUP BY doc_id, tok
),
wp_dl AS (SELECT doc_id, sum(tf) AS dl FROM wp_toks GROUP BY doc_id),
wp_stats AS (
  SELECT count(*) AS n_docs, (1000 * sum(dl)) // count(*) AS avgdl_milli
  FROM wp_dl),
wp_df AS (SELECT tok, count(*) AS df FROM wp_toks GROUP BY tok),
wp_q(tok) AS (VALUES {q_values}),
wp_terms AS (
  SELECT t.tok, t.doc_id, d.df,
         ((1000000 // d.df) * (22 * t.tf * s.avgdl_milli))
           // (10 * t.tf * s.avgdl_milli + 3 * s.avgdl_milli
               + 9000 * l.dl) AS term_micro
  FROM wp_toks t
  JOIN wp_q USING (tok) JOIN wp_df d USING (tok)
  JOIN wp_dl l USING (doc_id) CROSS JOIN wp_stats s
  WHERE d.df <= CAST(floor({max_df}e0 * s.n_docs) AS BIGINT)),
wp_theta AS (
  SELECT CAST(min(score) AS BIGINT) AS theta_micro FROM (
    SELECT doc_id, CAST(sum(term_micro) AS BIGINT) AS score
    FROM wp_terms GROUP BY 1
    ORDER BY score DESC, doc_id LIMIT {k})),
wp_ub AS (
  SELECT tok, CAST(max(term_micro) AS BIGINT) AS ub_micro,
         CAST(max(df) AS BIGINT) AS df
  FROM wp_terms GROUP BY 1),
wp_docub AS (
  SELECT t.doc_id,
         CASE WHEN CAST(sum(u.ub_micro) AS BIGINT) < max(h.theta_micro)
              THEN 1 ELSE 0 END AS skip
  FROM wp_terms t JOIN wp_ub u USING (tok) CROSS JOIN wp_theta h
  GROUP BY 1),
wp_glob AS (
  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(skip) AS BIGINT) AS n_skippable
  FROM wp_docub)
SELECT u.tok, u.df, u.ub_micro,
       CAST(p.posting_skippable AS BIGINT) AS posting_skippable,
       h.theta_micro, g.n_candidates, g.n_skippable
FROM wp_ub u
JOIN (SELECT t.tok, sum(d.skip) AS posting_skippable
      FROM wp_terms t JOIN wp_docub d USING (doc_id) GROUP BY 1) p
  USING (tok)
CROSS JOIN wp_theta h CROSS JOIN wp_glob g
"""


# ---------------------------------------------------------------------------
# R303: Rocchio pseudo-relevance feedback (Rocchio 1971 / RM-style PRF) —
# the classic query-expansion loop every retrieval stack grows next:
# run BM25, treat the top-FB docs as pseudo-relevant, mine their
# highest-weight terms (Rocchio weight = idf * collection tf inside the
# feedback set, the integer 1000000 DIV df spelling — no ln(); the RM3
# support filter requires a term in >= 2 feedback docs, or PRF adopts
# one document's idiosyncratic rare tokens — observed failure mode), union
# them into the query, re-run BM25. Fully deterministic (doc_id / tok
# tie-breaks), so the DuckDB oracle replicates the whole two-pass loop
# including the data-dependent expansion term set.
#
# Scale shape: both retrieval passes are posting-list equi-joins (never
# a corpus-wide rank); the feedback-term mining aggregates the tokens of
# FB docs only (a semi-join on the bounded feedback set).
# ---------------------------------------------------------------------------

ROCCHIO_FB = 10   # pseudo-relevant depth
ROCCHIO_EXP = 5   # expansion terms adopted


def _bm25_frame(toks0, dfreq, dl, stats, qdf):
    """(doc_id, n_matched, bm25_micro) for an arbitrary term frame."""
    return (
        toks0.join(F.broadcast(qdf), "tok")
        .join(dfreq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .where(
            F.col("df")
            <= F.expr(f"CAST(floor({MAX_DOC_FREQ}e0 * n_docs) AS BIGINT)")
        )
        .withColumn(
            "term_micro",
            F.expr(
                "((1000000 DIV df) * (22 * tf * avgdl_milli))"
                " DIV (10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl)"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum("term_micro").alias("bm25_micro"),
        )
    )


def rocchio_expand(
    docs: DataFrame,
    query: str,
    k: int = 10,
    fb: int = ROCCHIO_FB,
    n_exp: int = ROCCHIO_EXP,
) -> DataFrame:
    """Final reranked top-k after one PRF round: (rank, doc_id,
    n_matched, bm25_micro, was_in_base)."""
    # Deterministic same-SQL topical enrichment (the pii_scrub
    # discipline): the synthetic corpus has a ~30-token near-ubiquitous
    # vocabulary, so PRF would honestly find NO mid-frequency expansion
    # candidates; appending one topic token (doc_id % 8) restores the
    # topical structure PRF exists for, and the pigeonhole principle
    # guarantees >= 2 of the 10 feedback docs share a topic at ANY
    # scale — the expansion set is never vacuously empty.
    docs = docs.selectExpr(
        "doc_id",
        "concat(text, ' topic', CAST(doc_id % 8 AS STRING)) AS text",
    )
    toks0 = _doc_tokens(docs).localCheckpoint(eager=False)
    dl = toks0.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.expr("(1000 * sum(dl)) DIV count(*)").alias("avgdl_milli"),
    )
    dfreq = toks0.groupBy("tok").agg(F.count("*").alias("df"))
    q_terms = sorted(set(t for t in query.split() if t))
    qdf = docs.sparkSession.createDataFrame(
        [(t,) for t in q_terms], "tok string"
    )
    base = _bm25_frame(toks0, dfreq, dl, stats, qdf)
    base_top = (
        base.orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(fb)
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    not_q = ", ".join(f"'{t}'" for t in q_terms)
    exp = (
        toks0.join(base_top, "doc_id", "left_semi")
        .groupBy("tok")
        .agg(
            F.expr("CAST(sum(tf) AS BIGINT)").alias("tf_fb"),
            F.expr("CAST(count(*) AS BIGINT)").alias("fb_df"),
        )
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .where(
            F.expr(
                f"tok NOT IN ({not_q}) AND fb_df >= 2 AND df <="
                f" CAST(floor({MAX_DOC_FREQ}e0 * n_docs) AS BIGINT)"
            )
        )
        .selectExpr("tok", "(1000000 DIV df) * tf_fb AS w")
        .orderBy(F.desc("w"), "tok")
        .limit(n_exp)
        .select("tok")
    )
    q1 = qdf.unionByName(exp).localCheckpoint(eager=False)
    final = _bm25_frame(toks0, dfreq, dl, stats, q1)
    w = Window.orderBy(F.desc("bm25_micro"), "doc_id")
    return (
        final.orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .join(
            base_top.selectExpr("doc_id", "1 AS was_in_base"),
            "doc_id",
            "left",
        )
        .selectExpr(
            "rank", "doc_id", "n_matched", "bm25_micro",
            "CAST(coalesce(was_in_base, 0) AS BIGINT) AS was_in_base",
        )
    )


def rocchio_oracle(
    query: str,
    k: int = 10,
    fb: int = ROCCHIO_FB,
    n_exp: int = ROCCHIO_EXP,
) -> str:
    q_terms = sorted(set(t for t in query.split() if t))
    q_values = ", ".join(f"('{t}')" for t in q_terms)
    not_q = ", ".join(f"'{t}'" for t in q_terms)
    return f"""
WITH ro_raw AS (
  SELECT doc_id,
         unnest(string_split(
           text || ' topic' || CAST(doc_id % 8 AS VARCHAR), ' ')) AS tok
  FROM documents
),
ro_toks AS (
  SELECT doc_id, tok, count(*) AS tf FROM ro_raw WHERE tok <> ''
  GROUP BY doc_id, tok
),
ro_dl AS (SELECT doc_id, sum(tf) AS dl FROM ro_toks GROUP BY doc_id),
ro_stats AS (
  SELECT count(*) AS n_docs, (1000 * sum(dl)) // count(*) AS avgdl_milli
  FROM ro_dl),
ro_df AS (SELECT tok, count(*) AS df FROM ro_toks GROUP BY tok),
ro_q0(tok) AS (VALUES {q_values}),
ro_base AS (
  SELECT t.doc_id,
         sum(((1000000 // d.df) * (22 * t.tf * s.avgdl_milli))
             // (10 * t.tf * s.avgdl_milli + 3 * s.avgdl_milli
                 + 9000 * l.dl)) AS bm25_micro
  FROM ro_toks t
  JOIN ro_q0 USING (tok)
  JOIN ro_df d USING (tok)
  JOIN ro_dl l USING (doc_id)
  CROSS JOIN ro_stats s
  WHERE d.df <= CAST(floor({MAX_DOC_FREQ}e0 * s.n_docs) AS BIGINT)
  GROUP BY t.doc_id),
ro_fb AS (
  SELECT doc_id FROM ro_base
  ORDER BY bm25_micro DESC, doc_id LIMIT {fb}),
ro_exp AS (
  SELECT t.tok
  FROM ro_toks t
  JOIN ro_df d USING (tok)
  CROSS JOIN ro_stats s
  WHERE t.doc_id IN (SELECT doc_id FROM ro_fb)
    AND t.tok NOT IN ({not_q})
    AND d.df <= CAST(floor({MAX_DOC_FREQ}e0 * s.n_docs) AS BIGINT)
  GROUP BY t.tok, d.df
  HAVING count(*) >= 2
  ORDER BY (1000000 // d.df) * sum(t.tf) DESC, t.tok LIMIT {n_exp}),
ro_q1(tok) AS (
  SELECT tok FROM ro_q0 UNION SELECT tok FROM ro_exp),
ro_final AS (
  SELECT t.doc_id, count(*) AS n_matched,
         sum(((1000000 // d.df) * (22 * t.tf * s.avgdl_milli))
             // (10 * t.tf * s.avgdl_milli + 3 * s.avgdl_milli
                 + 9000 * l.dl)) AS bm25_micro
  FROM ro_toks t
  JOIN ro_q1 USING (tok)
  JOIN ro_df d USING (tok)
  JOIN ro_dl l USING (doc_id)
  CROSS JOIN ro_stats s
  WHERE d.df <= CAST(floor({MAX_DOC_FREQ}e0 * s.n_docs) AS BIGINT)
  GROUP BY t.doc_id)
SELECT CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id)
         AS INT) AS rank,
       doc_id, n_matched, bm25_micro,
       CAST(CASE WHEN doc_id IN (SELECT doc_id FROM ro_fb)
            THEN 1 ELSE 0 END AS BIGINT) AS was_in_base
FROM ro_final
ORDER BY bm25_micro DESC, doc_id LIMIT {k}"""
