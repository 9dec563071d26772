"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting.

The task brief's text-pipeline ops, shaped like the reference's derived
boolean classifiers + weighted health scoring (SURVEY.md P4, A5:
``health_scorer.py:33-42`` — weighted dimensions → score → grade). All
pure column arithmetic (codegen'd); outputs are integers/strings for
cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tiny per-language stopword lists for the n-gram/stopword langid
# heuristic. The synthetic corpus is English-ish tokens with metadata
# labels, so 'en' evidence dominates — the heuristic's *mechanics* (argmax
# over evidence counts with deterministic tie-break) are what's exercised.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "los"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]


def _count_words_sql(words: list[str]) -> str:
    """Portable count of list-member occurrences in the word array
    ``ws`` (works in Spark and DuckDB via size/len of filter)."""
    cond = " OR ".join(f"x = '{w}'" for w in words)
    return f"size(filter(ws, x -> {cond}))"


def _count_words_duck(words: list[str]) -> str:
    cond = " OR ".join(f"x = '{w}'" for w in words)
    return f"len(list_filter(ws, x -> {cond}))"


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document: token counts, quality score (0-100), grade, langid.

    quality dimensions (weights mirror health_scorer.py's fixed-weight
    multi-dimension design): length band 30, stopword ratio 40, lexical
    diversity 30.
    """
    langs = list(LANG_MARKERS)
    ev = [
        f"{_count_words_sql(LANG_MARKERS[lang])} AS ev_{lang}" for lang in langs
    ]
    best = " ".join(
        f"WHEN ev_{lang} = GREATEST({', '.join('ev_' + x for x in langs)}) "
        f"AND ev_{lang} > 0 THEN '{lang}'"
        for lang in langs
    )
    return (
        docs.withColumn("ws", F.expr("filter(split(text, ' '), x -> x <> '')"))
        .withColumn("n_tokens", F.expr("CAST(size(ws) AS BIGINT)"))
        .withColumn("n_distinct_tokens", F.expr("CAST(size(array_distinct(ws)) AS BIGINT)"))
        .withColumn("n_alpha_tokens", F.expr("CAST(regexp_count(text, '[a-z]+') AS BIGINT)"))
        .withColumn("n_stop", F.expr(f"CAST({_count_words_sql(STOPWORDS)} AS BIGINT)"))
        .selectExpr("*", *ev)
        .withColumn(
            "quality",
            F.expr(
                "CAST(floor("
                "  (CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 30e0 "
                "        WHEN n_tokens BETWEEN 5 AND 400 THEN 15e0 ELSE 0e0 END)"
                "+ 40e0 * (1e0 - least(1e0, 3e0 * n_stop / n_tokens))"
                "+ 30e0 * n_distinct_tokens / n_tokens"
                ") AS BIGINT)"
            ),
        )
        .withColumn(
            "grade",
            F.expr(
                "CASE WHEN quality >= 80 THEN 'A' WHEN quality >= 60 THEN 'B' "
                "WHEN quality >= 40 THEN 'C' ELSE 'D' END"
            ),
        )
        .withColumn("lang_guess", F.expr(f"CASE {best} ELSE 'unknown' END"))
        .select(
            "doc_id", "lang", "n_tokens", "n_distinct_tokens", "n_alpha_tokens",
            "n_stop", "quality", "grade", "lang_guess",
        )
    )


def text_stats_oracle() -> str:
    langs = list(LANG_MARKERS)
    ev = ",\n       ".join(
        f"{_count_words_duck(LANG_MARKERS[lang])} AS ev_{lang}" for lang in langs
    )
    best = " ".join(
        f"WHEN ev_{lang} = GREATEST({', '.join('ev_' + x for x in langs)}) "
        f"AND ev_{lang} > 0 THEN '{lang}'"
        for lang in langs
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
counted AS (
  SELECT doc_id, lang, text, ws,
       len(ws) AS n_tokens,
       len(list_distinct(ws)) AS n_distinct_tokens,
       len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
       {_count_words_duck(STOPWORDS)} AS n_stop,
       {ev}
  FROM base
),
scored AS (
  SELECT *,
       CAST(floor(
         (CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 30e0
               WHEN n_tokens BETWEEN 5 AND 400 THEN 15e0 ELSE 0e0 END)
       + 40e0 * (1e0 - least(1e0, 3e0 * n_stop / n_tokens))
       + 30e0 * n_distinct_tokens / n_tokens
       ) AS BIGINT) AS quality
  FROM counted
)
SELECT doc_id, lang, n_tokens, n_distinct_tokens, n_alpha_tokens, n_stop,
       quality,
       CASE WHEN quality >= 80 THEN 'A' WHEN quality >= 60 THEN 'B'
            WHEN quality >= 40 THEN 'C' ELSE 'D' END AS grade,
       CASE {best} ELSE 'unknown' END AS lang_guess
FROM scored
"""


def zone_quality_rollup(stats: DataFrame) -> DataFrame:
    """Per-(lang, grade) roll-up — the project-level health report analog
    (health_scorer.py:283-375): counts + quality distribution."""
    return stats.groupBy("lang", "grade").agg(
        F.count("*").alias("n_docs"),
        F.sum("quality").alias("sum_quality"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
    )


# ---------------------------------------------------------------------------
# R119: repetition-based quality rules (Gopher, Rae et al. 2021 §A1.1
# — public paper): the pre-training filter that kills boilerplate and
# degenerate generations by REPETITION, complementing text_stats's
# length/stopword dimensions. Token-level exact integer versions:
#   top2/top3_milli — fraction of tokens covered by the single most
#     frequent 2-/3-gram (count·n DIV n_tokens, in milli);
#   rep5_milli — duplicated-5-gram mass, 1000·(n5 − distinct5) DIV n5.
# Shape: one doc-keyed window (row_number re-indexes the empty-filtered
# token stream; lead() forms the n-grams in the SAME partitioning — no
# second shuffle), then doc-keyed aggregates. No arrays, no lambdas
# (the winnow Catalyst-recompute trap never arises).
# ---------------------------------------------------------------------------

GOPHER_TOP2_MAX_MILLI = 200
GOPHER_TOP3_MAX_MILLI = 180
GOPHER_REP5_MAX_MILLI = 300


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, top2_milli, top3_milli, rep5_milli, gopher_pass)
    per document — exact integers, identical on both engines."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
        .withColumn("g2", F.concat_ws(" ", "tok", F.lead("tok", 1).over(w)))
        .withColumn(
            "g3",
            F.concat_ws(
                " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
            ),
        )
        .withColumn(
            "g5",
            F.concat_ws(
                " ",
                "tok",
                F.lead("tok", 1).over(w),
                F.lead("tok", 2).over(w),
                F.lead("tok", 3).over(w),
                F.lead("tok", 4).over(w),
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_tokens", F.max("rn").over(Window.partitionBy("doc_id")))
    )
    # concat_ws silently drops NULLs, so the trailing partial n-grams are
    # shorter strings — exclude them by position instead of null checks
    # (identical rule on both engines).
    top2 = (
        toks.where(F.col("rn") <= F.col("n_tokens") - 1)
        .groupBy("doc_id", "g2")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max2"))
    )
    top3 = (
        toks.where(F.col("rn") <= F.col("n_tokens") - 2)
        .groupBy("doc_id", "g3")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max3"))
    )
    g5 = (
        toks.where(F.col("rn") <= F.col("n_tokens") - 4)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n5"),
            F.countDistinct("g5").alias("d5"),
        )
    )
    base = toks.groupBy("doc_id").agg(F.max("rn").alias("n_tokens"))
    return (
        base.join(top2, "doc_id", "left")
        .join(top3, "doc_id", "left")
        .join(g5, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_tokens",
            "CASE WHEN max2 IS NULL THEN 0"
            " ELSE (1000 * 2 * max2) DIV n_tokens END AS top2_milli",
            "CASE WHEN max3 IS NULL THEN 0"
            " ELSE (1000 * 3 * max3) DIV n_tokens END AS top3_milli",
            "CASE WHEN n5 IS NULL OR n5 = 0 THEN 0"
            " ELSE (1000 * (n5 - d5)) DIV n5 END AS rep5_milli",
        )
        .selectExpr(
            "*",
            f"top2_milli <= {GOPHER_TOP2_MAX_MILLI}"
            f" AND top3_milli <= {GOPHER_TOP3_MAX_MILLI}"
            f" AND rep5_milli <= {GOPHER_REP5_MAX_MILLI} AS gopher_pass",
        )
    )


def repetition_stats_oracle() -> str:
    return f"""
WITH rp_raw AS (
  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS rn
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents)
  WHERE tok <> ''),
rp_n AS (SELECT doc_id, max(rn) AS n_tokens FROM rp_raw GROUP BY 1),
rp_g AS (
  SELECT doc_id, rn, tok,
         tok || ' ' || lead(tok, 1) OVER w AS g2,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
           AS g3,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
             || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w
           AS g5
  FROM rp_raw
  WINDOW w AS (PARTITION BY doc_id ORDER BY rn)),
rp_top2 AS (
  SELECT doc_id, max(c) AS max2 FROM (
    SELECT g.doc_id, g.g2, count(*) AS c
    FROM rp_g g JOIN rp_n n USING (doc_id)
    WHERE g.rn <= n.n_tokens - 1 GROUP BY 1, 2) GROUP BY 1),
rp_top3 AS (
  SELECT doc_id, max(c) AS max3 FROM (
    SELECT g.doc_id, g.g3, count(*) AS c
    FROM rp_g g JOIN rp_n n USING (doc_id)
    WHERE g.rn <= n.n_tokens - 2 GROUP BY 1, 2) GROUP BY 1),
rp_g5 AS (
  SELECT g.doc_id, count(*) AS n5, count(DISTINCT g.g5) AS d5
  FROM rp_g g JOIN rp_n n USING (doc_id)
  WHERE g.rn <= n.n_tokens - 4 GROUP BY 1),
rp_m AS (
  SELECT n.doc_id, n.n_tokens,
         CASE WHEN t2.max2 IS NULL THEN 0
              ELSE (1000 * 2 * t2.max2) // n.n_tokens END AS top2_milli,
         CASE WHEN t3.max3 IS NULL THEN 0
              ELSE (1000 * 3 * t3.max3) // n.n_tokens END AS top3_milli,
         CASE WHEN g5.n5 IS NULL OR g5.n5 = 0 THEN 0
              ELSE (1000 * (g5.n5 - g5.d5)) // g5.n5 END AS rep5_milli
  FROM rp_n n
  LEFT JOIN rp_top2 t2 USING (doc_id)
  LEFT JOIN rp_top3 t3 USING (doc_id)
  LEFT JOIN rp_g5 g5 USING (doc_id))
SELECT doc_id, n_tokens, top2_milli, top3_milli, rep5_milli,
       top2_milli <= {GOPHER_TOP2_MAX_MILLI}
         AND top3_milli <= {GOPHER_TOP3_MAX_MILLI}
         AND rep5_milli <= {GOPHER_REP5_MAX_MILLI} AS gopher_pass
FROM rp_m"""


# ---------------------------------------------------------------------------
# R127: unigram surprisal filter (the CCNet/Wenzek 2020 perplexity-band
# idea — public paper — with the LM replaced by the corpus's own unigram
# model, and log2 replaced by the exact integer bit-length so both engines
# compute bit-identical values): per-token surprisal is defined as
#   bits(tok) = bit_length(N DIV cnt(tok)) - 1  ==  floor(log2(N DIV cnt))
# (N = corpus token occurrences). A doc's mean surprisal separates
# boilerplate (head-token-heavy, low bits) from rare-token noise (high
# bits); CCNet keeps the MIDDLE band. No float log exists on either side:
# Spark spells bit_length as length(bin(x)), DuckDB as
# length(format('{:b}', x)).
# Scale shape: one token explode (doc-keyed window NOT needed — bag of
# words), one tiny vocab aggregate (broadcast back), one doc-keyed
# aggregate. The vocab frame is bounded by the corpus vocabulary;
# the scalar N rides a one-row broadcast.
# Band thresholds were calibrated on the synthetic corpus so all three
# bands are populated at sf0.001 AND sf0.01 (observed mean_bits_milli
# range 4000-4500, median ~4028).
# ---------------------------------------------------------------------------

SURPRISAL_LO_MILLI = 4015
SURPRISAL_HI_MILLI = 4060


def surprisal_filter(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_bits_milli, max_bits, band, keep) per doc —
    integer unigram surprisal in milli-bits, CCNet-style middle-band keep.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("nn"))
    bits = cnt.crossJoin(F.broadcast(n)).selectExpr(
        "tok", "length(bin(nn DIV c)) - 1 AS bits"
    )
    return (
        toks.join(F.broadcast(bits), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr("(1000 * sum(bits)) DIV count(*)").alias("mean_bits_milli"),
            F.max("bits").alias("max_bits"),
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "mean_bits_milli",
            "max_bits",
            f"CASE WHEN mean_bits_milli < {SURPRISAL_LO_MILLI} "
            f"THEN 'predictable' WHEN mean_bits_milli <= "
            f"{SURPRISAL_HI_MILLI} THEN 'keep' ELSE 'rare_heavy' END AS band",
            f"mean_bits_milli >= {SURPRISAL_LO_MILLI} AND mean_bits_milli "
            f"<= {SURPRISAL_HI_MILLI} AS keep",
        )
    )


def surprisal_oracle() -> str:
    return f"""
WITH sp_tok AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
sp_cnt AS (SELECT tok, count(*) AS c FROM sp_tok GROUP BY 1),
sp_n AS (SELECT count(*) AS nn FROM sp_tok),
sp_bits AS (
  SELECT tok, length(format('{{:b}}', nn // c)) - 1 AS bits
  FROM sp_cnt CROSS JOIN sp_n)
SELECT t.doc_id, count(*) AS n_tokens,
       (1000 * sum(b.bits)) // count(*) AS mean_bits_milli,
       max(b.bits) AS max_bits,
       CASE WHEN (1000 * sum(b.bits)) // count(*) < {SURPRISAL_LO_MILLI}
            THEN 'predictable'
            WHEN (1000 * sum(b.bits)) // count(*) <= {SURPRISAL_HI_MILLI}
            THEN 'keep' ELSE 'rare_heavy' END AS band,
       (1000 * sum(b.bits)) // count(*) >= {SURPRISAL_LO_MILLI}
         AND (1000 * sum(b.bits)) // count(*) <= {SURPRISAL_HI_MILLI} AS keep
FROM sp_tok t JOIN sp_bits b USING (tok)
GROUP BY 1"""


# ---------------------------------------------------------------------------
# R132: DSIR-style importance weights (Xie 2023 "Data Selection for
# Language Models via Importance Resampling" — public paper): each TRAIN
# doc is scored by how much its hashed-bigram distribution looks like the
# TARGET (holdout) distribution vs the raw pool. The published method
# weights by the log-likelihood ratio under two hashed-n-gram bag models;
# this integer re-expression uses the per-bucket Laplace-smoothed
# likelihood RATIO in milli (arithmetic mean over the doc's gram
# instances instead of the geometric mean — monotone in the same
# direction, exact cross-engine):
#   lr_milli(b) = 1000·(t_b+1)·(R+B) DIV ((r_b+1)·(T+B))
#   imp_milli(doc) = Σ_g lr_milli(bucket(g)) DIV n_grams
# keep = imp_milli >= 1000 ("more target-like than pool-average";
# threshold calibrated non-vacuous at sf0.001 AND sf0.01: ~27-33 of 450
# train docs pass). Scale shape: grams hash to B=1024 buckets, the
# bucket stats frame is one tiny two-sided aggregate broadcast back —
# the doc score pass is a narrow broadcast join, no shuffle of text.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_HOLDOUT_MOD = 10  # same deterministic split as decontamination
DSIR_KEEP_MILLI = 1000


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, imp_milli, keep) per TRAIN doc with >= 1 bigram."""
    from pyspark.sql.window import Window

    from ..functions import md5int_spark

    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .where(F.col("tok") != "")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("g2", F.concat_ws(" ", "tok", F.lead("tok", 1).over(w)))
        .withColumn("n_tokens", F.max("rn").over(Window.partitionBy("doc_id")))
        .where(F.col("rn") <= F.col("n_tokens") - 1)
        .select(
            "doc_id",
            F.expr(f"({md5int_spark('g2')}) % {DSIR_BUCKETS}").alias("b"),
        )
    )
    buckets = grams.groupBy("b").agg(
        F.sum(
            F.expr(f"CASE WHEN doc_id % {DSIR_HOLDOUT_MOD} = 0 "
                   "THEN 1 ELSE 0 END")
        ).alias("t_b"),
        F.sum(
            F.expr(f"CASE WHEN doc_id % {DSIR_HOLDOUT_MOD} <> 0 "
                   "THEN 1 ELSE 0 END")
        ).alias("r_b"),
    )
    tot = buckets.agg(
        F.sum("t_b").alias("tt"), F.sum("r_b").alias("rr")
    )
    lr = buckets.crossJoin(F.broadcast(tot)).selectExpr(
        "b",
        f"(1000 * (t_b + 1) * (rr + {DSIR_BUCKETS})) DIV "
        f"((r_b + 1) * (tt + {DSIR_BUCKETS})) AS lr_milli",
    )
    return (
        grams.where(F.col("doc_id") % DSIR_HOLDOUT_MOD != 0)
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.expr("sum(lr_milli) DIV count(*)").alias("imp_milli"),
        )
        .selectExpr(
            "doc_id", "n_grams", "imp_milli",
            f"imp_milli >= {DSIR_KEEP_MILLI} AS keep",
        )
    )


def dsir_oracle() -> str:
    from ..functions import md5int_duck

    gh = md5int_duck("g2")
    return f"""
WITH ds_tok AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents)
  WHERE tok <> ''),
ds_n AS (SELECT doc_id, max(rn) AS n_tokens FROM ds_tok GROUP BY 1),
ds_g AS (
  SELECT t.doc_id, ({gh}) % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, rn,
               tok || ' ' || lead(tok, 1) OVER (PARTITION BY doc_id
                                                ORDER BY rn) AS g2
        FROM ds_tok) t
  JOIN ds_n n USING (doc_id)
  WHERE t.rn <= n.n_tokens - 1),
ds_b AS (
  SELECT b,
         sum(CASE WHEN doc_id % {DSIR_HOLDOUT_MOD} = 0 THEN 1 ELSE 0 END)
           AS t_b,
         sum(CASE WHEN doc_id % {DSIR_HOLDOUT_MOD} <> 0 THEN 1 ELSE 0 END)
           AS r_b
  FROM ds_g GROUP BY 1),
ds_tot AS (SELECT sum(t_b) AS tt, sum(r_b) AS rr FROM ds_b),
ds_lr AS (
  SELECT b, (1000 * (t_b + 1) * (rr + {DSIR_BUCKETS}))
              // ((r_b + 1) * (tt + {DSIR_BUCKETS})) AS lr_milli
  FROM ds_b CROSS JOIN ds_tot)
SELECT g.doc_id, count(*) AS n_grams,
       sum(l.lr_milli) // count(*) AS imp_milli,
       sum(l.lr_milli) // count(*) >= {DSIR_KEEP_MILLI} AS keep
FROM ds_g g JOIN ds_lr l USING (b)
WHERE g.doc_id % {DSIR_HOLDOUT_MOD} <> 0
GROUP BY 1"""


def quality_oracle_ctes(prefix: str = "qq") -> str:
    """The text_stats quality score as splice-able CTEs
    ``{prefix}_q(doc_id, quality)`` — for oracles that compose quality
    with other suites (dedup_survivors)."""
    return f"""{prefix}_base AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws,
         text
  FROM documents),
{prefix}_cnt AS (
  SELECT doc_id, len(ws) AS n_tokens,
         len(list_distinct(ws)) AS n_distinct_tokens,
         {_count_words_duck(STOPWORDS)} AS n_stop
  FROM {prefix}_base),
{prefix}_q AS (
  SELECT doc_id,
         CAST(floor(
           (CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 30e0
                 WHEN n_tokens BETWEEN 5 AND 400 THEN 15e0 ELSE 0e0 END)
         + 40e0 * (1e0 - least(1e0, 3e0 * n_stop / n_tokens))
         + 30e0 * n_distinct_tokens / n_tokens
         ) AS BIGINT) AS quality
  FROM {prefix}_cnt)"""


# ---------------------------------------------------------------------------
# R138: Zipf rank-frequency audit (Zipf 1949; the standard corpus
# sanity screen — natural text shows freq(r)/freq(2r) ≈ 2^s ≈ 2 for
# exponent s ≈ 1; boilerplate-heavy or synthetic corpora deviate).
# Exact integers: per-rank counts, bits = floor_log2(cnt) via the
# surprisal bit-length primitive, doubling ratio in milli
# (1000·cnt(r) DIV cnt(2r), 0 when 2r exceeds the audited depth).
# The rank frame is VOCABULARY-sized (bounded), so the corpus-wide
# ordering is a tiny window after one token aggregate.
# ---------------------------------------------------------------------------

ZIPF_DEPTH = 16


def zipf_audit(docs: DataFrame, depth: int = ZIPF_DEPTH) -> DataFrame:
    """(rank, tok, cnt, bits, ratio_milli) for the top-``depth`` tokens
    (count desc, token asc ties)."""
    from pyspark.sql.window import Window

    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    win = Window.orderBy(F.desc("cnt"), "tok")
    top = (
        cnt.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= depth)
    )
    dbl = top.select(
        F.col("rank").alias("r2"), F.col("cnt").alias("cnt2")
    )
    return (
        top.join(dbl, F.expr("r2 = 2 * rank"), "left")
        .selectExpr(
            "CAST(rank AS BIGINT) AS rank",
            "tok",
            "cnt",
            "length(bin(cnt)) - 1 AS bits",
            "CASE WHEN cnt2 IS NULL THEN 0 "
            "ELSE (1000 * cnt) DIV cnt2 END AS ratio_milli",
        )
    )


def zipf_oracle(depth: int = ZIPF_DEPTH) -> str:
    return f"""
WITH zf_cnt AS (
  SELECT tok, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY 1),
zf_top AS (
  SELECT tok, cnt,
         row_number() OVER (ORDER BY cnt DESC, tok) AS rank
  FROM zf_cnt QUALIFY rank <= {depth})
SELECT CAST(a.rank AS BIGINT) AS rank, a.tok, a.cnt,
       length(format('{{:b}}', a.cnt)) - 1 AS bits,
       CASE WHEN b.cnt IS NULL THEN 0
            ELSE (1000 * a.cnt) // b.cnt END AS ratio_milli
FROM zf_top a LEFT JOIN zf_top b ON b.rank = 2 * a.rank"""


# ---------------------------------------------------------------------------
# R156: PII detection + redaction (the compliance pass every training-data
# pipeline runs before anything ships: C4 and The Pile both document a
# regex scrub stage). Reference analog: the noise-suppression / derived
# boolean classifier family (SURVEY.md P4/P5). Pure per-row regex column
# arithmetic — no shuffle, codegen'd, trivially 100 TB-safe.
#
# The synthetic corpus carries no contact strings, so the operator's input
# is a DERIVED text column built from the same SQL text on both engines
# (the synthetic-column parity discipline, CLAUDE.md): docs get a
# deterministic email / SSN-shaped / phone-shaped suffix keyed on doc_id.
# Patterns avoid backslash classes ([0-9], not \d) so Java regex (Spark)
# and RE2 (DuckDB) agree; DuckDB's regexp_replace needs the explicit 'g'
# flag (Spark replaces globally by default).
# ---------------------------------------------------------------------------

PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+"
PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
PII_PHONE = "555-[0-9]{4}"

# One SQL definition, both engines (CAST AS STRING is valid in DuckDB too).
PII_TXT_SQL = (
    "(text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' reach user'"
    " || CAST(doc_id AS STRING) || '@mail-'"
    " || CAST(doc_id % 7 AS STRING) || '.org' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn '"
    " || CAST(100 + doc_id % 900 AS STRING) || '-'"
    " || CAST(10 + doc_id % 90 AS STRING) || '-'"
    " || CAST(1000 + doc_id % 9000 AS STRING) ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' call 555-'"
    " || CAST(1000 + (doc_id * 7) % 9000 AS STRING) ELSE '' END)"
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Per-doc PII counts + redacted-text audit (doc_id, n_email, n_ssn,
    n_phone, pii_total, clean_len, redacted_md5).

    Redaction order is part of the contract (email, then SSN, then
    phone) — identical on both engines so the md5 of the redacted text
    is comparable."""
    red = (
        f"regexp_replace(regexp_replace(regexp_replace(pii_txt,"
        f" '{PII_EMAIL}', '<EMAIL>'),"
        f" '{PII_SSN}', '<SSN>'),"
        f" '{PII_PHONE}', '<PHONE>')"
    )
    return (
        docs.withColumn("pii_txt", F.expr(PII_TXT_SQL))
        .selectExpr(
            "doc_id",
            f"CAST(regexp_count(pii_txt, '{PII_EMAIL}') AS BIGINT) AS n_email",
            f"CAST(regexp_count(pii_txt, '{PII_SSN}') AS BIGINT) AS n_ssn",
            f"CAST(regexp_count(pii_txt, '{PII_PHONE}') AS BIGINT) AS n_phone",
            f"{red} AS redacted",
        )
        .selectExpr(
            "doc_id", "n_email", "n_ssn", "n_phone",
            "n_email + n_ssn + n_phone AS pii_total",
            "CAST(length(redacted) AS BIGINT) AS clean_len",
            "md5(redacted) AS redacted_md5",
        )
    )


def pii_scrub_oracle() -> str:
    red = (
        f"regexp_replace(regexp_replace(regexp_replace(pii_txt,"
        f" '{PII_EMAIL}', '<EMAIL>', 'g'),"
        f" '{PII_SSN}', '<SSN>', 'g'),"
        f" '{PII_PHONE}', '<PHONE>', 'g')"
    )
    return f"""
WITH pii_base AS (
  SELECT doc_id, {PII_TXT_SQL} AS pii_txt FROM documents),
pii_cnt AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(pii_txt, '{PII_EMAIL}')) AS BIGINT)
           AS n_email,
         CAST(len(regexp_extract_all(pii_txt, '{PII_SSN}')) AS BIGINT)
           AS n_ssn,
         CAST(len(regexp_extract_all(pii_txt, '{PII_PHONE}')) AS BIGINT)
           AS n_phone,
         {red} AS redacted
  FROM pii_base)
SELECT doc_id, n_email, n_ssn, n_phone,
       n_email + n_ssn + n_phone AS pii_total,
       CAST(length(redacted) AS BIGINT) AS clean_len,
       md5(redacted) AS redacted_md5
FROM pii_cnt"""


# ---------------------------------------------------------------------------
# R157: overlapping fixed-window document chunking — the
# retrieval-/training-ingest step between cleaning and embedding (every
# RAG and context-window pipeline runs one). Window W=64 tokens, stride
# S=48 (25% overlap). Chunk count is CLOSED-FORM per doc
# (1 + ceil((n-W)/S)), so the fan is a per-row sequence+explode: no
# shuffle, fan factor ≤ n/S + 1 ≈ 1.33× the token mass — the narrow-op
# shape that survives 100 TB. Coverage is provable: the last chunk start
# 1+S·(nc−1) ≤ n and start+W−1 ≥ n, so every token lands in ≥1 chunk and
# the tail chunk keeps ≥ W−S+1 tokens.
# ---------------------------------------------------------------------------

CHUNK_W, CHUNK_S = 64, 48


def doc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_md5) — whitespace-token
    windows of W with stride S; md5 of the re-joined chunk text is the
    cross-engine value witness."""
    W, S = CHUNK_W, CHUNK_S
    return (
        docs.withColumn("ws", F.expr("filter(split(text, ' '), x -> x <> '')"))
        .withColumn("n_tokens", F.expr("CAST(size(ws) AS BIGINT)"))
        .where("n_tokens > 0")
        .withColumn(
            "n_chunks",
            F.expr(
                f"CASE WHEN n_tokens <= {W} THEN CAST(1 AS BIGINT) "
                f"ELSE 1 + (n_tokens - {W} + {S} - 1) DIV {S} END"
            ),
        )
        .selectExpr(
            "doc_id", "ws",
            "explode(sequence(CAST(0 AS BIGINT), n_chunks - 1)) AS chunk_idx",
        )
        .selectExpr(
            "doc_id", "chunk_idx",
            f"slice(ws, CAST(1 + chunk_idx * {S} AS INT), {W}) AS toks",
        )
        .selectExpr(
            "doc_id",
            "chunk_idx",
            "CAST(size(toks) AS BIGINT) AS n_chunk_tokens",
            "md5(array_join(toks, ' ')) AS chunk_md5",
        )
    )


def doc_chunks_oracle() -> str:
    W, S = CHUNK_W, CHUNK_S
    return f"""
WITH ck_base AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
ck_n AS (
  SELECT doc_id, ws, len(ws) AS n_tokens,
         CASE WHEN len(ws) <= {W} THEN 1
              ELSE 1 + (len(ws) - {W} + {S} - 1) // {S} END AS n_chunks
  FROM ck_base WHERE len(ws) > 0),
ck_fan AS (
  SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_idx FROM ck_n),
ck_sl AS (
  SELECT doc_id, chunk_idx,
         list_slice(ws, 1 + chunk_idx * {S}, chunk_idx * {S} + {W}) AS toks
  FROM ck_fan)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(toks) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks, ' ')) AS chunk_md5
FROM ck_sl"""


# ---------------------------------------------------------------------------
# R171: langid agreement audit (Cohen's kappa, 1960) — inter-rater
# reliability between the ground-truth lang label and the stopword-
# evidence langid heuristic. Exactly integer: kappa = (N·Σdiag − Σr_k·c_k)
# / (N² − Σr_k·c_k) emitted as sign + cross-multiplied abs per-mille
# (the negative-DIV discipline — kappa can be negative). The marginal
# product joins on the tiny label dimension; one doc-keyed aggregate.
# 'zh' docs have no marker list, so real disagreement exists by
# construction (the audit is non-vacuous at every SF).
# ---------------------------------------------------------------------------


def langid_agreement(docs: DataFrame) -> DataFrame:
    """One row: (n, n_agree, po_pm, pe_pm, kappa_sign, kappa_abs_pm)."""
    g = text_stats(docs).select("lang", "lang_guess")
    base = g.agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(
            "CAST(sum(CASE WHEN lang = lang_guess THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_agree"),
    )
    r = g.groupBy(F.col("lang").alias("k")).agg(
        F.count("*").cast("bigint").alias("r")
    )
    c = g.groupBy(F.col("lang_guess").alias("k")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    rc = r.join(c, "k").agg(
        F.expr("CAST(coalesce(sum(r * c), 0) AS BIGINT) AS rc")
    )
    return base.crossJoin(rc).selectExpr(
        "n", "n_agree",
        "(1000 * n_agree) DIV n AS po_pm",
        "(1000 * rc) DIV (n * n) AS pe_pm",
        "CASE WHEN n * n_agree >= rc THEN 1 ELSE -1 END AS kappa_sign",
        "(1000 * abs(n * n_agree - rc)) DIV (n * n - rc) AS kappa_abs_pm",
    )


def langid_agreement_oracle() -> str:
    langs = list(LANG_MARKERS)
    ev = ",\n         ".join(
        f"{_count_words_duck(LANG_MARKERS[lang])} AS ev_{lang}"
        for lang in langs
    )
    best = " ".join(
        f"WHEN ev_{lang} = GREATEST({', '.join('ev_' + x for x in langs)}) "
        f"AND ev_{lang} > 0 THEN '{lang}'"
        for lang in langs
    )
    return f"""
WITH ka_ev AS (
  SELECT lang,
         {ev}
  FROM (SELECT lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents)),
ka_g AS (
  SELECT lang, CASE {best} ELSE 'unknown' END AS lang_guess FROM ka_ev),
ka_n AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = lang_guess THEN 1 ELSE 0 END)
              AS BIGINT) AS n_agree
  FROM ka_g),
ka_r AS (SELECT lang AS k, count(*) AS r FROM ka_g GROUP BY 1),
ka_c AS (SELECT lang_guess AS k, count(*) AS c FROM ka_g GROUP BY 1),
ka_e AS (
  SELECT CAST(coalesce(sum(r.r * c.c), 0) AS BIGINT) AS rc
  FROM ka_r r JOIN ka_c c ON c.k = r.k)
SELECT n, n_agree,
       (1000 * n_agree) // n AS po_pm,
       (1000 * rc) // (n * n) AS pe_pm,
       CASE WHEN n * n_agree >= rc THEN 1 ELSE -1 END AS kappa_sign,
       (1000 * abs(n * n_agree - rc)) // (n * n - rc) AS kappa_abs_pm
FROM ka_n CROSS JOIN ka_e"""


# ---------------------------------------------------------------------------
# R176: k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
# 2007) — the data-governance release gate: group the corpus by its
# quasi-identifiers (lang, source, length band), require every group to
# hold ≥ k rows (k-anonymity) and ≥ l distinct values of the sensitive
# attribute (the quality grade — l-diversity). One groupBy onto the
# bounded QI dimension; the audit emits every group with its k/l flags
# so the violating cells are directly actionable.
# ---------------------------------------------------------------------------

KANON_K = 5
KANON_L = 2
_KANON_BAND = 128  # n_chars band width


def kanon_audit(docs: DataFrame, k: int = KANON_K, l_div: int = KANON_L) -> DataFrame:
    """(lang, source, len_band, n, n_grades, k_ok, l_ok)."""
    g = text_stats(docs).select("doc_id", "grade")
    return (
        docs.join(g, "doc_id")
        .groupBy(
            "lang", "source",
            F.expr(f"CAST(n_chars AS BIGINT) DIV {_KANON_BAND}").alias("len_band"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("grade").cast("bigint").alias("n_grades"),
        )
        .selectExpr(
            "lang", "source", "len_band", "n", "n_grades",
            f"CAST(n >= {k} AS BIGINT) AS k_ok",
            f"CAST(n_grades >= {l_div} AS BIGINT) AS l_ok",
        )
    )


def kanon_oracle(k: int = KANON_K, l_div: int = KANON_L) -> str:
    return f"""
WITH {quality_oracle_ctes('kan')},
kan_gr AS (
  SELECT doc_id,
         CASE WHEN quality >= 80 THEN 'A' WHEN quality >= 60 THEN 'B'
              WHEN quality >= 40 THEN 'C' ELSE 'D' END AS grade
  FROM kan_q),
kan_j AS (
  SELECT d.lang, d.source,
         CAST(d.n_chars AS BIGINT) // {_KANON_BAND} AS len_band, g.grade
  FROM documents d JOIN kan_gr g ON g.doc_id = d.doc_id)
SELECT lang, source, len_band,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT grade) AS BIGINT) AS n_grades,
       CAST(count(*) >= {k} AS BIGINT) AS k_ok,
       CAST(count(DISTINCT grade) >= {l_div} AS BIGINT) AS l_ok
FROM kan_j GROUP BY 1, 2, 3"""


# ---------------------------------------------------------------------------
# R180: AUC rank-sum eval — the classifier-discrimination harness
# (Mann-Whitney/Wilcoxon; Hanley & McNeil 1982) done EXACTLY in
# integers: label = high-quality doc (quality >= 60, grades A/B), and
# for each candidate scorer the probability a random positive outranks
# a random negative, ties at half credit. Instead of the textbook
# global rank (a full sort at 100 TB), the scores are first histogrammed
# onto their BOUNDED integer dimension (0..1000 per-mille values — one
# groupBy with map-side partial agg), and AUC reads off the histogram:
#   2·num = Σ_s n_pos_s · (2·cum_neg_below(s) + n_neg_s)
#   auc_pm = 1000·2·num DIV (2·n_pos·n_neg)
# — the window runs on the ≤1001-row score dimension, never on docs.
# Scorers: 'diversity' (distinct-token ratio, positively associated —
# AUC ≈ 0.83 at both gate scales) and 'stop_density' (stopword ratio,
# negatively associated — AUC ≈ 0.15, exercising the below-chance
# path). The label is grade-A (quality ≥ 80 — the balanced split:
# ~1:3 at both sfs; ≥ 60 would be 493:7); the diversity COMPONENT
# weighs only 30/100 of quality, so neither scorer is degenerate.
# Reference analog: health_scorer.py's score→grade discipline, evaluated
# rather than assumed (SURVEY.md A5/R143's NDCG companion).
# ---------------------------------------------------------------------------

AUC_POS_QUALITY = 80


def auc_eval(docs: DataFrame) -> DataFrame:
    """(scorer, n_pos, n_neg, auc_pm): exact Mann-Whitney AUC of each
    scorer against the grade-A label, ties at half credit."""
    from pyspark.sql import Window

    base = text_stats(docs).selectExpr(
        f"CAST(quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos",
        "(1000 * n_distinct_tokens) DIV n_tokens AS s_diversity",
        "(1000 * n_stop) DIV n_tokens AS s_stop_density",
    )
    outs = []
    for scorer in ("diversity", "stop_density"):
        hist = base.groupBy(F.col(f"s_{scorer}").alias("s")).agg(
            F.sum("pos").alias("np_s"),
            F.expr("sum(1 - pos)").alias("nn_s"),
        )
        w = (
            Window.orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        outs.append(
            hist.withColumn(
                "cumneg", F.coalesce(F.sum("nn_s").over(w), F.lit(0))
            )
            .groupBy()
            .agg(
                F.sum("np_s").alias("n_pos"),
                F.sum("nn_s").alias("n_neg"),
                F.expr("sum(np_s * (2 * cumneg + nn_s))").alias("num2"),
            )
            .selectExpr(
                f"'{scorer}' AS scorer",
                "CAST(n_pos AS BIGINT) AS n_pos",
                "CAST(n_neg AS BIGINT) AS n_neg",
                "CAST((1000 * num2) DIV (2 * n_pos * n_neg) AS BIGINT)"
                " AS auc_pm",
            )
        )
    return outs[0].unionByName(outs[1])


def auc_oracle() -> str:
    arms = []
    for scorer in ("diversity", "stop_density"):
        arms.append(f"""
  SELECT '{scorer}' AS scorer,
         CAST(sum(np_s) AS BIGINT) AS n_pos,
         CAST(sum(nn_s) AS BIGINT) AS n_neg,
         CAST((1000 * sum(np_s * (2 * cumneg + nn_s)))
           // (2 * sum(np_s) * sum(nn_s)) AS BIGINT) AS auc_pm
  FROM (
    SELECT np_s, nn_s,
           coalesce(sum(nn_s) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
    FROM (
      SELECT s_{scorer} AS s, sum(pos) AS np_s, sum(1 - pos) AS nn_s
      FROM auc_lab GROUP BY 1))""")
    both = "\n  UNION ALL\n".join(arms)
    return f"""
WITH {quality_oracle_ctes('auc')},
auc_lab AS (
  SELECT CAST(q.quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos,
         (1000 * c.n_distinct_tokens) // c.n_tokens AS s_diversity,
         (1000 * c.n_stop) // c.n_tokens AS s_stop_density
  FROM auc_q q JOIN auc_cnt c ON c.doc_id = q.doc_id)
{both}"""


# ---------------------------------------------------------------------------
# R185: calibration bins + ECE — the CALIBRATION companion to R180's
# discrimination AUC (Guo et al. 2017's reliability diagram, done
# exactly): the diversity score read as a per-mille "confidence" is
# binned into 10 equal-width bins; per bin the empirical grade-A rate
# is compared to the mean claimed confidence, and the expected
# calibration error folds the bins together weighted by population:
#   ece_pm = Σ_b n_b·|rate_b − conf_b| DIV N
# All integers (rates/confidences in per-mille, common-denominator
# fold: |1000·n_pos_b·n_b − conf_sum_b·n_b| stays exact via per-bin
# pm values first). The honest readout on this corpus: the scorer
# DISCRIMINATES (AUC 0.83) but is badly CALIBRATED — exactly the
# distinction the two harnesses exist to separate.
# Scale: one groupBy onto the 10-row bin dimension; the ECE total
# reaches the per-bin rows via a broadcast one-row frame (no driver
# collect) — the modularity-score envelope pattern.
# ---------------------------------------------------------------------------

CAL_BINS = 10


def calibration_bins(docs: DataFrame) -> DataFrame:
    """(bin, n, n_pos, conf_pm, rate_pm, gap_pm, ece_pm): reliability
    table of the diversity scorer vs the grade-A label, with the
    population-weighted ECE replicated onto every bin row."""
    base = text_stats(docs).selectExpr(
        f"CAST(quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos",
        "(1000 * n_distinct_tokens) DIV n_tokens AS s",
    )
    bins = (
        base.groupBy(
            F.expr(f"least(s DIV {1000 // CAL_BINS}, {CAL_BINS - 1})")
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum("s").cast("bigint").alias("conf_sum"),
        )
        .selectExpr(
            "bin", "n", "n_pos",
            "conf_sum DIV n AS conf_pm",
            "(1000 * n_pos) DIV n AS rate_pm",
            "abs(conf_sum DIV n - (1000 * n_pos) DIV n) AS gap_pm",
        )
    )
    tot = bins.groupBy().agg(
        F.expr("sum(n * gap_pm) DIV sum(n)").cast("bigint").alias("ece_pm")
    )
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin", "n", "n_pos", "conf_pm", "rate_pm", "gap_pm", "ece_pm"
    )


def calibration_oracle() -> str:
    return f"""
WITH {quality_oracle_ctes('cal')},
cal_lab AS (
  SELECT CAST(q.quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos,
         (1000 * c.n_distinct_tokens) // c.n_tokens AS s
  FROM cal_q q JOIN cal_cnt c ON c.doc_id = q.doc_id),
cal_bins AS (
  SELECT least(s // {1000 // CAL_BINS}, {CAL_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(s) AS BIGINT) AS conf_sum
  FROM cal_lab GROUP BY 1),
cal_rows AS (
  SELECT bin, n, n_pos,
         conf_sum // n AS conf_pm,
         (1000 * n_pos) // n AS rate_pm,
         abs(conf_sum // n - (1000 * n_pos) // n) AS gap_pm
  FROM cal_bins),
cal_tot AS (
  SELECT CAST(sum(n * gap_pm) // sum(n) AS BIGINT) AS ece_pm
  FROM cal_rows)
SELECT r.bin, r.n, r.n_pos, r.conf_pm, r.rate_pm, r.gap_pm, t.ece_pm
FROM cal_rows r CROSS JOIN cal_tot t"""


# ---------------------------------------------------------------------------
# R222: t-closeness audit (Li, Li & Venkatasubramanian 2007) — the rung
# above kanon_audit's k-anonymity/l-diversity: distinct sensitive values
# per group are not enough if the group's DISTRIBUTION differs from the
# corpus (skewness attack). Per QI group: exact total-variation distance
# between its quality-grade distribution and the global one,
# cross-multiplied to integers (tv_milli = 1000 * SUM |n_gq*N - m_q*n| /
# (2*n*N) over the FULL grade alphabet — absent grades contribute their
# global mass). One groupBy to the QI x grade cells; the TV fan lives on
# the bounded QI x 4-grade grid.
# ---------------------------------------------------------------------------

TCLOSE_T_MILLI = 200


def tcloseness_audit(
    docs: DataFrame, t_milli: int = TCLOSE_T_MILLI
) -> DataFrame:
    """(lang, source, len_band, n, tv_milli, t_ok)."""
    g = text_stats(docs).select("doc_id", "grade")
    j = (
        docs.join(g, "doc_id")
        .selectExpr(
            "lang", "source",
            f"CAST(n_chars AS BIGINT) DIV {_KANON_BAND} AS len_band",
            "grade",
        )
        .localCheckpoint(eager=False)
    )
    cell = j.groupBy("lang", "source", "len_band", "grade").agg(
        F.count("*").cast("bigint").alias("ng")
    )
    grp = j.groupBy("lang", "source", "len_band").agg(
        F.count("*").cast("bigint").alias("n")
    )
    glob = j.groupBy("grade").agg(F.count("*").cast("bigint").alias("m"))
    nn = j.agg(F.count("*").cast("bigint").alias("nn"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(nn))
        .join(cell, ["lang", "source", "len_band", "grade"], "left")
        .selectExpr(
            "lang", "source", "len_band", "n", "nn",
            "abs(coalesce(ng, 0) * nn - m * n) AS term",
        )
    )
    return (
        grid.groupBy("lang", "source", "len_band", "n")
        .agg(
            F.expr(
                "CAST((1000 * sum(term)) DIV (2 * max(n) * max(nn))"
                " AS BIGINT)"
            ).alias("tv_milli")
        )
        .selectExpr(
            "lang", "source", "len_band", "n", "tv_milli",
            f"CAST(tv_milli <= {t_milli} AS BIGINT) AS t_ok",
        )
    )


def tcloseness_oracle(t_milli: int = TCLOSE_T_MILLI) -> str:
    return f"""
WITH {quality_oracle_ctes('tc')},
tc_gr AS (
  SELECT doc_id,
         CASE WHEN quality >= 80 THEN 'A' WHEN quality >= 60 THEN 'B'
              WHEN quality >= 40 THEN 'C' ELSE 'D' END AS grade
  FROM tc_q),
tc_j AS (
  SELECT d.lang, d.source,
         CAST(d.n_chars AS BIGINT) // {_KANON_BAND} AS len_band, g.grade
  FROM documents d JOIN tc_gr g ON g.doc_id = d.doc_id),
tc_cell AS (
  SELECT lang, source, len_band, grade,
         CAST(count(*) AS BIGINT) AS ng
  FROM tc_j GROUP BY 1, 2, 3, 4),
tc_grp AS (
  SELECT lang, source, len_band, CAST(count(*) AS BIGINT) AS n
  FROM tc_j GROUP BY 1, 2, 3),
tc_glob AS (SELECT grade, CAST(count(*) AS BIGINT) AS m FROM tc_j
            GROUP BY 1),
tc_nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tc_j),
tc_grid AS (
  SELECT g.lang, g.source, g.len_band, g.n, x.nn,
         abs(coalesce(c.ng, 0) * x.nn - o.m * g.n) AS term
  FROM tc_grp g CROSS JOIN tc_glob o CROSS JOIN tc_nn x
  LEFT JOIN tc_cell c
    ON c.lang = g.lang AND c.source = g.source
   AND c.len_band = g.len_band AND c.grade = o.grade)
SELECT lang, source, len_band, n,
       CAST((1000 * sum(term)) // (2 * max(n) * max(nn)) AS BIGINT)
         AS tv_milli,
       CAST(CAST((1000 * sum(term)) // (2 * max(n) * max(nn)) AS BIGINT)
            <= {t_milli} AS BIGINT) AS t_ok
FROM tc_grid GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# R239: isotonic recalibration (PAVA) of the reliability table — the
# post-hoc calibrator (Zadrozny & Elkan 2002) every production scoring
# pipeline runs after measuring the miscalibration calibration_bins
# reports. Computed EXACTLY via the minimax characterization of isotonic
# regression:  iso_i = max_{j<=i} min_{k>=i} rate(j..k)  — and because
# floor is monotone it commutes with max/min, so evaluating every
# segment rate as the floored integer 1000*(P_k - P0_j) DIV (N_k - N0_j)
# yields exactly floor(1000 * iso_exact). No sequential pooling loop,
# no floats: the whole solve is one triple fan over the bounded bin
# dimension (B^3 = 1000 tuples for B = 10), engine-identical.
#
# Scale: the corpus collapses to the B-bin (n, n_pos) table in one scan
# (calibration_bins' shape); everything after lives on B rows.
# ---------------------------------------------------------------------------


def isotonic_calibration(docs: DataFrame) -> DataFrame:
    """(bin, n, n_pos, rate_pm, iso_pm, pooled): the reliability table's
    empirical positive rate and its exact isotonic (PAVA) fit."""
    base = text_stats(docs).selectExpr(
        f"CAST(quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos",
        "(1000 * n_distinct_tokens) DIV n_tokens AS s",
    )
    bins = (
        base.groupBy(
            F.expr(f"least(s DIV {1000 // CAL_BINS}, {CAL_BINS - 1})")
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "n", "n_pos",
        F.sum("n_pos").over(w).alias("cp"),
        F.sum("n").over(w).alias("cn"),
    ).selectExpr(
        "bin", "n", "n_pos", "cp", "cn",
        "cp - n_pos AS cp0", "cn - n AS cn0",
    )
    j = cum.selectExpr("bin AS jb", "cp0", "cn0")
    k = cum.selectExpr("bin AS kb", "cp", "cn")
    seg = (
        j.join(F.broadcast(k), F.expr("kb >= jb"))
        .selectExpr(
            "jb", "kb", "(1000 * (cp - cp0)) DIV (cn - cn0) AS r"
        )
    )
    mins = (
        cum.selectExpr("bin AS ib")
        .join(F.broadcast(seg), F.expr("jb <= ib AND kb >= ib"))
        .groupBy("ib", "jb")
        .agg(F.min("r").alias("mr"))
    )
    iso = (
        mins.groupBy("ib")
        .agg(F.expr("CAST(max(mr) AS BIGINT)").alias("iso_pm"))
        .selectExpr("ib AS bin", "iso_pm")
    )
    return (
        cum.join(F.broadcast(iso), "bin")
        .selectExpr(
            "bin", "n", "n_pos",
            "(1000 * n_pos) DIV n AS rate_pm",
            "iso_pm",
            "CAST(iso_pm <> (1000 * n_pos) DIV n AS BIGINT) AS pooled",
        )
    )


def isotonic_oracle() -> str:
    return f"""
WITH {quality_oracle_ctes('iso')},
iso_lab AS (
  SELECT CAST(q.quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos,
         (1000 * c.n_distinct_tokens) // c.n_tokens AS s
  FROM iso_q q JOIN iso_cnt c ON c.doc_id = q.doc_id),
iso_bins AS (
  SELECT least(s // {1000 // CAL_BINS}, {CAL_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM iso_lab GROUP BY 1),
iso_cum AS (
  SELECT bin, n, n_pos,
         sum(n_pos) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         sum(n) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
  FROM iso_bins),
iso_c AS (
  SELECT bin, n, n_pos, cp, cn, cp - n_pos AS cp0, cn - n AS cn0
  FROM iso_cum),
iso_seg AS (
  SELECT j.bin AS jb, k.bin AS kb,
         (1000 * (k.cp - j.cp0)) // (k.cn - j.cn0) AS r
  FROM iso_c j JOIN iso_c k ON k.bin >= j.bin),
iso_min AS (
  SELECT i.bin AS ib, s.jb, min(s.r) AS mr
  FROM iso_c i JOIN iso_seg s ON s.jb <= i.bin AND s.kb >= i.bin
  GROUP BY 1, 2),
iso_fit AS (
  SELECT ib AS bin, CAST(max(mr) AS BIGINT) AS iso_pm
  FROM iso_min GROUP BY 1)
SELECT c.bin, c.n, c.n_pos,
       (1000 * c.n_pos) // c.n AS rate_pm,
       f.iso_pm,
       CAST(f.iso_pm <> (1000 * c.n_pos) // c.n AS BIGINT) AS pooled
FROM iso_c c JOIN iso_fit f ON f.bin = c.bin"""


# ---------------------------------------------------------------------------
# R298: precision-recall AUC — the IMBALANCE-honest companion to R180's
# ROC AUC (Davis & Goadrich 2006): with a ~1:3 positive rate, ROC can
# look healthy while PR collapses toward the prevalence baseline. Same
# bounded 0..1000 score histogram (no global rank over docs); blocks
# processed score-descending, per-block precision in exact milli off
# cumulative TP/FP, trapezoid fold between consecutive block
# boundaries ((S DIV 2) DIV n_pos — every term < 2^63 at 10^12 docs
# since sum(np_s * <= 2000) <= 2000 * n).
# ---------------------------------------------------------------------------


def pr_auc_eval(docs: DataFrame) -> DataFrame:
    """(scorer, n_pos, n_neg, prevalence_milli, pr_auc_milli):
    trapezoid PR-AUC of each scorer vs the grade-A label off the
    bounded score histogram. Baseline = prevalence; a scorer only
    earns its keep above it."""
    from pyspark.sql import Window

    base = text_stats(docs).selectExpr(
        f"CAST(quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos",
        "(1000 * n_distinct_tokens) DIV n_tokens AS s_diversity",
        "(1000 * n_stop) DIV n_tokens AS s_stop_density",
    )
    outs = []
    for scorer in ("diversity", "stop_density"):
        hist = base.groupBy(F.col(f"s_{scorer}").alias("s")).agg(
            F.sum("pos").alias("np_s"),
            F.expr("sum(1 - pos)").alias("nn_s"),
        )
        w = Window.orderBy(F.desc("s")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        wl = Window.orderBy(F.desc("s"))
        blocks = (
            hist.withColumn("ctp", F.sum("np_s").over(w))
            .withColumn("cfp", F.sum("nn_s").over(w))
            .withColumn(
                "p_milli", F.expr("(1000 * ctp) DIV (ctp + cfp)")
            )
            .withColumn(
                "prev_p",
                F.coalesce(F.lag("p_milli").over(wl), F.col("p_milli")),
            )
        )
        outs.append(
            blocks.groupBy()
            .agg(
                F.sum("np_s").alias("n_pos"),
                F.sum("nn_s").alias("n_neg"),
                F.expr("sum(np_s * (p_milli + prev_p))").alias("s2"),
            )
            .selectExpr(
                f"'{scorer}' AS scorer",
                "CAST(n_pos AS BIGINT) AS n_pos",
                "CAST(n_neg AS BIGINT) AS n_neg",
                "CAST((1000 * n_pos) DIV (n_pos + n_neg) AS BIGINT)"
                " AS prevalence_milli",
                "CAST((s2 DIV 2) DIV n_pos AS BIGINT) AS pr_auc_milli",
            )
        )
    return outs[0].unionByName(outs[1])


def pr_auc_oracle() -> str:
    arms = []
    for scorer in ("diversity", "stop_density"):
        arms.append(f"""
  SELECT '{scorer}' AS scorer,
         CAST(sum(np_s) AS BIGINT) AS n_pos,
         CAST(sum(nn_s) AS BIGINT) AS n_neg,
         CAST((1000 * sum(np_s)) // (sum(np_s) + sum(nn_s)) AS BIGINT)
           AS prevalence_milli,
         CAST((sum(np_s * (p_milli + prev_p)) // 2) // sum(np_s)
           AS BIGINT) AS pr_auc_milli
  FROM (
    SELECT np_s, nn_s, p_milli,
           coalesce(lag(p_milli) OVER (ORDER BY s DESC), p_milli)
             AS prev_p
    FROM (
      SELECT s, np_s, nn_s,
             (1000 * sum(np_s) OVER cum)
               // (sum(np_s) OVER cum + sum(nn_s) OVER cum) AS p_milli
      FROM (
        SELECT s_{scorer} AS s, sum(pos) AS np_s, sum(1 - pos) AS nn_s
        FROM pra_lab GROUP BY 1)
      WINDOW cum AS (ORDER BY s DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))""")
    both = "\n  UNION ALL\n".join(arms)
    return f"""
WITH {quality_oracle_ctes('pra')},
pra_lab AS (
  SELECT CAST(q.quality >= {AUC_POS_QUALITY} AS BIGINT) AS pos,
         (1000 * c.n_distinct_tokens) // c.n_tokens AS s_diversity,
         (1000 * c.n_stop) // c.n_tokens AS s_stop_density
  FROM pra_q q JOIN pra_cnt c ON c.doc_id = q.doc_id)
{both}"""


# ---------------------------------------------------------------------------
# R316: recursive (c,l)-diversity audit (Machanavajjhala 2007 §4) — the
# rung between kanon_audit (distinct-l) and tcloseness_audit: a QI
# group is recursive (c,l)-diverse iff the MOST FREQUENT sensitive
# value is outweighed by the tail from rank l on, r1 < c·(r_l+…+r_m).
# Defends against probabilistic inference where distinct-l still
# passes (one dominant grade + token others). Exact integers: counts
# ranked (count DESC, grade) — the rank-l tail SUM is invariant to
# equal-count tie order, and the tie-break makes the ranking itself
# engine-identical. Same QI key as kanon (lang, source, len_band);
# bounded sensitive dimension (4 grades) ⇒ per-group windows touch
# ≤ 4 rows.
# ---------------------------------------------------------------------------

RCL_C = 2
RCL_L = 2


def l_diversity(
    docs: DataFrame, c: int = RCL_C, l_div: int = RCL_L
) -> DataFrame:
    """(lang, source, len_band, n, n_grades, r1, tail_l, rcl_ok)."""
    g = text_stats(docs).select("doc_id", "grade")
    cells = (
        docs.join(g, "doc_id")
        .groupBy(
            "lang", "source",
            F.expr(f"CAST(n_chars AS BIGINT) DIV {_KANON_BAND}").alias(
                "len_band"
            ),
            "grade",
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    ranked = cells.selectExpr(
        "lang", "source", "len_band", "c",
        "CAST(row_number() OVER (PARTITION BY lang, source, len_band"
        " ORDER BY c DESC, grade) AS BIGINT) AS rk",
    )
    return (
        ranked.groupBy("lang", "source", "len_band")
        .agg(
            F.expr("CAST(sum(c) AS BIGINT)").alias("n"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_grades"),
            F.expr("CAST(max(CASE WHEN rk = 1 THEN c END) AS BIGINT)").alias(
                "r1"
            ),
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN rk >= {l_div} THEN c END), 0)"
                " AS BIGINT)"
            ).alias("tail_l"),
        )
        .selectExpr(
            "lang", "source", "len_band", "n", "n_grades", "r1", "tail_l",
            f"CAST(r1 < {c} * tail_l AS BIGINT) AS rcl_ok",
        )
    )


def l_diversity_oracle(c: int = RCL_C, l_div: int = RCL_L) -> str:
    return f"""
WITH {quality_oracle_ctes('rcl')},
rcl_gr AS (
  SELECT doc_id,
         CASE WHEN quality >= 80 THEN 'A' WHEN quality >= 60 THEN 'B'
              WHEN quality >= 40 THEN 'C' ELSE 'D' END AS grade
  FROM rcl_q),
rcl_cells AS (
  SELECT d.lang, d.source,
         CAST(d.n_chars AS BIGINT) // {_KANON_BAND} AS len_band, g.grade,
         CAST(count(*) AS BIGINT) AS c
  FROM documents d JOIN rcl_gr g ON g.doc_id = d.doc_id
  GROUP BY 1, 2, 3, 4),
rcl_rk AS (
  SELECT lang, source, len_band, c,
         CAST(row_number() OVER (PARTITION BY lang, source, len_band
           ORDER BY c DESC, grade) AS BIGINT) AS rk
  FROM rcl_cells)
SELECT lang, source, len_band,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_grades,
       CAST(max(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS r1,
       CAST(coalesce(sum(CASE WHEN rk >= {l_div} THEN c END), 0)
         AS BIGINT) AS tail_l,
       CAST(max(CASE WHEN rk = 1 THEN c END)
          < {c} * coalesce(sum(CASE WHEN rk >= {l_div} THEN c END), 0)
         AS BIGINT) AS rcl_ok
FROM rcl_rk GROUP BY 1, 2, 3"""
