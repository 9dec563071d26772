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
