"""Token co-occurrence association mining (SURVEY §2.12 R78): the
market-basket operator over the documents corpus.

The reference mines identifier co-occurrence inside a scope when ranking
related symbols (``code_similarity.py`` token-set machinery); the corpus
analog is classic association-rule mining: which token pairs co-occur in
documents far more than independence predicts? The statistic is LIFT —
``P(a,b) / (P(a)·P(b))`` — kept log-free and exact as
``lift_milli = (1000·c_ab·N) DIV (c_a·c_b)`` (>1000 ⟹ positive
association), the same integer-ratio discipline as Knox and CLQ.

Scale shape: the pair fan is per-document over the DISTINCT token set
(bounded by doc length, never vocabulary²), joined doc-keyed — the
standard pairs-within-group discipline; pair counts and token document
frequencies are two hash aggregations, and the DF frame broadcasts back
onto the (tiny) pair frame. At 10^12 docs nothing here depends on corpus
size except the two keyed aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_SUPPORT = 5


def token_lift(docs: DataFrame, min_support: int = MIN_SUPPORT) -> DataFrame:
    """(wa, wb, c_ab, lift_milli) for every token pair co-occurring in at
    least ``min_support`` documents; wa < wb lexicographically (each
    unordered pair once)."""
    tok = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .where(F.col("w") != "")
        .distinct()
    )
    tf = tok.groupBy("w").agg(F.count("*").alias("c"))
    n = docs.agg(F.count("*").alias("n_docs"))
    a = tok.select("doc_id", F.col("w").alias("wa"))
    b = tok.select("doc_id", F.col("w").alias("wb"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("wa") < F.col("wb"))
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= min_support)
    )
    return (
        pairs.join(
            F.broadcast(tf.select(F.col("w").alias("wa"), F.col("c").alias("ca"))),
            "wa",
        )
        .join(
            F.broadcast(tf.select(F.col("w").alias("wb"), F.col("c").alias("cb"))),
            "wb",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "wa",
            "wb",
            "c_ab",
            F.expr("(1000 * c_ab * n_docs) DIV (ca * cb)").alias(
                "lift_milli"
            ),
        )
    )


def token_lift_oracle_sql(min_support: int = MIN_SUPPORT) -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w != ''),
tf AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.w AS wa, b.w AS wb, count(*) AS c_ab
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
  HAVING count(*) >= {min_support})
SELECT wa, wb, c_ab,
       (1000 * c_ab * n.n_docs) // (ta.c * tb.c) AS lift_milli
FROM pairs
JOIN tf ta ON ta.w = pairs.wa
JOIN tf tb ON tb.w = pairs.wb
CROSS JOIN n"""
