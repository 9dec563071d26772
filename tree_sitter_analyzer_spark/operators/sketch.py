"""Deterministic streaming sketches: count-min heavy hitters.

The reference keeps *approximate summaries* wherever exact state would be
unbounded — the FTS index's document-frequency noise caps
(/root/reference/tree_sitter_analyzer/_ast_cache_search.py:23-98) and the
capped-with-true-total envelopes (hyphae/evaluator.py:83-144). The
count-min sketch (Cormode & Muthukrishnan 2005) is the canonical
engine-side version of that idea: a fixed d×w integer grid summarizing an
unbounded token stream, estimates biased HIGH only (est ≥ exact always —
the invariant the tests pin).

Determinism = oracleability: the d hash rows are md5-seeded
(functions.md5int_*, the engine-portable 32-bit hash), so DuckDB can
replicate the ENTIRE sketch bit-for-bit — the estimate itself is
hash-verified, not just the final counts (same discipline as the
deterministic LSH/IVF plans, CLAUDE.md).

Scale shape: the sketch build is ONE map-side-combinable groupBy of the
token stream onto d·w ≤ a few hundred keys — the shuffle carries the
sketch, never the stream. At 100 TB the d×w frame is a mergeable monoid:
per-partition partial sketches sum cell-wise (Spark's partial/final hash
agg does exactly this). Probes broadcast the tiny sketch frame back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import md5int_duck, md5int_spark

DEPTH = 3          # independent hash rows
WIDTH = 16         # buckets per row — small enough that collisions HAPPEN
TOP_K = 15         # heavy hitters reported


def _bucket_spark(tok: str, j: str) -> str:
    # non-negative 32-bit hash → plain % is identical cross-engine
    seeded = f"concat('s', {j}, '|', {tok})"
    return f"({md5int_spark(seeded)} % {WIDTH})"


def _bucket_duck(tok: str, j: str) -> str:
    seeded = f"('s' || {j} || '|' || {tok})"
    return f"({md5int_duck(seeded)} % {WIDTH})"


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.explode(F.expr("split(lower(text), ' ')")).alias("tok")
    ).where("tok <> ''")


def cms_heavy_hitters(docs: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """Count-min estimates beside exact counts for the ``top_k`` most
    frequent whitespace tokens of ``documents.text``.

    Returns (rank, tok, exact_cnt, cms_est, overcount) ordered by rank —
    rank is deterministic (count desc, token asc). ``cms_est ≥
    exact_cnt`` for every row by construction (min over d rows of
    counters that each upper-bound the true count); ``overcount`` is the
    collision-induced bias the small WIDTH makes visible.

    Plan: token stream → ×d fan → groupBy (j, bucket) builds the d×w
    sketch (one shuffle onto ≤ d·w keys, map-side combined); the exact
    top-k frame (the driver of a real heavy-hitter report) probes the
    broadcast sketch with a (j, bucket) equi-join.
    """
    toks = _tokens(docs)
    js = ", ".join(str(j) for j in range(DEPTH))
    sketch = (
        toks.select(
            "tok", F.explode(F.expr(f"array({js})")).alias("j")
        )
        .select("j", F.expr(_bucket_spark("tok", "j")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_cnt"))
        .select(
            "tok",
            "exact_cnt",
            F.expr(
                "row_number() OVER (ORDER BY exact_cnt DESC, tok)"
            ).alias("rank"),
        )
        .where(F.col("rank") <= top_k)
    )
    probes = top.select(
        "rank", "tok", "exact_cnt",
        F.explode(F.expr(f"array({js})")).alias("j"),
    ).select(
        "rank", "tok", "exact_cnt", "j",
        F.expr(_bucket_spark("tok", "j")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("rank", "tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "rank", "tok", "exact_cnt", "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
    )


def cms_heavy_hitters_oracle_sql(top_k: int = TOP_K) -> str:
    """DuckDB replica — the same seeded hashes rebuild the same sketch."""
    return f"""
WITH toks AS (
  SELECT t.tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
  WHERE t.tok <> ''
),
js(j) AS (VALUES {', '.join(f'({j})' for j in range(DEPTH))}),
sketch AS (
  SELECT j, {_bucket_duck('tok', 'j')} AS bucket, count(*) AS cnt
  FROM toks CROSS JOIN js GROUP BY 1, 2
),
top AS (
  SELECT tok, count(*) AS exact_cnt,
         row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
  FROM toks GROUP BY tok
  QUALIFY rank <= {top_k}
),
probes AS (
  SELECT rank, tok, exact_cnt, j, {_bucket_duck('tok', 'j')} AS bucket
  FROM top CROSS JOIN js
)
SELECT p.rank, p.tok, p.exact_cnt, min(s.cnt) AS cms_est,
       min(s.cnt) - p.exact_cnt AS overcount
FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
GROUP BY 1, 2, 3"""
