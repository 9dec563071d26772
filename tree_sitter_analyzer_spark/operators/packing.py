"""Sequence packing — the LLM-training batch-assembly operator.

Training pipelines pack variable-length documents into fixed-capacity
token windows (next-fit bin packing: walk the shard in order, start a new
sequence when the next doc no longer fits). The packing recurrence is
inherently sequential PER SHARD, so the distributed shape is: hash the
corpus into shards, pack each shard independently inside one Arrow
``applyInPandas`` group — the exact layout real pipelines use (packing
parallelism = shard count; at 100 TB the shard count is millions, each
shard bounded, so the sequential inner loop never sees more than one
shard's rows). No cross-shard coordination exists by construction.

Cross-engine parity: the per-shard walk is a linear recurrence, which
DuckDB replays exactly with a recursive CTE stepping rn → rn+1 per shard
(all shards advance in lockstep, so recursion depth = max shard length,
not corpus size). Token counts are integer ``regexp_count`` on both
engines; docs longer than the capacity are truncated to it (they occupy
a full sequence alone), keeping every fill ≤ CAP.

Reference analog: the reference batches files into fixed-size work units
for its extraction workers (``ast_cache.py`` chunked scheduling);
SURVEY.md §2.12 R142.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from ..functions import md5int_duck, md5int_spark

PACK_CAP = 512      # tokens per packed sequence
PACK_SHARDS = 16    # hash shards (the parallel unit)

_GRP_SPARK = f"({md5int_spark('CAST(doc_id AS STRING)')} % {PACK_SHARDS})"
_GRP_DUCK = f"({md5int_duck('CAST(doc_id AS VARCHAR)')} % {PACK_SHARDS})"

_PACK_SCHEMA = StructType(
    [
        StructField("grp", LongType()),
        StructField("bin_id", LongType()),
        StructField("n_docs", LongType()),
        StructField("fill_tokens", LongType()),
    ]
)


def doc_units(docs: DataFrame) -> DataFrame:
    """(grp, rn, t): shard id, within-shard order, capped token count."""
    return docs.selectExpr(
        f"{_GRP_SPARK} AS grp",
        "doc_id",
        f"least(CAST(regexp_count(text, '[^ ]+') AS BIGINT),"
        f" {PACK_CAP}) AS t",
    ).selectExpr(
        "grp",
        "row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn",
        "t",
    )


def _pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("rn")
    grp = int(pdf["grp"].iloc[0])
    rows, bin_id, fill, n_docs = [], 1, 0, 0
    for t in pdf["t"].astype(int):
        if n_docs and fill + t > PACK_CAP:
            rows.append((grp, bin_id, n_docs, fill))
            bin_id, fill, n_docs = bin_id + 1, 0, 0
        fill += t
        n_docs += 1
    rows.append((grp, bin_id, n_docs, fill))
    return pd.DataFrame(
        rows, columns=["grp", "bin_id", "n_docs", "fill_tokens"]
    )


def seq_packing(docs: DataFrame) -> DataFrame:
    """Next-fit packed sequences per shard: (grp, bin_id, n_docs,
    fill_tokens), every fill ≤ PACK_CAP by construction."""
    return (
        doc_units(docs)
        .repartition(PACK_SHARDS, "grp")
        .groupBy("grp")
        .applyInPandas(_pack_shard, _PACK_SCHEMA)
    )


def seq_packing_oracle() -> str:
    return f"""
WITH RECURSIVE pk_units AS (
  SELECT grp,
         row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn,
         t
  FROM (
    SELECT {_GRP_DUCK} AS grp, doc_id,
           least(CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT),
                 {PACK_CAP}) AS t
    FROM documents
  )
),
pk_walk(grp, rn, bin_id, fill) AS (
  SELECT grp, rn, CAST(1 AS BIGINT), t FROM pk_units WHERE rn = 1
  UNION ALL
  SELECT u.grp, u.rn,
         CASE WHEN w.fill + u.t > {PACK_CAP} THEN w.bin_id + 1
              ELSE w.bin_id END,
         CASE WHEN w.fill + u.t > {PACK_CAP} THEN u.t
              ELSE w.fill + u.t END
  FROM pk_walk w JOIN pk_units u ON u.grp = w.grp AND u.rn = w.rn + 1
)
SELECT grp, bin_id, count(*) AS n_docs, max(fill) AS fill_tokens
FROM pk_walk GROUP BY grp, bin_id
"""


# ---------------------------------------------------------------------------
# R149: domain-mix sampling (the DoReMi / data-mixture idea, public) —
# given per-source mixing weights, draw a deterministic sample whose
# source composition matches the weights exactly: quotas by the
# largest-remainder method (Hamilton apportionment — base = floor
# allocation, the remainder seats go to the largest fractional parts,
# compared as exact integers (N·w) mod W with source-name tie-break),
# then the lowest-md5 docs per source fill each quota (the engine's
# deterministic stand-in for a uniform draw). Output is the sample
# itself, so composition is auditable row-by-row.
# Scale: quotas live on the tiny source dimension; the pick is one
# source-keyed window over the corpus — exactly how a mixture sampler
# shards at 100 TB.
# ---------------------------------------------------------------------------

MIX_TARGET = 100  # sample size

# weight per source: md5-derived 1..9 (portable, no source-name parsing)
_W_SPARK = f"(({md5int_spark('source')} % 9) + 1)"
_W_DUCK = f"(({md5int_duck('source')} % 9) + 1)"


def domain_mix_sample(docs: DataFrame, n_target: int = MIX_TARGET) -> DataFrame:
    """(source, doc_id, pick_rank, quota): largest-remainder quotas over
    md5 weights, lowest-md5-first picks per source."""
    from pyspark.sql.window import Window

    srcs = (
        docs.selectExpr("source", f"{_W_SPARK} AS w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("avail"))
    )
    tot = srcs.agg(F.sum("w").alias("wsum"), F.sum("avail").alias("n_docs"))
    rw = Window.orderBy(
        F.desc(F.expr(f"({n_target} * w) % wsum")), "source"
    )
    quotas = (
        srcs.crossJoin(F.broadcast(tot))
        .withColumn("base", F.expr(f"({n_target} * w) DIV wsum"))
        .withColumn("frac_rank", F.row_number().over(rw))
        .withColumn(
            "rem",
            F.expr(
                f"{n_target} - sum(base) OVER ()"
            ),
        )
        .selectExpr(
            "source",
            "least(base + CASE WHEN frac_rank <= rem THEN 1 ELSE 0 END,"
            " avail) AS quota",
        )
    )
    pw = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.selectExpr(
            "source", "doc_id",
            f"{md5int_spark('CAST(doc_id AS STRING)')} AS h",
        )
        .withColumn("pick_rank", F.row_number().over(pw))
        .join(F.broadcast(quotas), "source")
        .where(F.col("pick_rank") <= F.col("quota"))
        .select("source", "doc_id", "pick_rank", "quota")
    )


def domain_mix_oracle(n_target: int = MIX_TARGET) -> str:
    return f"""
WITH mx_srcs AS (
  SELECT source, {_W_DUCK} AS w, count(*) AS avail
  FROM documents GROUP BY 1, 2
),
mx_tot AS (SELECT sum(w) AS wsum FROM mx_srcs),
mx_quota AS (
  SELECT source,
         least(({n_target} * w) // wsum
               + CASE WHEN row_number() OVER (
                     ORDER BY ({n_target} * w) % wsum DESC, source)
                   <= {n_target} - sum(({n_target} * w) // wsum) OVER ()
                 THEN 1 ELSE 0 END,
               avail) AS quota
  FROM mx_srcs CROSS JOIN mx_tot
),
mx_ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {md5int_duck('CAST(doc_id AS VARCHAR)')}, doc_id
         ) AS pick_rank
  FROM documents
)
SELECT r.source, r.doc_id, r.pick_rank, q.quota
FROM mx_ranked r JOIN mx_quota q ON q.source = r.source
WHERE r.pick_rank <= q.quota
"""


# ---------------------------------------------------------------------------
# R164: rendezvous (highest-random-weight) shard-placement audit
# (Thaler & Ravishankar 1996 — the consistent-placement scheme behind
# Dynamo/Cassandra-style stores). Each key joins the shard whose
# md5(shard, key) weight is highest; expanding N→N+1 provably moves keys
# ONLY to the new shard (a key moves iff the new shard's weight beats
# its old winner — every old pairwise order is unchanged), and the audit
# emits that witness (moved_not_to_new, pinned 0) beside the balance and
# churn numbers a platform team actually reviews (expected churn =
# 1/(N+1) of keys). Pure per-row projection + one 9-group aggregate —
# the incremental-recompute placement story at 100 TB.
# ---------------------------------------------------------------------------

RDV_N = 8  # audit expands RDV_N -> RDV_N + 1


def _rdv_weight_spark(s: int) -> str:
    from ..functions import md5int_spark

    return f"({md5int_spark(f''''s{s}#' || CAST(doc_id AS STRING)''')} * 16 + {s})"


def _rdv_weight_duck(s: int) -> str:
    from ..functions import md5int_duck

    return f"({md5int_duck(f''''s{s}#' || CAST(doc_id AS VARCHAR)''')} * 16 + {s})"


def rendezvous_audit(docs: DataFrame) -> DataFrame:
    """One row: (n_keys, max_load, min_load, moved, moved_not_to_new,
    churn_pm) for the RDV_N → RDV_N+1 expansion over doc_id keys."""
    g8 = ", ".join(_rdv_weight_spark(s) for s in range(RDV_N))
    g9 = ", ".join(_rdv_weight_spark(s) for s in range(RDV_N + 1))
    assign = docs.selectExpr(
        "doc_id",
        f"GREATEST({g8}) % 16 AS a8",
        f"GREATEST({g9}) % 16 AS a9",
    ).localCheckpoint(eager=False)
    loads = (
        assign.groupBy("a8")
        .agg(F.count("*").alias("load"))
        .agg(
            F.max("load").cast("bigint").alias("max_load"),
            F.min("load").cast("bigint").alias("min_load"),
        )
    )
    glob = assign.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.expr("CAST(sum(CASE WHEN a8 <> a9 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("moved"),
        F.expr(
            f"CAST(sum(CASE WHEN a8 <> a9 AND a9 <> {RDV_N} THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("moved_not_to_new"),
    )
    return glob.crossJoin(loads).selectExpr(
        "n_keys", "max_load", "min_load",
        "moved", "moved_not_to_new",
        "(1000 * moved) DIV n_keys AS churn_pm",
    )


def rendezvous_oracle() -> str:
    g8 = ", ".join(_rdv_weight_duck(s) for s in range(RDV_N))
    g9 = ", ".join(_rdv_weight_duck(s) for s in range(RDV_N + 1))
    return f"""
WITH rdv_a AS (
  SELECT doc_id,
         GREATEST({g8}) % 16 AS a8,
         GREATEST({g9}) % 16 AS a9
  FROM documents),
rdv_l AS (
  SELECT CAST(max(load) AS BIGINT) AS max_load,
         CAST(min(load) AS BIGINT) AS min_load
  FROM (SELECT a8, count(*) AS load FROM rdv_a GROUP BY 1)),
rdv_g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN a8 <> a9 THEN 1 ELSE 0 END) AS BIGINT) AS moved,
         CAST(sum(CASE WHEN a8 <> a9 AND a9 <> {RDV_N} THEN 1 ELSE 0 END)
              AS BIGINT) AS moved_not_to_new
  FROM rdv_a)
SELECT n_keys, max_load, min_load, moved, moved_not_to_new,
       (1000 * moved) // n_keys AS churn_pm
FROM rdv_g CROSS JOIN rdv_l"""


# ---------------------------------------------------------------------------
# R175: file-compaction planner — the lakehouse OPTIMIZE primitive, and
# byte-for-byte the packing rule Spark's own scan planner applies under
# spark.sql.files.maxPartitionBytes: within each partition (source),
# files in name order fill linear byte bins, bin = running_sum_before
# DIV target (a big file may straddle — splittable-format semantics,
# exactly like parquet row-group splitting). The plan is ONE window
# cumsum per partition-keyed exchange; the small-file problem this
# solves is THE metadata bottleneck at 100 TB.
# ---------------------------------------------------------------------------

COMPACT_TARGET = 8192  # bytes per compaction group (sf-scaled corpus)


def compaction_plan(docs: DataFrame, target: int = COMPACT_TARGET) -> DataFrame:
    """(source, bin, n_files, total_bytes, fill_pm): linear-fill
    compaction groups over the doc 'files' (size = n_chars), name order
    = doc_id."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select("source", "doc_id", F.col("n_chars").cast("bigint").alias("sz"))
        .withColumn("before", F.coalesce(F.sum("sz").over(w), F.lit(0)))
        .withColumn("bin", F.expr(f"before DIV {target}"))
        .groupBy("source", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("sz").cast("bigint").alias("total_bytes"),
        )
        .withColumn("fill_pm", F.expr(f"(1000 * total_bytes) DIV {target}"))
    )


def compaction_oracle(target: int = COMPACT_TARGET) -> str:
    return f"""
WITH cp_f AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS sz,
         coalesce(sum(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM documents)
SELECT source, before // {target} AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(sz) AS BIGINT) AS total_bytes,
       (1000 * CAST(sum(sz) AS BIGINT)) // {target} AS fill_pm
FROM cp_f GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# R182: priority sampling (Duffield, Lund & Thorup 2007) — the weighted
# sample that answers subset-sum questions unbiasedly: priority
# q_i = w_i·R DIV h_i with h_i md5-uniform in [1, R], keep the top-k
# by (q, doc_id), threshold tau = the (k+1)-th priority, estimator
# w-hat_i = max(w_i, tau) for sampled rows and 0 otherwise. All-integer
# end-to-end, so both engines replay the identical sample AND the
# identical estimates. The audit groups the estimates by source and
# reports them beside the exact per-source char totals.
# Scale shape: top-k is partition-independent, so the Spark side runs
# the KMV two-phase discipline — per-partition top-(k+1) first (map-side
# bound: k+1 rows per task survive), then the global top-(k+1) over the
# tiny survivor frame; tau reaches the sample via a broadcast one-row
# frame, never a driver collect. The oracle is the flat global window
# (legitimate because top-k is order- and partition-independent).
# ---------------------------------------------------------------------------

PRIO_K = 64
PRIO_R = 1 << 30

_PRIO_H_SPARK = f"(({md5int_spark('CAST(doc_id AS STRING)')}) % {PRIO_R}) + 1"
_PRIO_H_DUCK = f"(({md5int_duck('CAST(doc_id AS VARCHAR)')}) % {PRIO_R}) + 1"


def priority_sample_audit(docs: DataFrame, k: int = PRIO_K) -> DataFrame:
    """(source, n_docs, n_sampled, exact_chars, est_chars, err_pm):
    per-source subset-sum estimates from one global k-row priority
    sample vs the exact totals."""
    keyed = docs.selectExpr(
        "doc_id", "source",
        "CAST(n_chars AS BIGINT) AS w",
        f"CAST(n_chars AS BIGINT) * {PRIO_R} DIV ({_PRIO_H_SPARK}) AS q",
    )
    part = (
        keyed.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("pid").orderBy(
                    F.desc("q"), F.desc("doc_id")
                )
            ),
        )
        .where(F.col("prn") <= k + 1)
    )
    ranked = part.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("q"), F.desc("doc_id"))),
    ).where(F.col("rn") <= k + 1)
    tau = ranked.where(F.col("rn") == k + 1).select(
        F.col("q").alias("tau")
    )
    sampled = (
        ranked.where(F.col("rn") <= k)
        .crossJoin(F.broadcast(tau))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.expr("sum(greatest(w, tau))").cast("bigint").alias("est_chars"),
        )
    )
    exact = keyed.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("exact_chars"),
    )
    return (
        exact.join(sampled, "source", "left")
        .selectExpr(
            "source", "n_docs",
            "coalesce(n_sampled, CAST(0 AS BIGINT)) AS n_sampled",
            "exact_chars",
            "coalesce(est_chars, CAST(0 AS BIGINT)) AS est_chars",
            "(1000 * abs(coalesce(est_chars, CAST(0 AS BIGINT))"
            " - exact_chars)) DIV exact_chars AS err_pm",
        )
    )


def priority_sample_oracle(k: int = PRIO_K) -> str:
    return f"""
WITH ps_keyed AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         CAST(n_chars AS BIGINT) * {PRIO_R} // ({_PRIO_H_DUCK}) AS q
  FROM documents),
ps_rank AS (
  SELECT *, row_number() OVER (ORDER BY q DESC, doc_id DESC) AS rn
  FROM ps_keyed),
ps_tau AS (SELECT q AS tau FROM ps_rank WHERE rn = {k} + 1),
ps_samp AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
         CAST(sum(greatest(w, t.tau)) AS BIGINT) AS est_chars
  FROM ps_rank r CROSS JOIN ps_tau t
  WHERE r.rn <= {k} GROUP BY 1),
ps_exact AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS exact_chars
  FROM ps_keyed GROUP BY 1)
SELECT e.source, e.n_docs,
       coalesce(s.n_sampled, 0) AS n_sampled,
       e.exact_chars,
       coalesce(s.est_chars, 0) AS est_chars,
       (1000 * abs(coalesce(s.est_chars, 0) - e.exact_chars))
         // e.exact_chars AS err_pm
FROM ps_exact e LEFT JOIN ps_samp s ON s.source = e.source"""


# ---------------------------------------------------------------------------
# R193: packing efficiency audit — the quality bound FOR seq_packing:
# per shard, the next-fit bin count against the LP lower bound
# ceil(total_tokens / CAP) (no packing can use fewer bins), plus the
# realized waste per-mille. Next-fit is provably ≤ 2× the bound; this
# audit shows where the shard actually lands, and a packing regression
# (a bug that splits bins too eagerly) trips the pinned ceiling.
# Scale: reads seq_packing's output (bounded: bins per shard) and a
# per-shard token aggregate — two dimension-frame joins.
# ---------------------------------------------------------------------------


def packing_audit(docs: DataFrame) -> DataFrame:
    """(grp, n_bins, lb_bins, ratio_pm, waste_pm): next-fit quality vs
    the LP lower bound per shard."""
    bins = seq_packing(docs).groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_bins"),
        F.expr("CAST(sum(fill_tokens) AS BIGINT)").alias("tok"),
    )
    return bins.selectExpr(
        "grp", "n_bins",
        f"(tok + {PACK_CAP} - 1) DIV {PACK_CAP} AS lb_bins",
        f"(1000 * n_bins) DIV ((tok + {PACK_CAP} - 1) DIV {PACK_CAP})"
        " AS ratio_pm",
        f"(1000 * (n_bins * {PACK_CAP} - tok)) DIV (n_bins * {PACK_CAP})"
        " AS waste_pm",
    )


def packing_audit_oracle() -> str:
    return f"""
WITH pa_bins AS ({seq_packing_oracle()})
SELECT grp, CAST(count(*) AS BIGINT) AS n_bins,
       CAST((sum(fill_tokens) + {PACK_CAP} - 1) // {PACK_CAP} AS BIGINT)
         AS lb_bins,
       CAST((1000 * count(*))
         // ((sum(fill_tokens) + {PACK_CAP} - 1) // {PACK_CAP})
         AS BIGINT) AS ratio_pm,
       CAST((1000 * (count(*) * {PACK_CAP} - sum(fill_tokens)))
         // (count(*) * {PACK_CAP}) AS BIGINT) AS waste_pm
FROM pa_bins GROUP BY grp"""
