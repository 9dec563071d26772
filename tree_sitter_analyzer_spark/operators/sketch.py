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


# ---------------------------------------------------------------------------
# R65: HyperLogLog cardinality sketch (integer-exact, fully oracled)
# ---------------------------------------------------------------------------
#
# Completes the sketch trio: count-min = frequency, Bloom (operators/
# bloom.py) = membership, HLL (Flajolet et al. 2007) = cardinality. Same
# determinism-equals-oracleability discipline: md5-seeded hashes, and the
# estimator itself is spelled in BIGINT rational arithmetic — rho is a
# trailing-zero count, registers hold max-rho, and the harmonic sum is
# Σ 2^(48-M_j) (exact dyadic integers), so est_milli =
# α_milli·m²·2^48 DIV S is bit-identical cross-engine. No float enters
# any compared column.
#
# Scale shape: one map-side-combinable groupBy of the key stream onto
# (group, j ≤ m) register keys — the shuffle carries m registers per
# group, never the keys; registers merge by MAX, the HLL monoid, which is
# exactly Spark's partial/final agg. The raw estimator (no small-range
# linear-counting correction, which needs ln) is the right regime here:
# n/m ≫ 3 for every group at every sf, and the tests pin the error band.

HLL_M = 64                    # registers (2^6)
HLL_SHIFT = 33                # dyadic scale: 2^(SHIFT-rho) stays integral,
                              # and alpha*m^2*2^SHIFT fits int64 for m<=1024
HLL_RHO_MAX = 26              # md5int has 32 bits; 6 spent on the bucket
_ALPHA_MILLI = {16: 673, 32: 697, 64: 709, 128: 715, 256: 718, 512: 720,
                1024: 721}


def _rho_case(w: str, rho_max: int = HLL_RHO_MAX) -> str:
    """rho = 1 + trailing zeros of ``w`` (geometric, p=1/2), clamped to
    rho_max; w = 0 → rho_max. Flat CASE over floor/mod — portable."""
    arms = " ".join(
        f"WHEN CAST(floor(({w}) / {1 << (k - 1)}) AS BIGINT) % 2 = 1 THEN {k}"
        for k in range(1, rho_max)
    )
    return f"(CASE {arms} ELSE {rho_max} END)"


def hll_cardinality(tiles: DataFrame, m: int = HLL_M) -> DataFrame:
    """Per-tile-kind distinct res-9 cell cardinality, estimated by a
    deterministic m-register HLL next to the exact count. Output:
    (tile_kind, n_exact, n_registers, hll_est_milli, err_milli) — all
    bigint; err_milli = 1000·|est − exact| / exact pins the accuracy."""
    from .. import grid

    alpha = _ALPHA_MILLI[m]
    h = md5int_spark("CAST(cell AS STRING)")
    keyed = tiles.select(
        "tile_kind",
        F.expr(grid.cell_sql("lon", "lat", 9)).alias("cell"),
    ).select(
        "tile_kind",
        "cell",
        F.expr(f"({h}) % {m}").alias("j"),
        F.expr(_rho_case(f"({h}) DIV {m}")).alias("rho"),
    )
    regs = keyed.groupBy("tile_kind", "j").agg(F.max("rho").alias("mj"))
    exact = keyed.groupBy("tile_kind").agg(
        F.countDistinct("cell").alias("n_exact")
    )
    est = (
        regs.groupBy("tile_kind")
        .agg(
            F.count("*").cast("bigint").alias("n_registers"),
            F.sum(F.expr(f"CAST({1 << HLL_SHIFT} / power(2, mj) AS BIGINT)"))
            .alias("s_active"),
        )
        .select(
            "tile_kind",
            "n_registers",
            F.expr(
                f"s_active + ({m} - n_registers) * {1 << HLL_SHIFT}"
            ).alias("s_total"),
        )
    )
    return (
        exact.join(est, "tile_kind")
        .select(
            "tile_kind",
            "n_exact",
            "n_registers",
            F.expr(
                f"{alpha} * {m} * {m} * {1 << HLL_SHIFT} DIV s_total"
            ).alias("hll_est_milli"),
        )
        .withColumn(
            "err_milli",
            F.expr("abs(hll_est_milli - 1000 * n_exact) DIV n_exact"),
        )
    )


def hll_oracle_sql(m: int = HLL_M) -> str:
    """DuckDB rebuilds registers, harmonic sum, and estimate identically
    (requires the spliced tiles CTE)."""
    from .. import grid

    alpha = _ALPHA_MILLI[m]
    h = md5int_duck("CAST(cell AS VARCHAR)")
    rho = _rho_case(f"({h}) // {m}")
    return f"""
hk AS (
  SELECT tile_kind, cell, ({h}) % {m} AS j, {rho} AS rho
  FROM (SELECT tile_kind, {grid.cell_sql('lon', 'lat', 9)} AS cell
        FROM tiles)
),
hreg AS (SELECT tile_kind, j, max(rho) AS mj FROM hk GROUP BY 1, 2),
hex AS (SELECT tile_kind, count(DISTINCT cell) AS n_exact FROM hk GROUP BY 1),
hest AS (
  SELECT tile_kind, CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(CAST({1 << HLL_SHIFT} / power(2, mj) AS BIGINT))
              + ({m} - count(*)) * {1 << HLL_SHIFT} AS BIGINT) AS s_total
  FROM hreg GROUP BY 1
)
SELECT e.tile_kind, e.n_exact, s.n_registers,
       ({alpha} * {m} * {m} * {1 << HLL_SHIFT}) // s.s_total AS hll_est_milli,
       abs(({alpha} * {m} * {m} * {1 << HLL_SHIFT}) // s.s_total
           - 1000 * e.n_exact) // e.n_exact AS err_milli
FROM hex e JOIN hest s ON s.tile_kind = e.tile_kind"""


# ---------------------------------------------------------------------------
# R68: equi-width histogram quantile sketch (approximate percentile)
# ---------------------------------------------------------------------------
#
# The fourth sketch: approximate quantiles with a BOUNDED, integer-exact
# error contract. A fixed NBINS equi-width histogram over integer cents
# estimates any quantile as the upper edge of the bin where the running
# count crosses ceil(q·n) — |est − exact| ≤ binwidth by construction
# (the tests pin it). The same regime note as approx_percentile /
# t-digest at 100 TB: the histogram is a mergeable monoid (cell-wise
# sum), the shuffle carries ≤ NBINS rows per group, never values.
# Exact quantiles ride along (rank = ceil(q·n) with a unique o_orderkey
# tie-break — the engine-portable exact-quantile spelling) so the sketch
# error is a recorded number, not a claim.

QS_NBINS = 64


def histogram_quantiles(orders: DataFrame, nbins: int = QS_NBINS) -> DataFrame:
    """Per-o_orderpriority P50/P90 of o_totalprice cents: exact (unique
    tie-break rank) next to the histogram estimate. Output: (priority,
    n_orders, exact_p50, est_p50, exact_p90, est_p90, binwidth)."""
    from pyspark.sql.window import Window

    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(floor(o_totalprice * 100e0) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    mx = base.agg(F.max("cents").alias("maxc"))
    binned = base.crossJoin(F.broadcast(mx)).select(
        "priority", "cents", "o_orderkey", "maxc",
        F.expr(f"cents * {nbins} DIV (maxc + 1)").alias("bin"),
    )
    hist = binned.groupBy("priority", "maxc", "bin").agg(
        F.count("*").alias("c")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cumc", F.sum("c").over(wcum))
    n = base.groupBy("priority").agg(F.count("*").alias("n_orders"))
    est = cum.join(n, "priority")
    ests = {}
    for tag, num, den in (("p50", 1, 2), ("p90", 9, 10)):
        pos = f"(({num} * n_orders + {den} - 1) DIV {den})"
        ests[tag] = (
            est.where(F.expr(f"cumc >= {pos}"))
            .groupBy("priority")
            .agg(
                F.expr(
                    f"(min(bin) + 1) * ((max(maxc) + 1) DIV {nbins})"
                ).alias(f"est_{tag}")
            )
        )
    wrank = Window.partitionBy("priority").orderBy("cents", "o_orderkey")
    ranked = base.withColumn("rn", F.row_number().over(wrank)).join(
        n, "priority"
    )
    exact = ranked.groupBy("priority").agg(
        F.expr(
            "min(CASE WHEN rn = (1 * n_orders + 1) DIV 2 THEN cents END)"
        ).alias("exact_p50"),
        F.expr(
            "min(CASE WHEN rn = (9 * n_orders + 9) DIV 10 THEN cents END)"
        ).alias("exact_p90"),
    )
    return (
        n.join(exact, "priority")
        .join(ests["p50"], "priority")
        .join(ests["p90"], "priority")
        .crossJoin(F.broadcast(mx))
        .selectExpr(
            "priority",
            "n_orders",
            "exact_p50",
            "est_p50",
            "exact_p90",
            "est_p90",
            f"(maxc + 1) DIV {nbins} AS binwidth",
        )
    )


def histogram_quantiles_oracle_sql(nbins: int = QS_NBINS) -> str:
    return f"""
WITH qb AS (
  SELECT o_orderpriority AS priority,
         CAST(floor(o_totalprice * 100e0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
qm AS (SELECT max(cents) AS maxc FROM qb),
qn AS (SELECT priority, count(*) AS n_orders FROM qb GROUP BY 1),
qh AS (
  SELECT priority, cents * {nbins} // (maxc + 1) AS bin, count(*) AS c
  FROM qb, qm GROUP BY 1, 2
),
qc AS (
  SELECT priority, bin,
         sum(c) OVER (PARTITION BY priority ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumc
  FROM qh
),
qe50 AS (
  SELECT c.priority, (min(c.bin) + 1) * ((max(m.maxc) + 1) // {nbins})
           AS est_p50
  FROM qc c JOIN qn n ON n.priority = c.priority, qm m
  WHERE c.cumc >= (1 * n.n_orders + 1) // 2
  GROUP BY 1
),
qe90 AS (
  SELECT c.priority, (min(c.bin) + 1) * ((max(m.maxc) + 1) // {nbins})
           AS est_p90
  FROM qc c JOIN qn n ON n.priority = c.priority, qm m
  WHERE c.cumc >= (9 * n.n_orders + 9) // 10
  GROUP BY 1
),
qr AS (
  SELECT priority, cents,
         row_number() OVER (PARTITION BY priority
                            ORDER BY cents, o_orderkey) AS rn
  FROM qb
),
qx AS (
  SELECT r.priority,
         min(CASE WHEN r.rn = (1 * n.n_orders + 1) // 2
                  THEN r.cents END) AS exact_p50,
         min(CASE WHEN r.rn = (9 * n.n_orders + 9) // 10
                  THEN r.cents END) AS exact_p90
  FROM qr r JOIN qn n ON n.priority = r.priority
  GROUP BY 1
)
SELECT n.priority, n.n_orders, x.exact_p50, e5.est_p50,
       x.exact_p90, e9.est_p90, (m.maxc + 1) // {nbins} AS binwidth
FROM qn n
JOIN qx x ON x.priority = n.priority
JOIN qe50 e5 ON e5.priority = n.priority
JOIN qe90 e9 ON e9.priority = n.priority, qm m"""


# ---------------------------------------------------------------------------
# R97: join-size estimation via the CMS inner product (optimizer stats)
# ---------------------------------------------------------------------------

def join_size_estimate(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """One audit row: the customer⋈supplier-on-nationkey join cardinality
    ESTIMATED from two count-min sketches — est_j = Σ_b cmsA[j,b]·cmsB[j,b]
    per hash row, final estimate = min_j (the classic AMS/CMS join-size
    estimator: every row overestimates by non-negative collision cross
    terms, so the min is still an upper bound) — beside the exact size
    Σ_k cA(k)·cB(k) computed from the per-key count frames WITHOUT
    materializing the join. The primitive a cost-based optimizer uses to
    size a join before running it; at 10^12 rows each side collapses to
    its d×w sketch in one partial/final aggregation and the estimate is
    arithmetic over 2·d·w cells.

    Returns (true_join_rows, cms_est, overcount, est_ratio_milli); the
    estimator's one-sided contract (cms_est ≥ true) is part of the
    compared result.
    """
    def sk(df: DataFrame, key: str) -> DataFrame:
        js = ", ".join(str(j) for j in range(DEPTH))
        return (
            df.select(F.expr(f"CAST({key} AS STRING)").alias("tok"))
            .select("tok", F.explode(F.expr(f"array({js})")).alias("j"))
            .select("j", F.expr(_bucket_spark("tok", "j")).alias("bucket"))
            .groupBy("j", "bucket")
            .agg(F.count("*").alias("cnt"))
        )

    a, b = sk(customer, "c_nationkey"), sk(supplier, "s_nationkey")
    est = (
        a.withColumnRenamed("cnt", "ca")
        .join(
            b.withColumnRenamed("cnt", "cb"), ["j", "bucket"]
        )
        .groupBy("j")
        .agg(F.sum(F.expr("ca * cb")).alias("ip"))
        .agg(F.min("ip").alias("cms_est"))
    )
    ka = customer.groupBy(
        F.expr("CAST(c_nationkey AS BIGINT)").alias("k")
    ).agg(F.count("*").alias("ca"))
    kb = supplier.groupBy(
        F.expr("CAST(s_nationkey AS BIGINT)").alias("k")
    ).agg(F.count("*").alias("cb"))
    true = ka.join(kb, "k").agg(
        F.sum(F.expr("ca * cb")).alias("true_join_rows")
    )
    return (
        true.crossJoin(F.broadcast(est))
        .select(
            "true_join_rows",
            "cms_est",
            (F.col("cms_est") - F.col("true_join_rows")).alias("overcount"),
            F.expr("(1000 * cms_est) DIV true_join_rows").alias(
                "est_ratio_milli"
            ),
        )
    )


def join_size_oracle_sql() -> str:
    def sk(table: str, key: str, name: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT {j} AS j, {_bucket_duck(f'CAST({key} AS VARCHAR)', str(j))}"
            f" AS bucket FROM {table}"
            for j in range(DEPTH)
        )
        return f"{name} AS (SELECT j, bucket, count(*) AS cnt FROM ({rows}) GROUP BY 1, 2)"

    return f"""
WITH {sk('customer', 'c_nationkey', 'js_a')},
{sk('supplier', 's_nationkey', 'js_b')},
js_ip AS (
  SELECT a.j, SUM(a.cnt * b.cnt) AS ip
  FROM js_a a JOIN js_b b ON b.j = a.j AND b.bucket = a.bucket
  GROUP BY 1),
js_est AS (SELECT MIN(ip) AS cms_est FROM js_ip),
js_true AS (
  SELECT SUM(a.ca * b.cb) AS true_join_rows FROM
    (SELECT CAST(c_nationkey AS BIGINT) AS k, count(*) AS ca
     FROM customer GROUP BY 1) a
  JOIN
    (SELECT CAST(s_nationkey AS BIGINT) AS k, count(*) AS cb
     FROM supplier GROUP BY 1) b
  ON b.k = a.k)
SELECT t.true_join_rows, e.cms_est,
       e.cms_est - t.true_join_rows AS overcount,
       (1000 * e.cms_est) // t.true_join_rows AS est_ratio_milli
FROM js_true t CROSS JOIN js_est e"""


# ---------------------------------------------------------------------------
# R98: HLL mergeability audit (sketch-union == union-sketch, bit-for-bit)
# ---------------------------------------------------------------------------

def hll_union_audit(tiles: DataFrame, m: int = HLL_M) -> DataFrame:
    """One audit row proving the HLL monoid claim the scale story rests
    on: sketch the jpeg tiles' cells and the png tiles' cells SEPARATELY,
    merge by register-wise MAX, and the union estimate must equal —
    bit-for-bit, not approximately — the estimate from sketching the
    union directly (MAX is associative/commutative/idempotent; this is
    why per-partition partial sketches + Spark's partial/final agg give
    exactly the global sketch at any parallelism). Output:
    (n_exact_union, union_est_milli, err_milli, merge_exact) with
    merge_exact = 1 iff merged == direct."""
    from .. import grid

    alpha = _ALPHA_MILLI[m]
    h = md5int_spark("CAST(cell AS STRING)")
    keyed = tiles.select(
        F.col("fmt").alias("part"),
        F.expr(grid.cell_sql("lon", "lat", 9)).alias("cell"),
    ).select(
        "part",
        "cell",
        F.expr(f"({h}) % {m}").alias("j"),
        F.expr(_rho_case(f"({h}) DIV {m}")).alias("rho"),
    )
    regs_part = keyed.groupBy("part", "j").agg(F.max("rho").alias("mj"))
    merged = regs_part.groupBy("j").agg(F.max("mj").alias("mj"))
    direct = keyed.groupBy("j").agg(F.max("rho").alias("mj"))

    def est(regs: DataFrame, name: str) -> DataFrame:
        return (
            regs.agg(
                F.count("*").cast("bigint").alias("nr"),
                F.sum(
                    F.expr(f"CAST({1 << HLL_SHIFT} / power(2, mj) AS BIGINT)")
                ).alias("sa"),
            )
            .select(
                F.expr(
                    f"{alpha} * {m} * {m} * {1 << HLL_SHIFT}"
                    f" DIV (sa + ({m} - nr) * {1 << HLL_SHIFT})"
                ).alias(name)
            )
        )

    exact = keyed.agg(F.countDistinct("cell").alias("n_exact_union"))
    return (
        exact.crossJoin(F.broadcast(est(merged, "union_est_milli")))
        .crossJoin(F.broadcast(est(direct, "direct_est_milli")))
        .select(
            "n_exact_union",
            "union_est_milli",
            F.expr(
                "abs(union_est_milli - 1000 * n_exact_union)"
                " DIV n_exact_union"
            ).alias("err_milli"),
            F.expr(
                "CAST(union_est_milli = direct_est_milli AS BIGINT)"
            ).alias("merge_exact"),
        )
    )


def hll_union_oracle_sql(m: int = HLL_M) -> str:
    from .. import grid

    alpha = _ALPHA_MILLI[m]
    h = md5int_duck("CAST(cell AS VARCHAR)")
    rho = _rho_case(f"({h}) // {m}")
    estexpr = (
        f"{alpha} * {m} * {m} * {1 << HLL_SHIFT}"
        f" // (sa + ({m} - nr) * {1 << HLL_SHIFT})"
    )
    return f"""
hu_keyed AS (
  SELECT fmt AS part, cell, ({h}) % {m} AS j, {rho} AS rho
  FROM (SELECT fmt, {grid.cell_sql('lon', 'lat', 9)} AS cell FROM tiles)),
hu_part AS (SELECT part, j, MAX(rho) AS mj FROM hu_keyed GROUP BY 1, 2),
hu_merged AS (SELECT j, MAX(mj) AS mj FROM hu_part GROUP BY 1),
hu_direct AS (SELECT j, MAX(rho) AS mj FROM hu_keyed GROUP BY 1),
hu_me AS (
  SELECT {estexpr} AS union_est_milli FROM (
    SELECT count(*) AS nr,
           SUM(CAST({1 << HLL_SHIFT} / power(2, mj) AS BIGINT)) AS sa
    FROM hu_merged)),
hu_de AS (
  SELECT {estexpr} AS direct_est_milli FROM (
    SELECT count(*) AS nr,
           SUM(CAST({1 << HLL_SHIFT} / power(2, mj) AS BIGINT)) AS sa
    FROM hu_direct)),
hu_ex AS (SELECT count(DISTINCT cell) AS n_exact_union FROM hu_keyed)
SELECT x.n_exact_union, m.union_est_milli,
       abs(m.union_est_milli - 1000 * x.n_exact_union)
         // x.n_exact_union AS err_milli,
       CAST(m.union_est_milli = d.direct_est_milli AS BIGINT) AS merge_exact
FROM hu_ex x CROSS JOIN hu_me m CROSS JOIN hu_de d"""


# ---------------------------------------------------------------------------
# R158: KMV (bottom-k / "k minimum values") distinct-count sketch
# (Bar-Yossef et al. 2002) — the fifth sketch, and the one whose merge IS
# Spark's two-phase aggregation in the most literal way: bottom-k of a
# union = bottom-k of the bottom-k's. The Spark side computes the sketch
# with an explicit partial phase (per-partition bottom-k via
# spark_partition_id grouping, then a k-bounded merge), so the shuffle
# carries ≤ k hashes per (kind, partition) — never the key set. The
# estimator is pure integers: h uniform in [1, 2^30], est =
# (k−1)·2^30 DIV h_(k). Because min-k is associative/commutative, the
# result is PARTITION-INDEPENDENT, which is exactly what lets DuckDB
# oracle it with a flat global bottom-k (and what the repartition
# invariance test pins).
# Raw regime: fewer than k distinct hashes ⇒ the sketch holds the whole
# hash set and the estimate is its size (exact up to hash collisions).
# ---------------------------------------------------------------------------

KMV_K = 64
KMV_R = 1 << 30


def kmv_cardinality(tiles: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-tile-kind distinct res-9 cell cardinality via a bottom-k
    sketch beside the exact count: (tile_kind, n_exact, n_held,
    kmv_est, err_milli) — all bigint."""
    from .. import grid

    h = md5int_spark("CAST(cell AS STRING)")
    keyed = tiles.select(
        "tile_kind",
        F.expr(grid.cell_sql("lon", "lat", 9)).alias("cell"),
    ).select(
        "tile_kind", "cell",
        F.expr(f"(({h}) % {KMV_R}) + 1").alias("h"),
    )
    part = (
        keyed.withColumn("pid", F.spark_partition_id())
        .groupBy("tile_kind", "pid")
        .agg(F.expr(f"slice(array_sort(collect_set(h)), 1, {k})").alias("hs"))
    )
    merged = part.groupBy("tile_kind").agg(
        F.expr(
            f"slice(array_sort(array_distinct(flatten(collect_list(hs)))),"
            f" 1, {k}) AS bk"
        )
    )
    exact = keyed.groupBy("tile_kind").agg(
        F.countDistinct("cell").alias("n_exact")
    )
    return (
        exact.join(merged, "tile_kind")
        .selectExpr(
            "tile_kind", "n_exact",
            "CAST(size(bk) AS BIGINT) AS n_held",
            f"CASE WHEN size(bk) < {k} THEN CAST(size(bk) AS BIGINT)"
            f" ELSE ({k} - 1) * CAST({KMV_R} AS BIGINT)"
            f" DIV element_at(bk, {k}) END AS kmv_est",
        )
        .withColumn(
            "err_milli",
            F.expr("abs(1000 * kmv_est - 1000 * n_exact) DIV n_exact"),
        )
    )


def kmv_oracle_sql(k: int = KMV_K) -> str:
    """Flat global bottom-k (legitimate because min-k is order- and
    partition-independent). Requires the spliced tiles CTE."""
    from .. import grid

    h = md5int_duck("CAST(cell AS VARCHAR)")
    return f"""
kmv_h AS (
  SELECT DISTINCT tile_kind, ((({h}) % {KMV_R}) + 1) AS h
  FROM (SELECT tile_kind, {grid.cell_sql('lon', 'lat', 9)} AS cell
        FROM tiles)
),
kmv_r AS (
  SELECT tile_kind, h,
         row_number() OVER (PARTITION BY tile_kind ORDER BY h) AS rn
  FROM kmv_h
),
kmv_s AS (
  SELECT tile_kind,
         CAST(least(count(*), {k}) AS BIGINT) AS n_held,
         max(CASE WHEN rn = {k} THEN h END) AS kth
  FROM kmv_r WHERE rn <= {k} GROUP BY 1
),
kmv_e AS (
  SELECT tile_kind, count(DISTINCT cell) AS n_exact
  FROM (SELECT tile_kind, {grid.cell_sql('lon', 'lat', 9)} AS cell
        FROM tiles)
  GROUP BY 1
)
SELECT e.tile_kind, e.n_exact, s.n_held,
       CASE WHEN s.n_held < {k} THEN s.n_held
            ELSE ({k} - 1) * CAST({KMV_R} AS BIGINT) // s.kth
       END AS kmv_est,
       abs(1000 * (CASE WHEN s.n_held < {k} THEN s.n_held
                        ELSE ({k} - 1) * CAST({KMV_R} AS BIGINT) // s.kth
                   END) - 1000 * e.n_exact) // e.n_exact AS err_milli
FROM kmv_e e JOIN kmv_s s ON s.tile_kind = e.tile_kind"""


# ---------------------------------------------------------------------------
# R172: CMS mergeability audit — the count-min monoid witness beside the
# HLL one: counters merge by CELL-WISE SUM, so sketching the lang
# partitions separately and summing per (j, bucket) must equal the
# direct whole-corpus sketch bit-for-bit (sum is associative/commutative
# — this is exactly why per-partition partial sketches + Spark's
# partial/final agg give the global CMS at any parallelism). The audit
# probes both sketches with the exact top-5 tokens and emits the two
# estimates + the equality flag per token.
# ---------------------------------------------------------------------------

CMS_AUDIT_TOPK = 5


def cms_union_audit(docs: DataFrame, top_k: int = CMS_AUDIT_TOPK) -> DataFrame:
    """(rank, tok, exact_cnt, merged_est, direct_est, merge_exact)."""
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    js = ", ".join(str(j) for j in range(DEPTH))
    fan = toks.select(
        "lang", "tok", F.explode(F.expr(f"array({js})")).alias("j")
    ).select(
        "lang", "j", F.expr(_bucket_spark("tok", "j")).alias("bucket")
    )
    parts = fan.groupBy("lang", "j", "bucket").agg(
        F.count("*").alias("cnt")
    )
    merged = parts.groupBy("j", "bucket").agg(F.sum("cnt").alias("mcnt"))
    direct = fan.groupBy("j", "bucket").agg(F.count("*").alias("dcnt"))
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_cnt"))
        .select(
            "tok", "exact_cnt",
            F.expr("row_number() OVER (ORDER BY exact_cnt DESC, tok)")
            .alias("rank"),
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
        probes.join(F.broadcast(merged), ["j", "bucket"])
        .join(F.broadcast(direct), ["j", "bucket"])
        .groupBy("rank", "tok", "exact_cnt")
        .agg(
            F.min("mcnt").cast("bigint").alias("merged_est"),
            F.min("dcnt").cast("bigint").alias("direct_est"),
        )
        .selectExpr(
            "CAST(rank AS BIGINT) AS rank", "tok", "exact_cnt",
            "merged_est", "direct_est",
            "CAST(merged_est = direct_est AS BIGINT) AS merge_exact",
        )
    )


def cms_union_oracle(top_k: int = CMS_AUDIT_TOPK) -> str:
    js = ", ".join(str(j) for j in range(DEPTH))
    return f"""
WITH cu_t AS (
  SELECT lang, tok FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
cu_f AS (
  SELECT lang, j, {_bucket_duck('tok', 'j')} AS bucket
  FROM cu_t CROSS JOIN (SELECT unnest([{js}]) AS j)),
cu_p AS (SELECT lang, j, bucket, count(*) AS cnt
         FROM cu_f GROUP BY 1, 2, 3),
cu_m AS (SELECT j, bucket, sum(cnt) AS mcnt FROM cu_p GROUP BY 1, 2),
cu_d AS (SELECT j, bucket, count(*) AS dcnt FROM cu_f GROUP BY 1, 2),
cu_top AS (
  SELECT tok, count(*) AS exact_cnt,
         row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
  FROM cu_t GROUP BY tok QUALIFY rank <= {top_k}),
cu_pr AS (
  SELECT rank, tok, exact_cnt, j, {_bucket_duck('tok', 'j')} AS bucket
  FROM cu_top CROSS JOIN (SELECT unnest([{js}]) AS j))
SELECT CAST(p.rank AS BIGINT) AS rank, p.tok, p.exact_cnt,
       CAST(min(m.mcnt) AS BIGINT) AS merged_est,
       CAST(min(d.dcnt) AS BIGINT) AS direct_est,
       CAST(min(m.mcnt) = min(d.dcnt) AS BIGINT) AS merge_exact
FROM cu_pr p
JOIN cu_m m ON m.j = p.j AND m.bucket = p.bucket
JOIN cu_d d ON d.j = p.j AND d.bucket = p.bucket
GROUP BY 1, 2, 3"""


# ---------------------------------------------------------------------------
# R183: KMV set operations (Beyer et al. 2007) — the sketch answer to
# "how much do two sets OVERLAP" without ever joining them: for every
# tile-kind pair, |A∩B| and Jaccard estimated from the two bottom-k
# hash sketches alone. Correctness hinges on a provable containment:
# bottom-k(A∪B) ⊆ bottom-k(A) ∪ bottom-k(B), and any union-sample hash
# h ≤ tau_union that belongs to A necessarily sits inside A's own
# bottom-k (tau_A ≥ tau_union since A ⊆ A∪B) — so the membership test
# against the k-arrays is EXACT, never approximate. jac_est = K∩/k',
# inter_est = K∩·union_est DIV k', all integers.
# Scale shape: sketches build with the KMV two-phase partial agg; the
# pair fan runs on the ~7-row kind dimension (arrays of 64 bigints),
# never on tiles. The exact columns beside the estimates come from one
# cell-keyed self-join aggregated in-stream (per-cell kind count ≤ 7).
# ---------------------------------------------------------------------------


def kmv_set_ops(tiles: DataFrame, k: int = KMV_K) -> DataFrame:
    """(kind_a, kind_b, inter_exact, inter_est, jac_pm_exact,
    jac_pm_est): per tile-kind pair, exact vs KMV-estimated overlap of
    their distinct res-9 cell sets."""
    from .. import grid

    h = md5int_spark("CAST(cell AS STRING)")
    keyed = (
        tiles.select(
            "tile_kind",
            F.expr(grid.cell_sql("lon", "lat", 9)).alias("cell"),
        )
        .dropDuplicates(["tile_kind", "cell"])
        .select(
            "tile_kind", "cell",
            F.expr(f"(({h}) % {KMV_R}) + 1").alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    part = (
        keyed.withColumn("pid", F.spark_partition_id())
        .groupBy("tile_kind", "pid")
        .agg(F.expr(f"slice(array_sort(collect_set(h)), 1, {k})").alias("hs"))
    )
    sk = part.groupBy("tile_kind").agg(
        F.expr(
            f"slice(array_sort(array_distinct(flatten(collect_list(hs)))),"
            f" 1, {k}) AS bk"
        )
    )
    sizes = keyed.groupBy("tile_kind").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    dim = sk.join(sizes, "tile_kind")
    a = dim.selectExpr(
        "tile_kind AS kind_a", "bk AS bk_a", "n_exact AS n_a"
    )
    b = dim.selectExpr(
        "tile_kind AS kind_b", "bk AS bk_b", "n_exact AS n_b"
    )
    inter = (
        keyed.alias("x")
        .join(keyed.alias("y"), "cell")
        .where(F.expr("x.tile_kind < y.tile_kind"))
        .groupBy(
            F.expr("x.tile_kind").alias("kind_a"),
            F.expr("y.tile_kind").alias("kind_b"),
        )
        .agg(F.count("*").cast("bigint").alias("inter_exact"))
    )
    return (
        a.crossJoin(b)
        .where(F.col("kind_a") < F.col("kind_b"))
        .join(inter, ["kind_a", "kind_b"], "left")
        .withColumn(
            "inter_exact",
            F.expr("coalesce(inter_exact, CAST(0 AS BIGINT))"),
        )
        .withColumn(
            "u",
            F.expr(
                f"slice(array_sort(array_distinct(concat(bk_a, bk_b))),"
                f" 1, {k})"
            ),
        )
        .withColumn("kp", F.expr("CAST(size(u) AS BIGINT)"))
        .withColumn(
            "k_inter",
            F.expr(
                "CAST(size(filter(u, x -> array_contains(bk_a, x)"
                " AND array_contains(bk_b, x))) AS BIGINT)"
            ),
        )
        .withColumn(
            "union_est",
            F.expr(
                f"CASE WHEN kp < {k} THEN kp ELSE"
                f" ({k} - 1) * CAST({KMV_R} AS BIGINT)"
                f" DIV element_at(u, {k}) END"
            ),
        )
        .selectExpr(
            "kind_a", "kind_b", "inter_exact",
            "(k_inter * union_est) DIV kp AS inter_est",
            "(1000 * inter_exact) DIV (n_a + n_b - inter_exact)"
            " AS jac_pm_exact",
            "(1000 * k_inter) DIV kp AS jac_pm_est",
        )
    )


def kmv_set_ops_oracle(k: int = KMV_K) -> str:
    """Flat global bottom-k per kind (partition-independent). Requires
    the spliced tiles CTE."""
    from .. import grid

    h = md5int_duck("CAST(cell AS VARCHAR)")
    return f"""ks_keyed AS (
  SELECT DISTINCT tile_kind, cell, ((({h}) % {KMV_R}) + 1) AS h
  FROM (SELECT tile_kind, {grid.cell_sql('lon', 'lat', 9)} AS cell
        FROM tiles)),
ks_rank AS (
  SELECT tile_kind, h,
         row_number() OVER (PARTITION BY tile_kind ORDER BY h) AS rn
  FROM ks_keyed),
ks_sk AS (
  SELECT tile_kind, list_sort(list(h)) AS bk
  FROM ks_rank WHERE rn <= {k} GROUP BY 1),
ks_sz AS (
  SELECT tile_kind, CAST(count(*) AS BIGINT) AS n_exact
  FROM ks_keyed GROUP BY 1),
ks_dim AS (
  SELECT s.tile_kind, s.bk, z.n_exact
  FROM ks_sk s JOIN ks_sz z ON z.tile_kind = s.tile_kind),
ks_inter AS (
  SELECT x.tile_kind AS kind_a, y.tile_kind AS kind_b,
         CAST(count(*) AS BIGINT) AS inter_exact
  FROM ks_keyed x JOIN ks_keyed y
    ON y.cell = x.cell AND x.tile_kind < y.tile_kind
  GROUP BY 1, 2),
ks_pairs AS (
  SELECT a.tile_kind AS kind_a, b.tile_kind AS kind_b,
         coalesce(i.inter_exact, 0) AS inter_exact,
         a.n_exact AS n_a, b.n_exact AS n_b,
         list_sort(list_distinct(list_concat(a.bk, b.bk)))[1:{k}] AS u
  FROM ks_dim a JOIN ks_dim b ON a.tile_kind < b.tile_kind
  LEFT JOIN ks_inter i
    ON i.kind_a = a.tile_kind AND i.kind_b = b.tile_kind),
ks_est AS (
  SELECT kind_a, kind_b, inter_exact, n_a, n_b,
         CAST(len(u) AS BIGINT) AS kp,
         CAST(len(list_filter(u, x -> list_contains(bk_a, x)
           AND list_contains(bk_b, x))) AS BIGINT) AS k_inter,
         CASE WHEN len(u) < {k} THEN CAST(len(u) AS BIGINT)
              ELSE ({k} - 1) * CAST({KMV_R} AS BIGINT) // u[{k}]
         END AS union_est
  FROM (SELECT p.*, a2.bk AS bk_a, b2.bk AS bk_b
        FROM ks_pairs p
        JOIN ks_dim a2 ON a2.tile_kind = p.kind_a
        JOIN ks_dim b2 ON b2.tile_kind = p.kind_b))
SELECT kind_a, kind_b, inter_exact,
       (k_inter * union_est) // kp AS inter_est,
       (1000 * inter_exact) // (n_a + n_b - inter_exact) AS jac_pm_exact,
       (1000 * k_inter) // kp AS jac_pm_est
FROM ks_est"""
