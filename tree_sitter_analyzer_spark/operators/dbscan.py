"""Grid-accelerated exact DBSCAN over the tile point set.

The reference consolidates similarity hits into clone GROUPS
(``code_similarity.py:311-434``); the spatial-analytics analog a
geospatial engine owes its users is density clustering — DBSCAN — whose
composition is pure join algebra and therefore Spark-native:

1. ``eps``-neighbor pairs: self radius-join via the grid index — each
   tile lands in its home cell (build side), probes the Chebyshev cell
   disk of ``rc = ceil(eps / cell_size)`` (probe side), one SHUFFLED
   equi-join on cell (no broadcast: both sides are the full corpus),
   exact ``dist2 <= eps²`` verify. The disk provably covers the
   ``eps``-ball, so the pair set equals the naive all-pairs filter —
   which is exactly what the DuckDB oracle runs.
2. core points: ``|N_eps(p)| >= min_pts`` (self counted, classic DBSCAN).
3. clusters: connected components over the **cell-quotient graph** —
   core points collapse to their cell at ``qres`` chosen so the cell
   DIAGONAL is < eps (every two cores in one cell are eps-neighbors by
   construction, so cell-level connectivity is *exactly* point-level
   connectivity, not an approximation); min-label propagation
   (``operators/graph.py``) then runs over ~#occupied-cells vertices
   instead of #core-points — the shape that survives 10^12 rows.
   Cluster id = min core tile key in the component.
4. border points attach to the MIN cluster id among their core
   neighbors — the one deterministic choice (textbook DBSCAN leaves
   border assignment order-dependent; an oracle-matched engine cannot).

Scale note (100 TB): pair generation is a cell-keyed shuffle join whose
output is *intrinsically* quadratic in per-cell density — pick ``res``
so cells are small relative to ``eps`` (rc stays 1-2) and let AQE skew
splitting handle hot cells; the quotient components loop touches only
occupied cells, orders of magnitude below the point count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import grid
from .knn import DIST2_SQL
from .graph import connected_components

# Defaults tuned to the synthetic geography (FIXTURES.md §1): hotspot
# density makes cores at every SF, background density stays noise.
DBSCAN_EPS = 0.005
DBSCAN_MIN_PTS = 8
DBSCAN_RES = 7  # candidate-join cell 0.0078° -> rc = 1 (3×3 disk)
NOISE = -1  # cluster id for noise rows (cross-engine-stable sentinel)


def quotient_res(eps: float) -> int:
    """Smallest resolution whose cell diagonal is <= eps: size*sqrt(2)
    <= eps  ⇔  2^r >= sqrt(2)/eps. At this res, any two points in one
    cell are within eps — the exactness condition of the quotient."""
    return max(0, math.ceil(math.log2(math.sqrt(2.0) / eps)))


def _quotient_key_sql(qres: int) -> str:
    """Compact quotient-cell key ``ix * 2^28 + iy`` (same portable SQL
    on both engines). No res prefix: the key participates in a bigint
    SUM inside the components fixpoint probe."""
    return (
        f"({grid.ix_sql('lon', qres)} * {grid.IX_MUL}"
        f" + {grid.iy_sql('lat', qres)})"
    )


def eps_neighbor_pairs(
    tiles: DataFrame, eps: float = DBSCAN_EPS, res: int = DBSCAN_RES
) -> DataFrame:
    """All ordered pairs (p, q) of tile keys with euclidean distance
    <= eps, INCLUDING the self pair (p, p). Exact: grid candidates +
    verified distance; returns (p, q) bigint columns."""
    s = grid.cell_size(res)
    rc = int(-(-eps // s))  # ceil
    t = tiles.select(
        F.col("i"),
        "lon",
        "lat",
        grid.ix_col("lon", res).alias("ix"),
        grid.iy_col("lat", res).alias("iy"),
    )
    build = t.select(
        F.col("i").alias("q"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        F.expr(grid.cell_from_ixiy_sql("ix", "iy", res)).alias("cell"),
    )
    probe = (
        t.withColumn("off", F.explode(grid.disk_offsets_expr(rc)))
        .select(
            F.col("i").alias("p"),
            "lon",
            "lat",
            F.expr(
                grid.cell_from_ixiy_sql("ix + off.dx", "iy + off.dy", res)
            ).alias("cell"),
        )
    )
    eps2 = f"{eps * eps:.10e}"  # identical literal text on both engines
    return (
        probe.join(build, "cell")
        .where(F.expr(f"{DIST2_SQL} <= {eps2}"))
        .select("p", "q")
    )


def _eps_join(
    probe: DataFrame, build: DataFrame, eps: float, res: int
) -> DataFrame:
    """Verified eps-candidate ROW STREAM between two point frames —
    probe must carry (lon, lat), build (qlon, qlat); all other columns
    pass through. Callers MUST aggregate immediately: the stream is
    intrinsically quadratic in per-cell density (the sf0.1 lesson — a
    materialized pair list is ~10^8 rows here and petabytes at 10^12
    tiles; the aggregates it feeds are small)."""
    size = grid.cell_size(res)
    rc = int(-(-eps // size))  # ceil
    pr = (
        probe.withColumn("pix", grid.ix_col("lon", res))
        .withColumn("piy", grid.iy_col("lat", res))
        .withColumn("off", F.explode(grid.disk_offsets_expr(rc)))
        .withColumn(
            "cell",
            F.expr(grid.cell_from_ixiy_sql("pix + off.dx", "piy + off.dy", res)),
        )
        .drop("pix", "piy", "off")
    )
    bd = build.withColumn(
        "cell", F.expr(grid.cell_sql("qlon", "qlat", res))
    )
    eps2 = f"{eps * eps:.10e}"  # identical literal text on both engines
    return pr.join(bd, "cell").where(F.expr(f"{DIST2_SQL} <= {eps2}"))


def dbscan_labels(
    spark: SparkSession,
    tiles: DataFrame,
    eps: float = DBSCAN_EPS,
    min_pts: int = DBSCAN_MIN_PTS,
    res: int = DBSCAN_RES,
    max_rounds: int = 40,
) -> DataFrame:
    """Per-tile DBSCAN labels: (image_id, role in {core,border,noise},
    cluster bigint — min core tile key in the cluster, -1 for noise).

    ``max_rounds`` bounds the quotient-graph propagation; the cell graph
    converges in ~10 steps (hotspot diameter over eps-length hops) and
    the loop exits on the scalar fixpoint probe, so the budget is slack,
    not cost. The oracle runs the UNCAPPED closure — parity therefore
    also *proves* convergence.

    Scale shape (reworked after the sf0.1 smoke OOM): the eps-pair list
    is NEVER materialized — it is intrinsically quadratic in per-cell
    density (~10^8 candidate rows already at sf0.1). Instead the
    candidate join runs three times, each aggregated in-stream with
    map-side partial aggregation so the pair rows die inside the join
    stage: (1) all-pairs → per-point neighbor COUNTS, (2) core-core →
    DISTINCT quotient-cell edges, (3) noncore-core → MIN cluster per
    border point. Three scans of small per-point frames beat one
    petabyte materialization at any scale."""
    qres = quotient_res(eps)
    qkey = _quotient_key_sql(qres)
    pts = tiles.select("i", "lon", "lat")
    # pass 1: neighbor counts (self pair included — classic DBSCAN)
    counts = (
        _eps_join(
            pts.select(F.col("i").alias("p"), "lon", "lat"),
            pts.select(
                F.col("i").alias("q"),
                F.col("lon").alias("qlon"),
                F.col("lat").alias("qlat"),
            ),
            eps,
            res,
        )
        .groupBy("p")
        .agg(F.count("*").alias("n"))
    )
    cores = (
        counts.where(F.col("n") >= min_pts)
        .select("p")
        .localCheckpoint(eager=False)
    )
    # Core points with their quotient cell. The quotient key is the
    # COMPACT ix*2^28+iy (no res prefix): labels sum inside the
    # components loop's bigint fixpoint probe — full packed ids
    # (res*2^56+...) overflow the sum under ANSI mode.
    core_pts = pts.join(
        cores.withColumnRenamed("p", "i"), "i", "left_semi"
    ).localCheckpoint(eager=False)
    corec = core_pts.select(
        F.col("i").alias("p"), F.expr(qkey).alias("qcell")
    )
    # pass 2: cell-quotient edges from core-core eps-pairs, deduped
    # in-stream (same-cell pairs become self-loops — harmless).
    qsrc = qkey
    qdst = qkey.replace("lon", "qlon").replace("lat", "qlat")
    qedges = (
        _eps_join(
            core_pts.select(F.col("i").alias("p"), "lon", "lat"),
            core_pts.select(
                F.col("i").alias("q"),
                F.col("lon").alias("qlon"),
                F.col("lat").alias("qlat"),
            ),
            eps,
            res,
        )
        .where(F.col("p") != F.col("q"))
        .select(F.expr(qsrc).alias("src"), F.expr(qdst).alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    ccomp = connected_components(spark, qedges, max_rounds=max_rounds)
    # A cell absent from every edge (single isolated core) is its own
    # component; label components by the MIN core tile key they contain.
    cellcomp = (
        corec.join(ccomp, corec.qcell == ccomp.v, "left")
        .select(
            "p",
            F.coalesce(F.col("component"), F.col("qcell")).alias("ccell"),
        )
    )
    cmin = cellcomp.groupBy("ccell").agg(F.min("p").alias("cluster"))
    core_cluster = cellcomp.join(cmin, "ccell").select("p", "cluster")
    # pass 3: border attachment — non-core probes against the (small)
    # labeled core build side, min-cluster aggregated in-stream.
    core_labeled = core_pts.join(
        core_cluster.withColumnRenamed("p", "i"), "i"
    ).select(
        F.col("i").alias("q"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        "cluster",
    )
    noncore = pts.join(cores.withColumnRenamed("p", "i"), "i", "left_anti")
    border = (
        _eps_join(
            noncore.select(F.col("i").alias("p"), "lon", "lat"),
            core_labeled,
            eps,
            res,
        )
        .groupBy("p")
        .agg(F.min("cluster").alias("bcluster"))
    )
    return (
        tiles.select("i", "image_id")
        .join(
            core_cluster.select(F.col("p").alias("i"), "cluster"), "i", "left"
        )
        .join(
            border.select(F.col("p").alias("i"), "bcluster"), "i", "left"
        )
        .select(
            "image_id",
            F.when(F.col("cluster").isNotNull(), F.lit("core"))
            .when(F.col("bcluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster", "bcluster", F.lit(NOISE))
            .cast("bigint")
            .alias("cluster"),
        )
    )


def dbscan_oracle_sql(
    eps: float = DBSCAN_EPS, min_pts: int = DBSCAN_MIN_PTS
) -> str:
    """Independent DuckDB oracle: pair generation re-derived via its own
    grid bucketing (9-offset equi-join — same provable ball cover, the
    all-pairs filter is equivalent but quadratic), components via an
    UNCAPPED recursive closure over the cell-quotient graph, min-label,
    min-component border attachment. Requires the spliced ``tiles`` CTE
    (synth.oracle_ctes), prefixed WITH RECURSIVE by the caller."""
    eps2 = f"{eps * eps:.10e}"
    res = DBSCAN_RES
    qres = quotient_res(eps)
    if int(-(-eps // grid.cell_size(res))) != 1:
        raise ValueError(
            "oracle's 3x3 offset table assumes rc == 1 "
            f"(eps {eps} vs cell {grid.cell_size(res)})"
        )
    return f"""
g AS (
  SELECT i, lon, lat,
         {grid.ix_sql('lon', res)} AS ix,
         {grid.iy_sql('lat', res)} AS iy
  FROM tiles
),
offs AS (SELECT dx, dy
         FROM (VALUES (-1),(0),(1)) a(dx), (VALUES (-1),(0),(1)) b(dy)),
pairs AS (
  SELECT pr.i AS p, b.i AS q
  FROM (SELECT i, lon, lat, ix + dx AS jx, iy + dy AS jy FROM g, offs) pr
  JOIN g b ON pr.jx = b.ix AND pr.jy = b.iy
  WHERE ((pr.lon - b.lon) * (pr.lon - b.lon)
       + (pr.lat - b.lat) * (pr.lat - b.lat)) <= {eps2}
),
cnt AS (SELECT p, count(*) AS n FROM pairs GROUP BY p),
core AS (SELECT p FROM cnt WHERE n >= {min_pts}),
corec AS (
  SELECT c.p, {_quotient_key_sql(qres).replace('lon', 't.lon').replace('lat', 't.lat')} AS qcell
  FROM core c JOIN tiles t ON c.p = t.i
),
qedges AS (
  SELECT DISTINCT ca.qcell AS src, cb.qcell AS dst
  FROM pairs pr
  JOIN corec ca ON pr.p = ca.p
  JOIN corec cb ON pr.q = cb.p
  WHERE pr.p <> pr.q
),
walk(start, cur) AS (
  SELECT qcell, qcell FROM corec GROUP BY 1, 2
  UNION
  SELECT w.start, e.dst FROM walk w JOIN qedges e ON e.src = w.cur
),
ccomp AS (SELECT start AS qcell, min(cur) AS ccell FROM walk GROUP BY start),
cellcomp AS (
  SELECT c.p, cc.ccell FROM corec c JOIN ccomp cc ON c.qcell = cc.qcell
),
cmin AS (SELECT ccell, min(p) AS cluster FROM cellcomp GROUP BY ccell),
core_cluster AS (
  SELECT cc.p, m.cluster FROM cellcomp cc JOIN cmin m ON cc.ccell = m.ccell
),
border AS (
  SELECT pr.p AS v, min(k.cluster) AS bcluster
  FROM pairs pr JOIN core_cluster k ON pr.q = k.p
  WHERE pr.p NOT IN (SELECT p FROM core)
  GROUP BY pr.p
)
SELECT t.image_id,
       CASE WHEN k.cluster IS NOT NULL THEN 'core'
            WHEN b.bcluster IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(coalesce(k.cluster, b.bcluster, {NOISE}) AS BIGINT) AS cluster
FROM tiles t
LEFT JOIN core_cluster k ON t.i = k.p
LEFT JOIN border b ON t.i = b.v
"""
