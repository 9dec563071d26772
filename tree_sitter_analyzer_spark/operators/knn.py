"""Grid-bucketed kNN join via cell ring expansion — no cross join, ever.

Re-expresses the reference's cascade search (``_ast_cache_search.py:23-98``:
exact → FTS → LIKE → fuzzy tiers, each tier only filling the remaining
budget) and its BFS frontier loop (``edge_store.py:592-631``) as an
iterative cell-disk expansion (SURVEY.md J6/T2):

    round r: candidates = tiles in the Chebyshev disk of radius r around
    each unfinished query's cell; a query finishes when ≥k candidates lie
    within euclidean distance r·s (s = cell size). Doubling r each round
    bounds the loop at O(log(domain/s)) Spark jobs.

Exactness: for a query in cell (qix, qiy), any point OUTSIDE disk r is
> r·s away, and any point WITHIN r·s is inside the disk. So once ≥k
candidates sit within r·s, the top-k among { candidates with dist ≤ r·s }
is the global top-k. Over-fetch → exact re-rank → row_number ≤ k is the
reference's BM25 over-fetch + re-rank + truncate contract
(``_ast_cache_query.py:155-267``, SURVEY.md T1/O5).

Scale design (10^12 tiles, modest query set):
- The query side (disk cells) is broadcast; the tile table is probed
  map-side — no shuffle of the big side. With a *massive* query set the
  same loop degrades gracefully to a shuffled equi-join on ``cell``.
- Per round, only unfinished queries re-expand (left_anti on finished),
  so dense regions finish in round 1 and sparse stragglers alone pay for
  wide disks — the reference's early-exit tier semantics.
- Loop control is DataFrame-side: done/remaining are filtered by
  semi/anti joins, never collect()ed into driver dicts or IN-lists, so
  the round bookkeeping itself scales to massive query sets.
- ``row_number`` windows partition by query_id: parallelism = #queries,
  never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import grid
from .pip_join import tile_cells

DEFAULT_KNN_RES = 7

# Authored once; the oracle splices the same text (operand order matters
# for bit-identical doubles).
DIST2_SQL = "((lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat))"
DIST2_ORACLE_SQL = (
    "((t.lon - q.qlon) * (t.lon - q.qlon) + (t.lat - q.qlat) * (t.lat - q.qlat))"
)


def knn_join(
    tiles: DataFrame,
    qpoints: DataFrame,
    k: int = 5,
    res: int = DEFAULT_KNN_RES,
    max_radius: int = 64,
) -> DataFrame:
    """Exact k nearest tiles per query point.

    Returns (query_id, rank, image_id, dist2_nano) with deterministic
    (dist2, image_id) tie-breaking; ``dist2_nano = floor(dist2 * 1e12)``
    keeps the compared output integer-typed (cross-engine hash safety).
    """
    s = grid.cell_size(res)
    t = tile_cells(tiles, res).select(
        "image_id",
        "lon",
        "lat",
        "cell",
        grid.ix_col("lon", res).alias("ix"),
        grid.iy_col("lat", res).alias("iy"),
    )
    # NOT persisted: the common case finishes in round 1, where the tile
    # side is scanned exactly once (into the cached candidate set) — a
    # cache materialization would cost one extra full pass. Multi-round
    # stragglers rescan, but they carry tiny disk fan-outs.

    q = qpoints.select(
        "query_id",
        "qlon",
        "qlat",
        grid.ix_col("qlon", res).alias("qix"),
        grid.iy_col("qlat", res).alias("qiy"),
    )

    results: list[DataFrame] = []
    win = Window.partitionBy("query_id").orderBy("dist2", "image_id")
    # Round state is localCheckpoint'ed, NOT persist()ed (round-5): the
    # persist-based loop re-derived each round's frames through the full
    # prior-round lineage, and the plan-equality cache lookup missed —
    # the dense-smoke run re-executed every earlier round per action
    # (98 s; checkpointed loop: 8.5 s, identical output). Checkpoints
    # truncate lineage outright, so recompute is impossible by
    # construction — the same discipline as the graph loops.
    remaining = q.localCheckpoint(eager=True)
    r = 1
    while r <= max_radius:
        # Hierarchical ring ladder (round-5): round 1 probes the 3×3
        # fine-cell disk as before; every later round r = 2^j probes a
        # FIXED 5×5 disk at the COARSER resolution res-j (coarse index =
        # fine index DIV 2^j — pure integer arithmetic, no re-floor of
        # the doubles). Coverage proof is the same cell-gap argument:
        # outside a radius-R_c disk of cells of size s_j, a point is
        # > (R_c-1)·s_j away, so R_c = 2 at s_j = r·s yields the exact
        # same bound ladder (r·s) the flat expansion used — but the
        # broadcast stays O(25·|remaining|) at EVERY round instead of
        # O((2r+1)²·|remaining|) (r = 64 previously exploded 16,641
        # offsets per straggler: a ~33 MB broadcast and the dense-smoke
        # knn wall). If r outgrows the grid (res-j < 0) the disk radius
        # widens to 2^(j-res)+1 at res 0 — unreachable with the default
        # res 7 / max_radius 64.
        if r == 1:
            qcells = (
                remaining.withColumn(
                    "off", F.explode(grid.disk_offsets_expr(1))
                )
                .withColumn(
                    "cell",
                    F.expr(grid.cell_from_ixiy_sql(
                        "qix + off.dx", "qiy + off.dy", res
                    )),
                )
                .drop("off", "qix", "qiy")
            )
            tj = t
        else:
            if r == 2:
                # Stragglers exist: pin the tile index once so later
                # rounds re-probe a materialized RDD instead of
                # re-running the scan + synth expressions per round.
                # Lazy — materializes inside round 2's candidate join;
                # the common all-done-in-round-1 case never pays it.
                t = t.localCheckpoint(eager=False)
            j = r.bit_length() - 1
            j_eff = min(j, res)
            res_j = res - j_eff
            rc = (1 << (j - j_eff)) + 1
            div = 1 << j_eff
            qcells = (
                remaining.withColumn(
                    "off", F.explode(grid.disk_offsets_expr(rc))
                )
                .withColumn(
                    "cell",
                    F.expr(grid.cell_from_ixiy_sql(
                        f"(qix DIV {div}) + off.dx",
                        f"(qiy DIV {div}) + off.dy",
                        res_j,
                    )),
                )
                .drop("off", "qix", "qiy")
            )
            tj = t.withColumn(
                "cell",
                F.expr(grid.cell_from_ixiy_sql(
                    f"(ix DIV {div})", f"(iy DIV {div})", res_j
                )),
            )
        bound2 = (r * s) * (r * s)
        # One pass over the (cached) tile index per round; candidates are
        # tiny (disk cells × local density) and are cached so the count,
        # the re-rank, and the anti-join all reuse one materialization —
        # the reference's "don't recompute the frontier" BFS discipline.
        cand = (
            tj.join(F.broadcast(qcells), "cell")
            .withColumn("dist2", F.expr(DIST2_SQL))
            .where(F.col("dist2") <= F.lit(bound2))
            .localCheckpoint(eager=True)
        )
        # Loop control stays DISTRIBUTED: the done/remaining sets are
        # DataFrames filtered by semi/anti joins, never collected into the
        # driver (a 10^7-query set would blow up a driver-side dict and
        # produce giant IN-list plans). The only driver-side values per
        # round are two scalar emptiness probes on tiny persisted frames.
        done = (
            cand.groupBy("query_id")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= F.lit(k))
            .select("query_id")
            .localCheckpoint(eager=True)
        )
        if not done.isEmpty():
            # Two-stage top-k (round-5): a dense cluster can put 10^4-10^6
            # candidates under ONE query's window — partitionBy(query_id)
            # then ships and sorts all of them on a single task. Stage 1
            # takes the per-input-partition top-k first (map-side: no
            # shuffle moved yet, sorts are partition-local and parallel),
            # so the per-query shuffle carries at most k rows per input
            # partition. Exact: every global top-k row is its partition's
            # top-<=k row, so stage 1's output is a superset.
            pwin = Window.partitionBy("query_id", "pid").orderBy(
                "dist2", "image_id"
            )
            pruned = (
                cand.join(done, "query_id", "left_semi")
                .withColumn("pid", F.spark_partition_id())
                .withColumn("prank", F.row_number().over(pwin))
                .where(F.col("prank") <= k)
            )
            topk = (
                pruned.withColumn("rank", F.row_number().over(win))
                .where(F.col("rank") <= k)
                .select("query_id", "rank", "image_id", "dist2")
            )
            results.append(topk)
            remaining = remaining.join(done, "query_id", "left_anti") \
                .localCheckpoint(eager=True)
            if remaining.isEmpty():
                remaining = None
                break
        r *= 2

    if remaining is not None and not remaining.isEmpty():
        # Degenerate tail (query farther than max_radius·s from the kth
        # neighbor — e.g. k > #tiles in the region). Exact fallback for the
        # stragglers only; the broadcast side is the tiny remainder.
        tail = (
            t.crossJoin(F.broadcast(remaining.select("query_id", "qlon", "qlat")))
            .withColumn("dist2", F.expr(DIST2_SQL))
            .withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "image_id", "dist2")
        )
        results.append(tail)

    from .graph import union_all

    if not results:
        # Zero query points: return an empty frame with the contract
        # schema instead of crashing reduce() on an empty list.
        return qpoints.sparkSession.createDataFrame(
            [],
            "query_id bigint, rank bigint, image_id string, dist2_nano bigint",
        )
    combined = union_all(results)
    out = combined.withColumn(
        "dist2_nano", F.expr("CAST(floor(dist2 * 1e12) AS BIGINT)")
    ).select("query_id", F.col("rank").cast("bigint").alias("rank"), "image_id", "dist2_nano")
    # The per-round inputs are checkpointed RDDs, so the combined plan is
    # shallow; one final materialization keeps downstream consumers from
    # re-running the round windows.
    return out.localCheckpoint(eager=True)


def radius_join(
    tiles: DataFrame,
    qpoints: DataFrame,
    radius: float,
    res: int = DEFAULT_KNN_RES,
) -> DataFrame:
    """Fixed-radius spatial join (the ST_DWithin analog, SURVEY.md J12's
    distance-band family): every (query, tile) pair with euclidean
    distance ≤ ``radius``, exact.

    Same two-phase discipline as ``knn_join`` but with a STATIC disk —
    no iteration: candidates are the tiles in the Chebyshev cell disk of
    ``rc = ceil(radius / cell_size)`` around each query's cell (any point
    within euclidean ``radius`` is ≤ rc cells away on each axis, so the
    disk provably covers the ball); one exact ``dist2 ≤ radius²`` verify
    keeps true pairs only. The tiny query×disk side broadcasts; the tile
    table is probed map-side on the cell equi-join — the big side never
    shuffles, and with a massive query set the same plan degrades to a
    shuffled cell equi-join. Returns (query_id, image_id, dist2_nano),
    integer-typed distance for cross-engine hash safety.
    """
    s = grid.cell_size(res)
    rc = int(-(-radius // s))  # ceil
    t = tile_cells(tiles, res).select("image_id", "lon", "lat", "cell")
    q = qpoints.select(
        "query_id",
        "qlon",
        "qlat",
        grid.ix_col("qlon", res).alias("qix"),
        grid.iy_col("qlat", res).alias("qiy"),
    )
    qcells = (
        q.withColumn("off", F.explode(grid.disk_offsets_expr(rc)))
        .withColumn(
            "cell",
            F.expr(grid.cell_from_ixiy_sql("qix + off.dx", "qiy + off.dy", res)),
        )
        .drop("off", "qix", "qiy")
    )
    bound2 = f"{radius * radius:.10e}"  # exponent literal → DOUBLE both engines
    return (
        t.join(F.broadcast(qcells), "cell")
        .withColumn("dist2", F.expr(DIST2_SQL))
        .where(F.expr(f"dist2 <= {bound2}"))
        .select(
            "query_id",
            "image_id",
            F.expr("CAST(floor(dist2 * 1e12) AS BIGINT)").alias("dist2_nano"),
        )
    )


def radius_join_oracle_sql(radius: float) -> str:
    """Naive exact oracle: cross join + the identical distance text and
    the identical exponent-notation bound literal."""
    bound2 = f"{radius * radius:.10e}"
    return f"""
SELECT q.query_id, t.image_id,
       CAST(floor({DIST2_ORACLE_SQL} * 1e12) AS BIGINT) AS dist2_nano
FROM qpoints q CROSS JOIN tiles t
WHERE {DIST2_ORACLE_SQL} <= {bound2}
"""


def knn_oracle_sql(k: int = 5) -> str:
    """Naive exact oracle (cross join + window) — fine at sf0.01."""
    return f"""
SELECT query_id, rank, image_id, dist2_nano FROM (
  SELECT q.query_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {DIST2_ORACLE_SQL}, t.image_id
         ) AS rank,
         t.image_id,
         CAST(floor({DIST2_ORACLE_SQL} * 1e12) AS BIGINT) AS dist2_nano
  FROM qpoints q CROSS JOIN tiles t
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# IDW interpolation — the raster-surface estimation op built on radius_join.
# ---------------------------------------------------------------------------

IDW_W_SCALE = 10_000_000_000  # 1e10: wt = SCALE div d2_nano, bigint-exact
IDW_D2_FLOOR = 100  # clamp near-exact hits so weights stay bounded


def idw_surface(
    tiles: DataFrame,
    qpoints: DataFrame,
    radius: float = 0.01,
    res: int = DEFAULT_KNN_RES,
) -> DataFrame:
    """Inverse-distance-weighted surface estimate of tile pixel area
    (z = w·h) at each query point: ẑ(q) = Σ wᵢzᵢ / Σ wᵢ over neighbors
    within ``radius``, wᵢ = SCALE div max(d²ᵢ_nano, FLOOR) — the classic
    power-2 IDW, carried ENTIRELY in bigints (weights via integer
    division of the already-integer nano-distance from ``radius_join``)
    so partial aggregation order can't perturb a bit and the DuckDB
    oracle matches exactly. Query points with no neighbor in range emit
    no row (their estimate is undefined, not zero).

    Scale shape: inherits radius_join's one broadcast-cell candidate
    join + exact verify; the agg is ~#queries keys. The z lookup join is
    keyed on the tile id.
    """
    pairs = radius_join(tiles, qpoints, radius, res)
    z = tiles.select(
        "image_id", (F.col("w") * F.col("h")).cast("bigint").alias("z")
    )
    return (
        pairs.join(z, "image_id")
        .withColumn(
            "wt",
            F.expr(
                f"{IDW_W_SCALE} DIV GREATEST(dist2_nano, {IDW_D2_FLOOR})"
            ),
        )
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_nbrs"),
            F.sum(F.col("wt") * F.col("z")).alias("num"),
            F.sum("wt").alias("den"),
        )
        .select(
            "query_id",
            "n_nbrs",
            F.expr("num DIV den").alias("z_est"),
        )
    )


def idw_oracle_sql(radius: float = 0.01) -> str:
    """Same integer formulation over the naive cross-join pair set
    (DuckDB spells integer division ``//``)."""
    bound2 = f"{radius * radius:.10e}"
    return f"""
idw_pairs AS (
  SELECT q.query_id, t.w * t.h AS z,
         CAST(floor({DIST2_ORACLE_SQL} * 1e12) AS BIGINT) AS d2n
  FROM qpoints q CROSS JOIN tiles t
  WHERE {DIST2_ORACLE_SQL} <= {bound2}
),
idw_w AS (
  SELECT query_id, z,
         {IDW_W_SCALE} // GREATEST(d2n, {IDW_D2_FLOOR}) AS wt
  FROM idw_pairs
)
SELECT query_id, count(*) AS n_nbrs,
       CAST(sum(wt * z) // sum(wt) AS BIGINT) AS z_est
FROM idw_w GROUP BY query_id
"""


# ---------------------------------------------------------------------------
# R139: leave-one-out IDW cross-validation — the standard geostatistical
# model check (LOOCV, e.g. Isaaks & Srivastava 1989): re-estimate each
# observation from its neighbors EXCLUDING itself and report the error.
# Queries are a deterministic 1/``sample_mod`` tile sample (the
# nn_distance_stats discipline — engine-reproducible, and exactly how a
# validation pass runs at 10^12 rows). The neighbor value z rides the
# tile side THROUGH the candidate join, so the quadratic-in-density pair
# rows are aggregated in-stream (map-side partial agg on query_id) and
# never shuffle to a second join — the dense-neighborhood rule.
# ---------------------------------------------------------------------------


def idw_loo_error(
    tiles: DataFrame,
    radius: float = 0.01,
    res: int = DEFAULT_KNN_RES,
    sample_mod: int = 23,
) -> DataFrame:
    """(query_id, z_act, n_nbrs, z_est, abs_err) for each sampled tile
    with >= 1 in-radius neighbor (self excluded)."""
    s = grid.cell_size(res)
    rc = int(-(-radius // s))
    t = tile_cells(tiles, res).select(
        "image_id", "lon", "lat", "cell",
        (F.col("w") * F.col("h")).cast("bigint").alias("z"),
    )
    q = tiles.where(F.col("i") % sample_mod == 0).select(
        F.col("image_id").alias("query_id"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        (F.col("w") * F.col("h")).cast("bigint").alias("z_act"),
    )
    qcells = (
        q.withColumn("qix", grid.ix_col("qlon", res))
        .withColumn("qiy", grid.iy_col("qlat", res))
        .withColumn("off", F.explode(grid.disk_offsets_expr(rc)))
        .withColumn(
            "cell",
            F.expr(grid.cell_from_ixiy_sql("qix + off.dx", "qiy + off.dy", res)),
        )
        .drop("off", "qix", "qiy")
    )
    bound2 = f"{radius * radius:.10e}"
    return (
        t.join(F.broadcast(qcells), "cell")
        .where(F.col("image_id") != F.col("query_id"))
        .withColumn("dist2", F.expr(DIST2_SQL))
        .where(F.expr(f"dist2 <= {bound2}"))
        .withColumn(
            "wt",
            F.expr(
                f"{IDW_W_SCALE} DIV GREATEST("
                f"CAST(floor(dist2 * 1e12) AS BIGINT), {IDW_D2_FLOOR})"
            ),
        )
        .groupBy("query_id", "z_act")
        .agg(
            F.count("*").alias("n_nbrs"),
            F.sum(F.col("wt") * F.col("z")).alias("num"),
            F.sum("wt").alias("den"),
        )
        .selectExpr(
            "query_id", "z_act", "n_nbrs",
            "num DIV den AS z_est",
            "abs(num DIV den - z_act) AS abs_err",
        )
    )


def idw_loo_oracle_sql(radius: float = 0.01, sample_mod: int = 23) -> str:
    bound2 = f"{radius * radius:.10e}"
    return f"""
loo_q AS (
  SELECT image_id AS query_id, lon AS qlon, lat AS qlat,
         CAST(w * h AS BIGINT) AS z_act
  FROM tiles WHERE i % {sample_mod} = 0),
loo_p AS (
  SELECT q.query_id, q.z_act, CAST(t.w * t.h AS BIGINT) AS z,
         {IDW_W_SCALE} // GREATEST(
           CAST(floor({DIST2_ORACLE_SQL} * 1e12) AS BIGINT),
           {IDW_D2_FLOOR}) AS wt
  FROM loo_q q CROSS JOIN tiles t
  WHERE t.image_id <> q.query_id AND {DIST2_ORACLE_SQL} <= {bound2})
SELECT query_id, z_act, count(*) AS n_nbrs,
       CAST(sum(wt * z) // sum(wt) AS BIGINT) AS z_est,
       abs(CAST(sum(wt * z) // sum(wt) AS BIGINT) - z_act) AS abs_err
FROM loo_p GROUP BY 1, 2"""
