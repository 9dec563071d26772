"""Raster hydrology over the tile-density surface: D8-style flow routing.

Reads the per-cell tile count as a terrain surface and routes every cell
UPHILL to its densest 8-neighbor (steepest ascent — the mode-seeking dual
of hydrological D8 descent; identical mechanics, and on a density surface
the "sinks" are the density PEAKS, so basins are attraction basins of the
hotspot modes). The reference's analog is the hierarchical scope rollup
walking child scopes to their governing parent (`ast_cache.py` scope
resolution walks); here the pointer walk is over the raster quotient.

Three classic raster-GIS operators fall out of the one parent map:

* flow direction  — parent(c) = argmax_{n in 8-nbrs}(count) if that max
  strictly exceeds count(c), else c itself (a peak / self-loop sink);
  ties broken by smallest packed neighbor key, so the map is a total
  deterministic function.
* flow accumulation — how many cells' ascent paths (capped at
  ``ACC_STEPS`` hops, self included) pass through each cell: the
  "upstream drainage area" of ridge routing.
* watershed basins — the peak reached by chasing parents; computed with
  POINTER DOUBLING (p ∘ p per round, ``DOUBLING_ROUNDS`` rounds = the
  ancestor exactly 2^rounds steps up, saturating at self-loop peaks), the
  O(log diameter) shape a 1000-executor functional-graph chase wants —
  never a per-step driver loop over the full frame.

Scale shape: tiles aggregate ONCE to the occupied-cell quotient (|cells|
is bounded by domain/res, orders of magnitude below the tile count; one
map-side-combined exchange); every later join is cell-frame × cell-frame
equi-join on packed bigint keys. Nothing after the first aggregation ever
touches a tile row. All arithmetic is bigint (cross-engine float-hash
discipline); both walks are step-capped and the DuckDB oracles replicate
the SAME cap, so Spark and oracle agree whether or not the walk converged
(the percolation/epidemic discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import grid

FLOW_RES = 7
_PACK = 268_435_456  # packs (cx, cy) into one bigint; cx ≤ 360·2^res ≪ 2^35
DOUBLING_ROUNDS = 5  # parent^(2^5): a 32-step chase in 5 self-joins
ACC_STEPS = 8        # flow-accumulation walk cap (oracle uses the same)

_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def cell_frame(tiles: DataFrame, res: int = FLOW_RES) -> DataFrame:
    """Occupied-cell quotient (cx, cy, v, n): ONE tile exchange, then tiny."""
    return (
        tiles.groupBy(
            F.expr(grid.ix_sql("lon", res)).alias("cx"),
            F.expr(grid.iy_sql("lat", res)).alias("cy"),
        )
        .agg(F.count("*").alias("n"))
        .withColumn("v", F.expr(f"cx * {_PACK} + cy"))
    )


def ascent_parent(cells: DataFrame) -> DataFrame:
    """Total deterministic parent map (v, p) — steepest-ascent D8 pointer.

    Fan each cell ×8 to its neighbor coordinates (JVM-side array explode,
    SURVEY.md X5), equi-join back to the occupied frame on (nx, ny), and
    pick max(count) / min(key) per cell via a lexicographic struct max —
    an ordinary two-phase hash aggregate, no window shuffle. A cell whose
    densest neighbor is not strictly denser (or with no occupied
    neighbor) is a peak: p = v.
    """
    offs = ",".join(f"struct({dx} as dx, {dy} as dy)" for dx, dy in _OFFS)
    fan = cells.select(
        "v", "n", "cx", "cy", F.explode(F.expr(f"array({offs})")).alias("o")
    ).select(
        "v",
        "n",
        (F.col("cx") + F.col("o.dx")).alias("nx"),
        (F.col("cy") + F.col("o.dy")).alias("ny"),
    )
    nb = cells.select(
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
        F.col("v").alias("nv"),
        F.col("n").alias("nn"),
    )
    best = (
        fan.join(nb, (fan.nx == nb.bx) & (fan.ny == nb.by))
        .groupBy("v")
        .agg(
            F.max(
                F.struct(F.col("nn").alias("nn"), (-F.col("nv")).alias("mnv"))
            ).alias("b")
        )
    )
    return cells.join(best, "v", "left").select(
        "v",
        F.when(F.col("b.nn") > F.col("n"), -F.col("b.mnv"))
        .otherwise(F.col("v"))
        .alias("p"),
    )


def flow_accumulation(
    tiles: DataFrame, res: int = FLOW_RES, steps: int = ACC_STEPS
) -> DataFrame:
    """Per occupied cell: tile count and capped upstream drainage count.

    acc(c) = #distinct cells whose ≤``steps``-hop ascent path visits c
    (self included, so every cell has acc ≥ 1). The walk is one
    functional-graph join per hop over the cell quotient; paths strictly
    ascend in density until a peak, so the only repeats are peak
    self-loops — removed by the distinct before the final count.
    """
    cells = cell_frame(tiles, res).localCheckpoint(eager=False)
    par = ascent_parent(cells).localCheckpoint(eager=False)
    pmap = par.select(F.col("v").alias("pv"), F.col("p").alias("pp"))
    frontier = par.select(F.col("v").alias("start"), F.col("v").alias("cur"))
    visited = frontier
    for k in range(steps):
        frontier = frontier.join(
            pmap, frontier.cur == pmap.pv
        ).select("start", F.col("pp").alias("cur"))
        if k % 2 == 1:
            # two hops per lineage barrier (graph-suite discipline)
            frontier = frontier.localCheckpoint(eager=False)
        visited = visited.unionByName(frontier)
    acc = (
        visited.dropDuplicates(["start", "cur"])
        .groupBy("cur")
        .agg(F.count("*").alias("acc"))
    )
    return cells.join(acc, cells.v == acc.cur).select(
        "cx", "cy", F.col("n").alias("n_tiles"), "acc"
    )


def watershed_basins(
    tiles: DataFrame, res: int = FLOW_RES, rounds: int = DOUBLING_ROUNDS
) -> DataFrame:
    """Attraction-basin partition of the density raster, one row per basin.

    Pointer doubling: after k rounds the map holds each cell's ancestor
    exactly 2^k steps up (peaks self-saturate), so ``rounds`` self-joins
    replace a 2^rounds-step serial chase — the log-depth plan a huge
    functional graph needs. The oracle chases the SAME 2^rounds steps
    linearly (recursive CTE), so results agree whether or not every path
    has reached its peak.
    """
    cells = cell_frame(tiles, res).localCheckpoint(eager=False)
    cur = ascent_parent(cells).localCheckpoint(eager=False)
    for k in range(rounds):
        nxt = (
            cur.alias("a")
            .join(cur.alias("b"), F.col("a.p") == F.col("b.v"))
            .select(F.col("a.v").alias("v"), F.col("b.p").alias("p"))
        )
        if k % 2 == 1:
            nxt = nxt.localCheckpoint(eager=False)
        cur = nxt
    assigned = cells.join(cur.select("v", F.col("p").alias("basin")), "v")
    peaks = cells.select(F.col("v").alias("basin"), F.col("n").alias("peak_n"))
    return (
        assigned.groupBy("basin")
        .agg(F.count("*").alias("n_cells"), F.sum("n").alias("n_tiles"))
        .join(peaks, "basin")
        .select("basin", "n_cells", "n_tiles", "peak_n")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — splice after a CTE list providing ``tiles``; the walk
# CTEs need WITH RECURSIVE on the outer WITH.
# ---------------------------------------------------------------------------


def _base_ctes(res: int) -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS)
    return f"""hy_cells AS (
  SELECT {grid.ix_sql('lon', res)} AS cx, {grid.iy_sql('lat', res)} AS cy,
         count(*) AS n
  FROM tiles GROUP BY 1, 2),
hy_v AS (SELECT cx, cy, n, cx * {_PACK} + cy AS v FROM hy_cells),
hy_offs(dx, dy) AS (VALUES {offs}),
hy_nbr AS (
  SELECT a.v, a.n, b.v AS nv, b.n AS nn
  FROM hy_v a JOIN hy_offs o ON TRUE
  JOIN hy_v b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy),
hy_rank AS (
  SELECT v, nv, nn,
         row_number() OVER (PARTITION BY v ORDER BY nn DESC, nv) AS rn
  FROM hy_nbr),
hy_parent AS (
  SELECT c.v, CASE WHEN r.nn > c.n THEN r.nv ELSE c.v END AS p
  FROM hy_v c LEFT JOIN hy_rank r ON r.v = c.v AND r.rn = 1)"""


def flow_accumulation_oracle(res: int = FLOW_RES, steps: int = ACC_STEPS) -> str:
    return f"""{_base_ctes(res)},
hy_w(start, cur, hops) AS (
  SELECT v, v, 0 FROM hy_v
  UNION ALL
  SELECT w.start, p.p, w.hops + 1
  FROM hy_w w JOIN hy_parent p ON p.v = w.cur
  WHERE w.hops < {steps}),
hy_acc AS (
  SELECT cur, count(*) AS acc
  FROM (SELECT DISTINCT start, cur FROM hy_w) GROUP BY 1)
SELECT c.cx, c.cy, c.n AS n_tiles, a.acc
FROM hy_v c JOIN hy_acc a ON a.cur = c.v"""


def watershed_oracle(res: int = FLOW_RES, rounds: int = DOUBLING_ROUNDS) -> str:
    cap = 1 << rounds
    return f"""{_base_ctes(res)},
hy_w(v, cur, hops) AS (
  SELECT v, v, 0 FROM hy_v
  UNION ALL
  SELECT w.v, p.p, w.hops + 1
  FROM hy_w w JOIN hy_parent p ON p.v = w.cur
  WHERE w.hops < {cap}),
hy_basin AS (SELECT v, cur AS basin FROM hy_w WHERE hops = {cap}),
hy_sizes AS (
  SELECT b.basin, count(*) AS n_cells, sum(c.n) AS n_tiles
  FROM hy_basin b JOIN hy_v c ON c.v = b.v GROUP BY 1)
SELECT s.basin, s.n_cells, s.n_tiles, pk.n AS peak_n
FROM hy_sizes s JOIN hy_v pk ON pk.v = s.basin"""


# ---------------------------------------------------------------------------
# R299: Strahler stream order over the ascent drainage forest — the classic
# stream-network hierarchy (Strahler 1957): leaves are order 1; a node
# where >= 2 children attain the max child order is max+1, else max. The
# recurrence iterated from all-1 is MONOTONE (m never decreases; the
# at-max child count can only grow while m holds), so a fixed unroll of
# STRAHLER_ROUNDS synchronized updates over the cell quotient converges
# for any forest of depth <= rounds (the k-core fixed-unroll discipline;
# convergence pinned round N-1 == round N in tests). Per-round cost: one
# child->parent equi-join + one parent-keyed agg on the bounded cell
# frame — never touches tile rows.
# ---------------------------------------------------------------------------

STRAHLER_ROUNDS = 8


def strahler_orders(
    tiles: DataFrame, res: int = FLOW_RES, rounds: int = STRAHLER_ROUNDS
) -> DataFrame:
    """Per-order histogram of the drainage forest: (strahler, n_cells,
    n_tiles, rb_milli) where rb is the bifurcation ratio
    n(order)/n(order+1) x1000 (Horton's law reads ~3000-5000 on real
    networks; -1 sentinel on the top order)."""
    cells = cell_frame(tiles, res).localCheckpoint(eager=False)
    par = ascent_parent(cells).localCheckpoint(eager=False)
    edges = par.where("p <> v").selectExpr("v AS child", "p AS parent")
    ord_df = cells.selectExpr("v", "CAST(1 AS BIGINT) AS ord")
    for k in range(rounds):
        ch = (
            edges.join(
                ord_df.selectExpr("v AS child", "ord AS cord"), "child"
            )
            .groupBy("parent", "cord")
            .agg(F.count("*").alias("c"))
        )
        best = (
            ch.groupBy("parent")
            .agg(
                F.max(
                    F.struct(
                        F.col("cord").alias("m"),
                        F.col("c").alias("cm"),
                    )
                ).alias("b")
            )
            .selectExpr(
                "parent AS v",
                "b.m + CASE WHEN b.cm >= 2 THEN 1 ELSE 0 END AS cand",
            )
        )
        nxt = (
            cells.select("v")
            .join(best, "v", "left")
            .selectExpr(
                "v", "CAST(greatest(coalesce(cand, 1), 1) AS BIGINT) AS ord"
            )
        )
        if k % 2 == 1:
            nxt = nxt.localCheckpoint(eager=False)
        ord_df = nxt
    hist = (
        cells.join(ord_df, "v")
        .groupBy("ord")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_cells"),
            F.expr("CAST(sum(n) AS BIGINT)").alias("n_tiles"),
        )
    )
    nxt_h = hist.selectExpr("ord AS nord", "n_cells AS nn_cells")
    return (
        hist.join(F.broadcast(nxt_h), F.expr("nord = ord + 1"), "left")
        .selectExpr(
            "CAST(ord AS BIGINT) AS strahler",
            "n_cells",
            "n_tiles",
            "CAST(CASE WHEN nn_cells IS NULL THEN -1"
            " ELSE (1000 * n_cells) DIV nn_cells END AS BIGINT)"
            " AS rb_milli",
        )
    )


def strahler_oracle(
    res: int = FLOW_RES, rounds: int = STRAHLER_ROUNDS
) -> str:
    """Chained MATERIALIZED per-round CTEs replicating the synchronized
    update 1:1 (the k-core oracle discipline — materialization is
    load-bearing against exponential re-inlining)."""
    ctes = [
        "st_e AS MATERIALIZED (SELECT v AS child, p AS parent"
        " FROM hy_parent WHERE p <> v)",
        "st_s0 AS MATERIALIZED (SELECT v, CAST(1 AS BIGINT) AS ord"
        " FROM hy_v)",
    ]
    for k in range(rounds):
        ctes.append(f"""st_c{k} AS MATERIALIZED (
  SELECT e.parent, o.ord AS cord, count(*) AS c
  FROM st_e e JOIN st_s{k} o ON o.v = e.child GROUP BY 1, 2),
st_b{k} AS MATERIALIZED (
  SELECT parent AS v,
         cord + CASE WHEN c >= 2 THEN 1 ELSE 0 END AS cand
  FROM (SELECT parent, cord, c,
               row_number() OVER (PARTITION BY parent
                 ORDER BY cord DESC, c DESC) AS rn
        FROM st_c{k})
  WHERE rn = 1),
st_s{k + 1} AS MATERIALIZED (
  SELECT b.v, CAST(greatest(coalesce(m.cand, 1), 1) AS BIGINT) AS ord
  FROM hy_v b LEFT JOIN st_b{k} m ON m.v = b.v)""")
    chain = ",\n".join(ctes)
    return f"""{_base_ctes(res)},
{chain},
st_hist AS (
  SELECT o.ord, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(c.n) AS BIGINT) AS n_tiles
  FROM st_s{rounds} o JOIN hy_v c ON c.v = o.v GROUP BY 1)
SELECT CAST(a.ord AS BIGINT) AS strahler, a.n_cells, a.n_tiles,
       CAST(CASE WHEN b.n_cells IS NULL THEN -1
            ELSE (1000 * a.n_cells) // b.n_cells END AS BIGINT)
         AS rb_milli
FROM st_hist a LEFT JOIN st_hist b ON b.ord = a.ord + 1"""


# ---------------------------------------------------------------------------
# R302: adjusted Rand index — partition-agreement audit (Hubert & Arabie
# 1985) between the watershed attraction-basin partition and the naive
# res-5 grid-block partition of the SAME occupied res-7 cells: how much
# of the drainage structure does a fixed coarse grid already capture?
# (the zonation/MAUP question beside resolution_loss). Pair-counting
# done exactly on the bounded cell quotient: I = sum C(n_ij,2) over the
# contingency table, ARI = (I - E)/(M - E) cross-multiplied through
# C(n,2) and doubled so every compared quantity is an integer —
# num2 = 2*(I*C2n - A2*B2), den2 = (A2+B2)*C2n - 2*A2*B2, sign/abs DIV.
# Every magnitude is geometry-bounded (occupied cells, not tiles).
# ---------------------------------------------------------------------------

ARI_BLOCK_SHIFT = 2  # res-7 cell -> res-5 block


def basin_block_ari(
    tiles: DataFrame, res: int = FLOW_RES, rounds: int = DOUBLING_ROUNDS
) -> DataFrame:
    cells = cell_frame(tiles, res).localCheckpoint(eager=False)
    cur = ascent_parent(cells).localCheckpoint(eager=False)
    for k in range(rounds):
        nxt = (
            cur.alias("a")
            .join(cur.alias("b"), F.col("a.p") == F.col("b.v"))
            .select(F.col("a.v").alias("v"), F.col("b.p").alias("p"))
        )
        if k % 2 == 1:
            nxt = nxt.localCheckpoint(eager=False)
        cur = nxt
    lab = cells.join(cur.selectExpr("v", "p AS basin"), "v").selectExpr(
        "basin",
        f"(cx DIV {1 << ARI_BLOCK_SHIFT}) * {_PACK}"
        f" + (cy DIV {1 << ARI_BLOCK_SHIFT}) AS block",
    )
    cont = lab.groupBy("basin", "block").agg(F.count("*").alias("nij"))
    i2 = cont.agg(
        F.expr("CAST(sum(nij * (nij - 1) DIV 2) AS BIGINT)").alias("i2"),
        F.expr("CAST(sum(nij) AS BIGINT)").alias("n"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_pairs_nonzero"),
    )
    a2 = (
        cont.groupBy("basin")
        .agg(F.sum("nij").alias("ai"))
        .agg(
            F.expr("CAST(sum(ai * (ai - 1) DIV 2) AS BIGINT)").alias("a2"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_basins"),
        )
    )
    b2 = (
        cont.groupBy("block")
        .agg(F.sum("nij").alias("bj"))
        .agg(
            F.expr("CAST(sum(bj * (bj - 1) DIV 2) AS BIGINT)").alias("b2"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_blocks"),
        )
    )
    return (
        i2.crossJoin(F.broadcast(a2))
        .crossJoin(F.broadcast(b2))
        .selectExpr(
            "n AS n_cells", "n_basins", "n_blocks", "i2", "a2", "b2",
            "2 * (i2 * (n * (n - 1) DIV 2) - a2 * b2) AS num2",
            "(a2 + b2) * (n * (n - 1) DIV 2) - 2 * a2 * b2 AS den2",
        )
        .selectExpr(
            "n_cells", "n_basins", "n_blocks", "i2", "a2", "b2",
            "CAST(CASE WHEN num2 > 0 THEN 1 WHEN num2 < 0 THEN -1"
            " ELSE 0 END AS BIGINT) AS ari_sign",
            "CAST(CASE WHEN den2 = 0 THEN 0"
            " ELSE (1000 * abs(num2)) DIV abs(den2) END AS BIGINT)"
            " AS ari_abs_milli",
        )
    )


def ari_oracle(
    res: int = FLOW_RES, rounds: int = DOUBLING_ROUNDS
) -> str:
    cap = 1 << rounds
    return f"""{_base_ctes(res)},
ar_w(v, cur, hops) AS (
  SELECT v, v, 0 FROM hy_v
  UNION ALL
  SELECT w.v, p.p, w.hops + 1
  FROM ar_w w JOIN hy_parent p ON p.v = w.cur
  WHERE w.hops < {cap}),
ar_lab AS (
  SELECT w.cur AS basin,
         (c.cx // {1 << ARI_BLOCK_SHIFT}) * {_PACK}
           + (c.cy // {1 << ARI_BLOCK_SHIFT}) AS block
  FROM ar_w w JOIN hy_v c ON c.v = w.v
  WHERE w.hops = {cap}),
ar_cont AS (
  SELECT basin, block, count(*) AS nij FROM ar_lab GROUP BY 1, 2),
ar_i AS (
  SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS i2,
         CAST(sum(nij) AS BIGINT) AS n
  FROM ar_cont),
ar_a AS (
  SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS a2,
         CAST(count(*) AS BIGINT) AS n_basins
  FROM (SELECT basin, sum(nij) AS ai FROM ar_cont GROUP BY 1)),
ar_b AS (
  SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS b2,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM (SELECT block, sum(nij) AS bj FROM ar_cont GROUP BY 1)),
ar_x AS (
  SELECT i.n AS n_cells, a.n_basins, b.n_blocks, i.i2, a.a2, b.b2,
         2 * (i.i2 * (i.n * (i.n - 1) // 2) - a.a2 * b.b2) AS num2,
         (a.a2 + b.b2) * (i.n * (i.n - 1) // 2) - 2 * a.a2 * b.b2
           AS den2
  FROM ar_i i CROSS JOIN ar_a a CROSS JOIN ar_b b)
SELECT n_cells, n_basins, n_blocks, i2, a2, b2,
       CAST(CASE WHEN num2 > 0 THEN 1 WHEN num2 < 0 THEN -1 ELSE 0 END
         AS BIGINT) AS ari_sign,
       CAST(CASE WHEN den2 = 0 THEN 0
            ELSE (1000 * abs(num2)) // abs(den2) END AS BIGINT)
         AS ari_abs_milli
FROM ar_x"""
