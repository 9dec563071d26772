"""Cost-distance surface (GIS cost-distance / isochrone) over the tile
grid — SURVEY §2.12 R40.

Raster cost-distance: each occupied res-7 cell gets an integer traversal
cost from its tile density (dense cells are "roads": cost 1; sparse are
"terrain": cost 5); the surface is the minimum cumulative cost from the
nearest hotspot seed over 4-connected moves. The reference's analog is
dependency-distance over the import graph (``_codegraph_query_impact``
BFS depth); here the graph is *derived from the raster* and the distance
is weighted.

Spark-first composition: the cell graph is built with one groupBy + a
4-way shifted equi-join (never an all-pairs adjacency test), seeds become
0-weight edges from a virtual super-source (id -1, one SSSP run for ALL
sources — multi-source = single-source on the augmented graph), and the
propagation is the existing distributed Bellman-Ford
(``graph.weighted_sssp``: vertex-keyed join + min-agg, two relaxations
per materialization, scalar fixpoint probe). The oracle replicates the
augmented graph and caps its recursive walk at the same even step budget.

At 10^12 rows the derived cell graph is ~10^6-10^8 vertices (bounded by
the grid, not the row count) — the expensive raster→graph reduction is
one density groupBy; everything after runs on cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import synth
from ..synth import dlit
from .graph import _even_steps, weighted_sssp

RES = 7
_MUL = 1 << RES
_PACK = 268_435_456
MAX_ROUNDS = 24
SUPER_SRC = -1

# cost bands: tile density → traversal cost (all-integer)
_COST = "CASE WHEN cnt >= 20 THEN 1 WHEN cnt >= 5 THEN 2 ELSE 5 END"
_OFFS = [(1, 0), (-1, 0), (0, 1), (0, -1)]


def _cx(lon: str) -> str:
    return f"CAST(floor((({lon}) + 180.0e0) * {_MUL}) AS BIGINT)"


def _cy(lat: str) -> str:
    return f"CAST(floor((({lat}) + 90.0e0) * {_MUL}) AS BIGINT)"


def _seed_cells_sql() -> list[str]:
    """(cx, cy) SQL literal pairs for the hotspot seeds — the same dlit
    literals on both engines."""
    return [
        f"SELECT {_cx(dlit(lon))} AS cx, {_cy(dlit(lat))} AS cy"
        for lon, lat in synth.HOTSPOTS
    ]


def costed_cells(tiles: DataFrame) -> DataFrame:
    """Occupied res-7 cells with integer traversal cost."""
    return (
        tiles.groupBy(
            F.expr(_cx("lon")).alias("cx"), F.expr(_cy("lat")).alias("cy")
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            "cx",
            "cy",
            (F.col("cx") * _PACK + F.col("cy")).alias("cell"),
            F.expr(_COST).cast("bigint").alias("cost"),
        )
    )


def _real_edges(cells: DataFrame) -> DataFrame:
    """4-way shifted equi-join grid edges: an edge u→v costs the DEST
    cell's cost — never an all-pairs adjacency test."""
    a = cells.select("cx", "cy", F.col("cell").alias("src"))
    b = cells.select(
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
        F.col("cell").alias("dst"),
        F.col("cost").alias("w"),
    )
    edges = None
    for dx, dy in _OFFS:
        e = a.join(
            b, (a.cx + F.lit(dx) == b.bx) & (a.cy + F.lit(dy) == b.by)
        ).select("src", "dst", "w")
        edges = e if edges is None else edges.unionByName(e)
    return edges


def cost_distance(spark: SparkSession, tiles: DataFrame) -> DataFrame:
    """(cell, dist): minimum cumulative traversal cost from the nearest
    hotspot seed, within the shared even step budget."""
    cells = costed_cells(tiles).localCheckpoint(eager=False)
    edges = _real_edges(cells)
    # virtual super-source: 0-weight edges onto each occupied seed cell
    seeds_df = None
    for s in _seed_cells_sql():
        row = spark.sql(s)
        seeds_df = row if seeds_df is None else seeds_df.unionByName(row)
    super_edges = (
        seeds_df.join(cells, ["cx", "cy"])  # only occupied seeds
        .select(
            F.lit(SUPER_SRC).cast("bigint").alias("src"),
            F.col("cell").alias("dst"),
            F.lit(0).cast("bigint").alias("w"),
        )
    )
    dist = weighted_sssp(
        spark, edges.unionByName(super_edges), src=SUPER_SRC,
        max_rounds=MAX_ROUNDS,
    )
    return dist.where(F.col("v") != SUPER_SRC).select(
        F.col("v").alias("cell"), "dist"
    )


def surface_ctes_sql() -> str:
    """The cost-surface CTE chain (cells → costed → edges → walk →
    dists): the shared oracle body for cost_distance and the path trace.
    Splice after a CTE list providing ``tiles`` (needs WITH RECURSIVE)."""
    steps = _even_steps(MAX_ROUNDS)
    seeds = " UNION ALL ".join(_seed_cells_sql())
    shifted = " UNION ALL ".join(
        f"SELECT a.cell AS src, b.cell AS dst, b.cost AS w "
        f"FROM costed a JOIN costed b ON b.cx = a.cx + ({dx}) AND b.cy = a.cy + ({dy})"
        for dx, dy in _OFFS
    )
    return f"""cells AS (
  SELECT {_cx('lon')} AS cx, {_cy('lat')} AS cy, count(*) AS cnt
  FROM tiles GROUP BY 1, 2),
costed AS (
  SELECT cx, cy, cx * {_PACK} + cy AS cell, CAST({_COST} AS BIGINT) AS cost
  FROM cells),
seeds AS ({seeds}),
super_edges AS (
  SELECT CAST({SUPER_SRC} AS BIGINT) AS src, c.cell AS dst, CAST(0 AS BIGINT) AS w
  FROM seeds s JOIN costed c ON c.cx = s.cx AND c.cy = s.cy),
edges AS ({shifted} UNION ALL SELECT src, dst, w FROM super_edges),
walk(v, d, hops) AS (
  SELECT CAST({SUPER_SRC} AS BIGINT), CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + e.w, w.hops + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.hops < {steps}),
dists AS (
  SELECT v AS cell, min(d) AS dist FROM walk WHERE v != {SUPER_SRC}
  GROUP BY v)"""


def cost_distance_oracle_sql() -> str:
    """Recursive CTE mirror: same augmented graph, same even step cap."""
    return f"{surface_ctes_sql()}\nSELECT cell, dist FROM dists"


# ---------------------------------------------------------------------------
# R87: cost allocation (nearest-seed assignment over the cost surface)
# ---------------------------------------------------------------------------

ALLOC_PACK = 16  # 4 bits of seed index under the cost — 3 seeds << 16


def cost_allocation(spark: SparkSession, tiles: DataFrame) -> DataFrame:
    """(cell, dist, seed): which hotspot seed reaches each occupied cell
    cheapest (GIS Cost Allocation / weighted Voronoi), with min-seed
    tie-break — via ONE packed-key SSSP run: every grid edge's weight is
    scaled ×16 and the virtual super-source reaches seed s at weight s,
    so every path cost is 16·(traversal cost) + seed and the plain
    Bellman-Ford min IS the lexicographic (cost, seed) minimum. Zero new
    loop machinery: the same weighted_sssp with the same even step cap,
    one integer unpack at the end."""
    cells = costed_cells(tiles).localCheckpoint(eager=False)
    a = cells.select("cx", "cy", F.col("cell").alias("src"))
    b = cells.select(
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
        F.col("cell").alias("dst"),
        (F.col("cost") * ALLOC_PACK).alias("w"),
    )
    edges = None
    for dx, dy in _OFFS:
        e = a.join(
            b, (a.cx + F.lit(dx) == b.bx) & (a.cy + F.lit(dy) == b.by)
        ).select("src", "dst", "w")
        edges = e if edges is None else edges.unionByName(e)
    seeds_df = None
    for i, s in enumerate(_seed_cells_sql()):
        row = spark.sql(s).withColumn("sidx", F.lit(i).cast("bigint"))
        seeds_df = row if seeds_df is None else seeds_df.unionByName(row)
    super_edges = seeds_df.join(cells, ["cx", "cy"]).select(
        F.lit(SUPER_SRC).cast("bigint").alias("src"),
        F.col("cell").alias("dst"),
        F.col("sidx").alias("w"),
    )
    key = weighted_sssp(
        spark, edges.unionByName(super_edges), src=SUPER_SRC,
        max_rounds=MAX_ROUNDS,
    )
    return key.where(F.col("v") != SUPER_SRC).select(
        F.col("v").alias("cell"),
        F.expr(f"dist DIV {ALLOC_PACK}").alias("dist"),
        F.expr(f"dist % {ALLOC_PACK}").alias("seed"),
    )


def cost_allocation_oracle_sql() -> str:
    """Recursive mirror of the packed-key run (splice after a CTE list
    providing ``tiles``; needs WITH RECURSIVE)."""
    steps = _even_steps(MAX_ROUNDS)
    seeds = " UNION ALL ".join(
        f"SELECT {i} AS sidx, * FROM ({s})" for i, s in enumerate(_seed_cells_sql())
    )
    shifted = " UNION ALL ".join(
        f"SELECT a.cell AS src, b.cell AS dst, b.cost * {ALLOC_PACK} AS w "
        f"FROM costed a JOIN costed b ON b.cx = a.cx + ({dx}) AND b.cy = a.cy + ({dy})"
        for dx, dy in _OFFS
    )
    return f"""cells AS (
  SELECT {_cx('lon')} AS cx, {_cy('lat')} AS cy, count(*) AS cnt
  FROM tiles GROUP BY 1, 2),
costed AS (
  SELECT cx, cy, cx * {_PACK} + cy AS cell, CAST({_COST} AS BIGINT) AS cost
  FROM cells),
seeds AS ({seeds}),
super_edges AS (
  SELECT CAST({SUPER_SRC} AS BIGINT) AS src, c.cell AS dst,
         CAST(s.sidx AS BIGINT) AS w
  FROM seeds s JOIN costed c ON c.cx = s.cx AND c.cy = s.cy),
edges AS ({shifted} UNION ALL SELECT src, dst, w FROM super_edges),
walk(v, d, hops) AS (
  SELECT CAST({SUPER_SRC} AS BIGINT), CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + e.w, w.hops + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.hops < {steps})
SELECT v AS cell, min(d) // {ALLOC_PACK} AS dist, min(d) % {ALLOC_PACK} AS seed
FROM walk WHERE v != {SUPER_SRC} GROUP BY v"""


# ---------------------------------------------------------------------------
# R93: line-of-sight / viewshed-lite over the density raster
# ---------------------------------------------------------------------------

LOS_OBSTACLE = 20   # cells with >= this many tiles block sight
LOS_TARGET = 5      # targets = cells with >= this many tiles


def line_of_sight(spark: SparkSession, tiles: DataFrame) -> DataFrame:
    """(seed, cell, n_steps, blocked): for every hotspot seed and every
    target cell (>= LOS_TARGET tiles), is the straight grid line between
    them clear of obstacle cells (>= LOS_OBSTACLE tiles)?

    The line is sampled at Chebyshev resolution (n = max(|dx|,|dy|)
    steps) with the all-positive affine form
    ``x_k = (sx·(n−k) + tx·k) DIV n`` — every operand is a positive
    bigint, so Spark DIV (truncate) and DuckDB // (floor) agree and no
    negative-division spelling hazard exists. Strictly-interior samples
    (0 < k < n) are obstacle-checked; seed and target never block
    themselves.

    Scale shape: the fan is (#seeds × #targets × ≤line length) rows of
    INTEGER arithmetic over the broadcast seed list — never the tile
    table — and the obstacle probe is one equi-join against the (tiny)
    obstacle-cell frame.
    """
    cnt = tiles.groupBy(
        F.expr(_cx("lon")).alias("cx"), F.expr(_cy("lat")).alias("cy")
    ).agg(F.count("*").alias("n"))
    targets = cnt.where(F.col("n") >= LOS_TARGET).select(
        F.col("cx").alias("tx"), F.col("cy").alias("ty")
    )
    obstacles = cnt.where(F.col("n") >= LOS_OBSTACLE).select(
        F.expr(f"cx * {_PACK} + cy").alias("ocell")
    )
    seeds_df = None
    for i, s in enumerate(_seed_cells_sql()):
        row = spark.sql(s).withColumn("seed", F.lit(i).cast("bigint"))
        seeds_df = row if seeds_df is None else seeds_df.unionByName(row)
    pairs = targets.crossJoin(F.broadcast(seeds_df)).select(
        "seed", "cx", "cy", "tx", "ty",
        F.greatest(
            F.abs(F.col("tx") - F.col("cx")), F.abs(F.col("ty") - F.col("cy"))
        ).alias("n_steps"),
    )
    interior = pairs.where(F.col("n_steps") >= 2).select(
        "seed", "tx", "ty", "n_steps",
        F.explode(F.expr("sequence(1, n_steps - 1)")).alias("k"),
        F.col("cx").alias("sx"), F.col("cy").alias("sy"),
    ).select(
        "seed", "tx", "ty", "n_steps",
        F.expr(
            f"((sx * (n_steps - k) + tx * k) DIV n_steps) * {_PACK}"
            " + ((sy * (n_steps - k) + ty * k) DIV n_steps)"
        ).alias("ocell"),
    )
    hits = (
        interior.join(F.broadcast(obstacles), "ocell")
        .groupBy("seed", "tx", "ty")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        pairs.join(hits, ["seed", "tx", "ty"], "left")
        .select(
            "seed",
            F.expr(f"tx * {_PACK} + ty").alias("cell"),
            "n_steps",
            F.coalesce(
                (F.col("n_hits") > 0).cast("bigint"), F.lit(0)
            ).alias("blocked"),
        )
    )


def line_of_sight_oracle_sql() -> str:
    return f"""los_cnt AS (
  SELECT {_cx('lon')} AS cx, {_cy('lat')} AS cy, count(*) AS n
  FROM tiles GROUP BY 1, 2),
los_targets AS (SELECT cx AS tx, cy AS ty FROM los_cnt WHERE n >= {LOS_TARGET}),
los_obst AS (SELECT cx * {_PACK} + cy AS ocell FROM los_cnt
             WHERE n >= {LOS_OBSTACLE}),
los_seeds AS ({" UNION ALL ".join(
    f"SELECT {i} AS seed, * FROM ({s})" for i, s in enumerate(_seed_cells_sql()))}),
los_pairs AS (
  SELECT s.seed, s.cx, s.cy, t.tx, t.ty,
         GREATEST(abs(t.tx - s.cx), abs(t.ty - s.cy)) AS n_steps
  FROM los_targets t CROSS JOIN los_seeds s),
los_interior AS (
  SELECT p.seed, p.tx, p.ty, p.n_steps,
         ((p.cx * (p.n_steps - g.k) + p.tx * g.k) // p.n_steps) * {_PACK}
         + ((p.cy * (p.n_steps - g.k) + p.ty * g.k) // p.n_steps) AS ocell
  FROM los_pairs p
  JOIN (SELECT unnest(range(1, 512)) AS k) g ON g.k < p.n_steps
  WHERE p.n_steps >= 2),
los_hits AS (
  SELECT i.seed, i.tx, i.ty, count(*) AS n_hits
  FROM los_interior i JOIN los_obst o ON o.ocell = i.ocell
  GROUP BY 1, 2, 3)
SELECT p.seed, p.tx * {_PACK} + p.ty AS cell, p.n_steps,
       CAST(COALESCE(h.n_hits > 0, FALSE) AS BIGINT) AS blocked
FROM los_pairs p
LEFT JOIN los_hits h ON h.seed = p.seed AND h.tx = p.tx AND h.ty = p.ty"""


# ---------------------------------------------------------------------------
# R122: least-cost path reconstruction — the corridor itself, not just
# the surface. After the Bellman-Ford surface converges, every non-seed
# cell gets ONE backlink: the minimum-id predecessor u with
# dist(u) + w(u→t) == dist(t) (min on both engines; real edges have
# w >= 1, so dist strictly decreases along backlinks — the chain can't
# cycle and must end at a seed). The traced path starts at the FARTHEST
# cell (max dist, min cell tie-break) and follows backlinks.
# Scale: the backlink raster is one (dist ⋈ edges ⋈ dist) equi-join +
# arg-min — no iteration, valid input for ANY corridor query; the single
# trace is a bounded pointer-chase (path length <= the relaxation step
# budget), two follows per materialization like bfs_khop. The oracle
# computes the same surface, the same backlinks, then follows the
# pointer chain with a recursive CTE that joins exactly one row per
# step (no aggregation inside the recursion — backlinks are a function).
# ---------------------------------------------------------------------------

TRACE_MAX_STEPS = _even_steps(MAX_ROUNDS)
LAST_TRACE_ROUNDS = 0  # materialized rounds of the last trace (plan pin)


def least_cost_path(spark: SparkSession, tiles: DataFrame) -> DataFrame:
    """(step, cell, dist): the least-cost corridor from the farthest cell
    (step 0) back to a seed, following min-id backlinks."""
    cells = costed_cells(tiles).localCheckpoint(eager=False)
    edges = _real_edges(cells)
    seeds_df = None
    for s in _seed_cells_sql():
        row = spark.sql(s)
        seeds_df = row if seeds_df is None else seeds_df.unionByName(row)
    super_edges = seeds_df.join(cells, ["cx", "cy"]).select(
        F.lit(SUPER_SRC).cast("bigint").alias("src"),
        F.col("cell").alias("dst"),
        F.lit(0).cast("bigint").alias("w"),
    )
    dist = (
        weighted_sssp(
            spark, edges.unionByName(super_edges), src=SUPER_SRC,
            max_rounds=MAX_ROUNDS,
        )
        .where(F.col("v") != SUPER_SRC)
        .select(F.col("v").alias("cell"), "dist")
        .localCheckpoint(eager=False)
    )
    du = dist.select(F.col("cell").alias("u"), F.col("dist").alias("du"))
    bl = (
        dist.join(edges, dist.cell == edges.dst)
        .join(du, (F.col("src") == F.col("u")))
        .where(F.col("du") + F.col("w") == F.col("dist"))
        .groupBy("cell")
        .agg(F.min("u").alias("pred"))
        .localCheckpoint(eager=False)
    )
    # Pointer-doubling trace (round-4 verdict "What's wrong" #1): the
    # backlink table is a FUNCTION (cell -> pred), so SQUARING it gives
    # 2^r-step jumps after r materializations — the corridor trace costs
    # O(log L) Spark rounds instead of the old O(L/2) pointer-chase,
    # and on a 100x-diameter raster the driver-side round count grows
    # logarithmically, not linearly.  jump(cell, dest, len): follow
    # min(k, remaining) backlinks; a partial jump (len < k) marks a
    # chain that ends (at a seed) within k steps and survives squaring
    # unchanged via the left join.  Invariant: before applying the
    # k-step jump the path holds steps {0..k-1} (clipped at the chain
    # end), and applying it to EVERY path row yields steps {k..2k-1}
    # (clipped, duplicates collapsing on the terminal step).
    start = (
        dist.orderBy(F.desc("dist"), "cell")
        .limit(1)
        .select("cell", F.lit(0).cast("bigint").alias("step"))
        .localCheckpoint(eager=False)
    )
    jump = bl.select(
        "cell",
        F.col("pred").alias("dest"),
        F.lit(1).cast("bigint").alias("len"),
    ).localCheckpoint(eager=False)
    path, n_rows, k, rounds = start, 1, 1, 0
    while k < TRACE_MAX_STEPS:
        rounds += 1
        nxt = path.join(jump, "cell").select(
            F.col("dest").alias("cell"),
            (F.col("step") + F.col("len")).alias("step"),
        )
        path = (
            path.unionByName(nxt)
            .dropDuplicates(["step"])
            .localCheckpoint(eager=True)
        )
        n = path.count()  # scalar convergence probe (CLAUDE.md rule)
        if n == n_rows:
            break  # no new steps: the chain end is already in the path
        n_rows = n
        # square the jump table: J_2k[c] = J_k ∘ J_k, keeping partial
        # jumps (ambiguous-self-join rule: rename keys per side FIRST)
        ja = jump.selectExpr("cell AS jcell", "dest AS jdest",
                             "len AS jlen")
        jb = jump.selectExpr("cell AS c2", "dest AS d2", "len AS l2")
        jump = (
            ja.join(jb, F.col("jdest") == F.col("c2"), "left")
            .select(
                F.col("jcell").alias("cell"),
                F.coalesce("d2", "jdest").alias("dest"),
                (F.col("jlen") + F.coalesce(F.col("l2"), F.lit(0)))
                .alias("len"),
            )
            # lazy: materializes inside the next path action — truncates
            # lineage without paying a separate driver round-trip
            .localCheckpoint(eager=False)
        )
        k *= 2
    global LAST_TRACE_ROUNDS
    LAST_TRACE_ROUNDS = rounds
    return (
        path.where(F.col("step") <= TRACE_MAX_STEPS)  # oracle's step cap
        .join(dist, "cell")
        .select("step", "cell", "dist")
        .dropDuplicates(["step"])
    )


def least_cost_path_oracle_sql() -> str:
    return f"""{surface_ctes_sql()},
lcp_bl AS (
  SELECT t.cell, min(u.cell) AS pred
  FROM dists t
  JOIN edges e ON e.dst = t.cell AND e.src != {SUPER_SRC}
  JOIN dists u ON u.cell = e.src AND u.dist + e.w = t.dist
  GROUP BY t.cell),
lcp_target AS (
  SELECT cell, 0 AS step FROM dists
  ORDER BY dist DESC, cell LIMIT 1),
lcp_trace(cell, step) AS (
  SELECT cell, step FROM lcp_target
  UNION ALL
  SELECT b.pred, t.step + 1
  FROM lcp_trace t JOIN lcp_bl b ON b.cell = t.cell
  WHERE t.step < {TRACE_MAX_STEPS})
SELECT CAST(t.step AS BIGINT) AS step, t.cell, d.dist
FROM lcp_trace t JOIN dists d ON d.cell = t.cell"""
