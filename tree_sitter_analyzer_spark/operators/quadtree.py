"""Adaptive quadtree tiling (SURVEY §2.12 R72): the variable-resolution
partition of space a trillion-tile serving layer actually stores.

The fixed-resolution rollups (tile_manifest, pyramid_rollup) spend the
same cell budget on empty ocean and on a hotspot; an adaptive quadtree
splits exactly where the data is dense. The reference's analog is its
scope-adaptive result folding (deep packages summarize, hot files expand
— ``_codegraph_query_facets.py`` depth folding); spatially this is the
quadkey / variable-H3 compaction every tile server uses.

Semantics (exact, closed-form — no iterative splitting): with counts
``n_r(c)`` at resolutions RMIN..RMAX over the SAME tile set, the leaf
covering a res-RMAX cell is its ancestor at

    leaf_res = min { r : n_r(ancestor_r) <= T },  else RMAX.

Because counts are nested (``n_r(parent) >= n_{r+1}(child)``), every
ancestor strictly above the leaf has count > T (it split), and every
leaf either meets the threshold or sits at the max depth — precisely the
recursive quadtree, derived in one pass instead of a loop.

Scale shape: tiles aggregate ONCE at RMAX (the only exchange that sees
tile rows); coarser counts are rollups OVER THE CELL FRAME (≤ #occupied
cells rows each), and the ancestor joins broadcast those small frames.
The oracle replays the identical closed form in CTEs, so parity also
proves the nesting argument (a wrong leaf would double- or zero-count a
res-RMAX cell and break the partition checksum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import grid

RMIN = 5
RMAX = 9
QT_THRESHOLD = 32


def _leaf_case(t: int) -> str:
    """leaf_res CASE over joined ancestor counts n5..n8 (NULL-safe: an
    unoccupied ancestor is impossible — every res-9 cell has occupied
    ancestors by construction)."""
    whens = " ".join(
        f"WHEN n{r} <= {t} THEN {r}" for r in range(RMIN, RMAX)
    )
    return f"(CASE {whens} ELSE {RMAX} END)"


def _leaf_cell(res_col: str, x: str, y: str) -> str:
    """Packed leaf cell id from the res-RMAX (x, y) and the leaf res."""
    whens = " ".join(
        f"WHEN {r} THEN {r * grid.RES_MUL} + ({x} DIV {1 << (RMAX - r)})"
        f" * {grid.IX_MUL} + ({y} DIV {1 << (RMAX - r)})"
        for r in range(RMIN, RMAX)
    )
    return (
        f"(CASE {res_col} {whens} ELSE {RMAX * grid.RES_MUL}"
        f" + ({x}) * {grid.IX_MUL} + ({y}) END)"
    )


def quadtree_leaves(tiles: DataFrame, threshold: int = QT_THRESHOLD) -> DataFrame:
    """(res, cell, n_tiles) quadtree leaves: a disjoint, complete cover
    of every tile — split while a cell holds more than ``threshold``
    tiles, down to res RMAX."""
    c9 = tiles.groupBy(
        F.expr(grid.ix_sql("lon", RMAX)).alias("x"),
        F.expr(grid.iy_sql("lat", RMAX)).alias("y"),
    ).agg(F.count("*").alias("n"))
    joined = c9
    for r in range(RMIN, RMAX):
        s = 1 << (RMAX - r)
        cr = (
            c9.groupBy(
                (F.col("x") / s).cast("bigint").alias(f"px{r}"),
                (F.col("y") / s).cast("bigint").alias(f"py{r}"),
            )
            .agg(F.sum("n").alias(f"n{r}"))
        )
        joined = joined.join(
            F.broadcast(cr),
            (F.expr(f"x DIV {s}") == F.col(f"px{r}"))
            & (F.expr(f"y DIV {s}") == F.col(f"py{r}")),
        ).drop(f"px{r}", f"py{r}")
    leaves = joined.select(
        F.expr(_leaf_case(threshold)).cast("int").alias("res"),
        "x",
        "y",
        "n",
    ).select(
        "res", F.expr(_leaf_cell("res", "x", "y")).alias("cell"), "n"
    )
    return leaves.groupBy("res", "cell").agg(F.sum("n").alias("n_tiles"))


def quadtree_oracle_sql(threshold: int = QT_THRESHOLD) -> str:
    """Closed-form CTE mirror (splice after a CTE list providing tiles).

    x DIV s on non-negative x is DuckDB ``//`` exactly; counts and cell
    ids are all-bigint, so both engines agree bit-for-bit.
    """
    rollups = ",\n".join(
        f"qt{r} AS (SELECT x // {1 << (RMAX - r)} AS x, y // {1 << (RMAX - r)} AS y,"
        f" SUM(n) AS n{r} FROM qt9 GROUP BY 1, 2)"
        for r in range(RMIN, RMAX)
    )
    joins = "\n".join(
        f"  JOIN qt{r} ON qt{r}.x = qt9.x // {1 << (RMAX - r)}"
        f" AND qt{r}.y = qt9.y // {1 << (RMAX - r)}"
        for r in range(RMIN, RMAX)
    )
    leaf_case = _leaf_case(threshold).replace(" DIV ", " // ")
    leaf_cell = _leaf_cell("res", "qleaf.x", "qleaf.y").replace(
        " DIV ", " // "
    )
    return f"""
qt9 AS (
  SELECT {grid.ix_sql('lon', RMAX)} AS x, {grid.iy_sql('lat', RMAX)} AS y,
         count(*) AS n
  FROM tiles GROUP BY 1, 2),
{rollups},
qleaf AS (
  SELECT CAST({leaf_case} AS INTEGER) AS res, qt9.x, qt9.y, qt9.n
  FROM qt9
{joins})
SELECT res, {leaf_cell} AS cell, SUM(n) AS n_tiles
FROM qleaf GROUP BY 1, 2"""
