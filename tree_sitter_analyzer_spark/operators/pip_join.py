"""Two-phase point-in-polygon join: cell-equality candidates → exact verify.

This is the engine's core join, re-expressing the reference's edge
semi-joins (``hyphae/evaluator.py:227-272``): there, a cheap indexed probe
(FTS/edge index) generates candidates and an exact (name, file) match
verifies them; here, a grid-cell hash join generates candidates and the
exact geometry predicate verifies them (SURVEY.md J2/O4).

Scale design (100 TB / 10^12 tiles):
- The polygon side is small (thousands of zones → ~10^5-10^6 cover cells)
  and is **broadcast**, so the tile table — the trillion-row side — is
  never shuffled: the join is map-side, one pass over the scan.
- Each tile carries exactly ONE res-R cell, so a (tile, zone) pair can
  match on at most one cell — no post-join dedup shuffle is needed for
  rectangles/convex covers (duplicate matches are impossible by
  construction).
- Hot cells (the synthetic hotspots) only skew *matches per task*, not a
  shuffle, because the build side is broadcast. If the polygon side ever
  grows beyond broadcast size, fall back to a shuffled join on ``cell``
  with AQE skew-join enabled (session.py) + salting (see skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import grid

DEFAULT_RES = 9

# The exact geometry predicate — half-open [min, max) so boundary points
# belong to exactly one side; authored once, same text as the oracle SQL.
PIP_PREDICATE = (
    "lon >= xmin AND lon < xmax AND lat >= ymin AND lat < ymax"
)


def tile_cells(tiles: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Attach the single res-R cell id of each tile centroid.

    Pure int64 arithmetic → whole-stage codegen, no UDF
    (the vectorized-extraction requirement of input_hint).
    """
    return tiles.withColumn("cell", grid.cell_col("lon", "lat", res))


def zone_cover(zones: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Explode each rectangle zone into its covering res-R cell set.

    ``sequence() + explode`` keeps the fan-out JVM-side (SURVEY.md X5).
    For a rectangle the inclusive ix/iy index range is an exact cover:
    every point with lon∈[xmin,xmax) lands in one of these cells.
    """
    ix_min = grid.ix_col("xmin", res)
    ix_max = grid.ix_col("xmax", res)
    iy_min = grid.iy_col("ymin", res)
    iy_max = grid.iy_col("ymax", res)
    return (
        zones.withColumn("ix", F.explode(F.sequence(ix_min, ix_max)))
        .withColumn("iy", F.explode(F.sequence(iy_min, iy_max)))
        .withColumn("cell", F.expr(grid.cell_from_ixiy_sql("ix", "iy", res)))
        .drop("ix", "iy")
    )


def pip_join(
    tiles: DataFrame,
    zones: DataFrame,
    res: int = DEFAULT_RES,
    how: str = "inner",
) -> DataFrame:
    """Point-in-polygon join of tiles against zones.

    how='inner'  → (tile, zone) match rows (the reference's edge rows).
    how='semi'   → tiles inside ≥1 zone        (J2 semi-join).
    how='anti'   → tiles inside no zone        (J3 anti-join, dead-code analog).
    """
    t = tile_cells(tiles, res)
    zc = F.broadcast(zone_cover(zones, res))
    if how == "inner":
        joined = t.join(zc, "cell").where(F.expr(PIP_PREDICATE))
        return joined
    # semi/anti need the *verified* pair set; build it once, then key-join.
    matched = (
        t.join(zc, "cell")
        .where(F.expr(PIP_PREDICATE))
        .select("image_id")
        .dropDuplicates(["image_id"])
    )
    if how == "semi":
        return tiles.join(matched, "image_id", "left_semi")
    if how == "anti":
        return tiles.join(matched, "image_id", "left_anti")
    raise ValueError(f"how must be inner|semi|anti, got {how!r}")


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (the exact same predicate, no cell phase — the
# oracle is allowed to be naive; it only has to be correct at sf0.01).
# ---------------------------------------------------------------------------

def pip_oracle_join_sql() -> str:
    return (
        "tiles t JOIN zones z ON t.lon >= z.xmin AND t.lon < z.xmax "
        "AND t.lat >= z.ymin AND t.lat < z.ymax"
    )


def poly_cover(poly_zones: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Covering cell set of a convex polygon via its bounding box —
    LEAST/GREATEST over the vertex columns (superset cover; the exact
    half-plane verify removes bbox-only candidates). A tighter cover
    (edge-walk rasterization) drops in here without touching callers."""
    from .. import synth

    k = len([c for c in poly_zones.columns if c.startswith("x")])
    xs = ", ".join(f"x{m}" for m in range(k))
    ys = ", ".join(f"y{m}" for m in range(k))
    z = (
        poly_zones.withColumn("_xmin", F.expr(f"LEAST({xs})"))
        .withColumn("_xmax", F.expr(f"GREATEST({xs})"))
        .withColumn("_ymin", F.expr(f"LEAST({ys})"))
        .withColumn("_ymax", F.expr(f"GREATEST({ys})"))
    )
    ix_min = grid.ix_col("_xmin", res)
    ix_max = grid.ix_col("_xmax", res)
    iy_min = grid.iy_col("_ymin", res)
    iy_max = grid.iy_col("_ymax", res)
    return (
        z.withColumn("ix", F.explode(F.sequence(ix_min, ix_max)))
        .withColumn("iy", F.explode(F.sequence(iy_min, iy_max)))
        .withColumn("cell", F.expr(grid.cell_from_ixiy_sql("ix", "iy", res)))
        .drop("ix", "iy", "_xmin", "_xmax", "_ymin", "_ymax")
    )


def pip_convex_join(
    tiles: DataFrame, poly_zones: DataFrame, res: int = DEFAULT_RES
) -> DataFrame:
    """Two-phase PIP against TRUE convex polygons: bbox-cell candidates →
    exact half-plane verification (cross-product signs, pure arithmetic —
    still no UDF, still DuckDB-checkable)."""
    from .. import synth

    t = tile_cells(tiles, res)
    zc = F.broadcast(poly_cover(poly_zones, res))
    return t.join(zc, "cell").where(
        F.expr(synth.convex_pip_predicate("lon", "lat"))
    )
