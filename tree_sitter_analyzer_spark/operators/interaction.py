"""Spatial-interaction models: Huff gravity allocation.

The Huff model (Huff 1964) is the classic retail/catchment spatial
interaction operator: each demand point (tile) splits its one unit of
visit probability across nearby attraction zones proportionally to
``attractiveness / distance²``; per-zone expected visits are the sums of
those shares. It re-expresses the reference's enriched-fallback facet
shape — every candidate gets a *confidence-weighted* assignment instead
of a single winner (`_ast_cache_query.py:448-493` carries confidence
columns the same way).

Cross-engine integer discipline (CLAUDE.md): attractiveness = nano-scaled
zone area (floor of a fixed-order double product), distance enters as
nano-scaled floor, weights and shares are bigint DIV quotients — so
per-zone sums are aggregation-order-proof and hash-comparable.

Scale shape (the 100 TB story): zones are a ~200-row dimension. The
whole per-tile model — candidate filter (Chebyshev radius), weights,
the per-tile denominator, and milli-shares — runs INSIDE one projection
over a broadcast zone ARRAY via higher-order functions (filter /
transform / aggregate), so the tile side never shuffles and never fans
out before the final ≤#zones-key aggregate. The per-tile window/groupBy
a relational spelling would need (one exchange over every tile id) is
folded away entirely; the only exchange in the plan carries ~200 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RADIUS_DEG = "0.15e0"  # Chebyshev candidate radius, degrees


def _aw_sql(xmin: str, xmax: str, ymin: str, ymax: str) -> str:
    # nano-scaled rectangle area; fixed-order double product → identical
    # bits cross-engine, floor → bigint
    return (
        f"CAST(floor((({xmax}) - ({xmin})) * (({ymax}) - ({ymin})) * 1e9) "
        f"AS BIGINT)"
    )


def _w_sql(lon: str, lat: str, cx: str, cy: str, aw: str) -> str:
    # nano-scaled squared distance: fixed-order double sum, one floor
    d2n = (
        f"CAST(floor(((({lon}) - ({cx})) * (({lon}) - ({cx})) + "
        f"(({lat}) - ({cy})) * (({lat}) - ({cy}))) * 1e9) AS BIGINT)"
    )
    return f"(({aw}) * 1000 DIV (1 + {d2n}))"


def huff_shares(tiles: DataFrame, zones: DataFrame) -> DataFrame:
    """Per-zone expected visits under the Huff gravity model.

    Each tile allocates 1000 milli-visits across the zones whose center
    is within ``RADIUS_DEG`` (Chebyshev), weighted by
    ``area_nano·1000 DIV (1 + dist²_nano)`` — power-2 distance decay,
    area as attractiveness. Tiles with no zone in radius allocate
    nothing (they fall outside every catchment).

    Returns (polygon_id, zkind, n_tiles, visits_milli) — visits_milli /
    1000 ≈ expected visitor count; Σ visits_milli ≤ 1000 · Σ tiles
    (integer shares round down; the deficit is the DIV dust).
    """
    hz = zones.selectExpr(
        "j",
        "polygon_id",
        "zkind",
        "(xmin + xmax) / 2 AS cx",
        "(ymin + ymax) / 2 AS cy",
        f"{_aw_sql('xmin', 'xmax', 'ymin', 'ymax')} AS aw",
    )
    zarr = hz.agg(
        F.collect_list(F.struct("j", "cx", "cy", "aw")).alias("zs")
    )
    w_lambda = _w_sql("lon", "lat", "z.cx", "z.cy", "z.aw")
    shares = (
        tiles.select("i", "lon", "lat")
        .crossJoin(F.broadcast(zarr))
        .select(
            "i",
            F.expr(
                f"""transform(
                      filter(zs, z -> abs(lon - z.cx) <= {RADIUS_DEG}
                                  AND abs(lat - z.cy) <= {RADIUS_DEG}),
                      z -> struct(z.j AS j, {w_lambda} AS w))"""
            ).alias("ws"),
        )
        .select(
            "i",
            F.expr("aggregate(ws, 0L, (acc, x) -> acc + x.w)").alias("sumw"),
            F.explode("ws").alias("zw"),
        )
        .select(
            "i",
            F.col("zw.j").alias("j"),
            F.expr("(1000 * zw.w) DIV sumw").alias("share_milli"),
        )
    )
    return (
        shares.groupBy("j")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum("share_milli").cast("bigint").alias("visits_milli"),
        )
        .join(F.broadcast(hz.select("j", "polygon_id", "zkind")), "j")
        .select("polygon_id", "zkind", "n_tiles", "visits_milli")
    )


def huff_shares_oracle_sql() -> str:
    aw = _aw_sql("xmin", "xmax", "ymin", "ymax")
    w = _w_sql("t.lon", "t.lat", "z.cx", "z.cy", "z.aw")
    return f"""
hz AS (
  SELECT j, polygon_id, zkind,
         (xmin + xmax) / 2 AS cx, (ymin + ymax) / 2 AS cy,
         {aw} AS aw
  FROM zones
),
hp AS (
  SELECT t.i, z.j, {w.replace(' DIV ', ' // ')} AS w
  FROM tiles t JOIN hz z
    ON abs(t.lon - z.cx) <= {RADIUS_DEG}
   AND abs(t.lat - z.cy) <= {RADIUS_DEG}
),
hs AS (
  SELECT i, j, w, sum(w) OVER (PARTITION BY i) AS sumw FROM hp
)
SELECT z.polygon_id, z.zkind, count(*) AS n_tiles,
       CAST(sum((1000 * w) // sumw) AS BIGINT) AS visits_milli
FROM hs JOIN hz z USING (j)
GROUP BY 1, 2"""
