"""Map-matching: snap GPS pings to a road-segment network (R60).

The classic movement-data operator a geospatial engine at fleet scale
needs: each position fix snaps to the nearest road segment within a
radius, and per-segment load (pings, users, mean snap distance) is the
output — the "which symbol does this span belong to" containment
resolution of the reference (hyphae containment combinators,
evaluator.py:361-373), re-expressed as point→polyline assignment.

Exactness discipline (CLAUDE.md): the pings live on the res-12 integer
grid and the synthetic segments have integer endpoints, so the
point-to-segment squared distance is the RATIONAL ``num/len2`` with
``num = cross²`` (interior projection) or ``endpoint²·len2`` (clamped) —
all bigint. The radius test ``num ≤ rho²·len2`` and the argmin key
``(num·1000 DIV len2)·1024 + seg_id`` (unique — ties broken by segment
id) never touch a float, so Spark and DuckDB agree bit-for-bit.

Scale shape: the segment network is a dimension (≤ dozens of rows here,
≤ millions at 100 TB — still the small side). Segments fan over their
bbox buckets + 1 ring (bucket B=256 units ≥ rho ⇒ the fan is provably
LOSSLESS for the radius: any point within Chebyshev-rho of the segment
lies in a fanned bucket); pings compute ONE bucket each and broadcast-
equi-join the fanned frame — the trillion-ping side never shuffles for
candidate generation. The per-ping argmin is a min() partial-aggregated
groupBy: all of a ping's candidates are produced in the same task by the
broadcast join, so the exchange carries ≈1 row per matched ping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth import lcg

N_SEGS = 40
RHO = 60            # snap radius, res-12 grid units (~0.0146°/unit⁻¹ grid)
BUCKET = 256        # ≥ RHO ⇒ 1-ring fan is lossless
_PACK = 268_435_456  # bucket pack base (same collision-free pack as pings)

# segment endpoints: anchored at the ping start bases (trajectory._SX/_SY
# geography) so the network overlaps where fixes actually are; dx ≥ 400
# so len2 > 0 by construction.
_SEG_EXPRS = {
    "seg_id": "s",
    "ax": f"(1308000 + (s % 8) * 280 + {lcg('s + 23', 48271)} % 700)",
    "ay": f"(513400 + (s % 8) * 230 + {lcg('s + 23', 16807)} % 600)",
    "abx": f"(400 + {lcg('s + 57', 69621)} % 500)",
    "aby": f"({lcg('s + 57', 40692)} % 1201 - 600)",
}


def _seg_select_sql() -> str:
    cols = ",\n         ".join(f"{e} AS {n}" for n, e in _SEG_EXPRS.items())
    return cols


def segments_df(spark) -> DataFrame:
    return spark.range(N_SEGS).selectExpr("id AS s").selectExpr(
        *[f"{e} AS {n}" for n, e in _SEG_EXPRS.items()]
    )


# rational squared distance: num / len2, all-bigint
_NUM_SQL = """
CASE WHEN (apx * abx + apy * aby) <= 0
       THEN (apx * apx + apy * apy) * len2
     WHEN (apx * abx + apy * aby) >= len2
       THEN ((apx - abx) * (apx - abx) + (apy - aby) * (apy - aby)) * len2
     ELSE (apx * aby - apy * abx) * (apx * aby - apy * abx)
END"""


def map_match(pings: DataFrame) -> DataFrame:
    """Per-segment road load: pings snapped to their nearest segment
    within ``RHO`` (exact rational distances, segment-id tie-break).

    Returns (seg_id, n_pings, n_users, avg_d2_milli) — avg_d2_milli is
    the mean scaled squared snap distance (milli grid-units²), the
    snap-quality metric.
    """
    segs = segments_df(pings.sparkSession).selectExpr(
        "seg_id", "ax", "ay", "abx", "aby",
        "abx * abx + aby * aby AS len2",
        f"least(ax, ax + abx) DIV {BUCKET} AS bx0",
        f"greatest(ax, ax + abx) DIV {BUCKET} AS bx1",
        f"least(ay, ay + aby) DIV {BUCKET} AS by0",
        f"greatest(ay, ay + aby) DIV {BUCKET} AS by1",
    )
    fanned = segs.select(
        "seg_id", "ax", "ay", "abx", "aby", "len2",
        F.explode(F.expr("sequence(bx0 - 1, bx1 + 1)")).alias("bx"),
        F.expr("sequence(by0 - 1, by1 + 1)").alias("bys"),
    ).select(
        "seg_id", "ax", "ay", "abx", "aby", "len2", "bx",
        F.explode("bys").alias("by"),
    ).selectExpr("seg_id", "ax", "ay", "abx", "aby", "len2",
                 f"bx * {_PACK} + by AS bucket")
    cand = (
        pings.selectExpr(
            "user_id", "event_id", "ix", "iy",
            f"(ix DIV {BUCKET}) * {_PACK} + (iy DIV {BUCKET}) AS bucket",
        )
        .join(F.broadcast(fanned), "bucket")
        .selectExpr(
            "user_id", "event_id", "seg_id", "len2",
            "ix - ax AS apx", "iy - ay AS apy", "abx", "aby",
        )
        .selectExpr(
            "user_id", "event_id", "seg_id", "len2",
            f"({_NUM_SQL}) AS num",
        )
        .where(f"num <= {RHO * RHO} * len2")
        .selectExpr(
            "user_id", "event_id", "seg_id",
            "(num * 1000 DIV len2) AS d2_milli",
        )
    )
    best = (
        cand.selectExpr(
            "user_id", "event_id",
            "d2_milli * 1024 + seg_id AS snap_key",
        )
        .groupBy("user_id", "event_id")
        .agg(F.min("snap_key").alias("snap_key"))
        .selectExpr(
            "user_id",
            "snap_key % 1024 AS seg_id",
            "snap_key DIV 1024 AS d2_milli",
        )
    )
    return (
        best.groupBy("seg_id")
        .agg(
            F.count("*").alias("n_pings"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr("sum(d2_milli) DIV count(*)").alias("avg_d2_milli"),
        )
        .selectExpr(
            "CAST(seg_id AS BIGINT) AS seg_id",
            "n_pings",
            "n_users",
            "avg_d2_milli",
        )
    )


def map_match_oracle_sql(pings_cte: str) -> str:
    """DuckDB replica over the same pings CTE. The oracle skips the
    bucket fan (proven lossless) and joins all segments naively — the
    candidate sets within the radius are identical by construction."""
    return f"""{pings_cte},
mm_segs AS (
  SELECT {_seg_select_sql()}
  FROM range({N_SEGS}) AS t(s)
),
mm_cand AS (
  SELECT p.user_id, p.event_id, s.seg_id,
         s.abx * s.abx + s.aby * s.aby AS len2,
         p.ix - s.ax AS apx, p.iy - s.ay AS apy, s.abx, s.aby
  FROM pings p CROSS JOIN mm_segs s
),
mm_num AS (
  SELECT user_id, event_id, seg_id, len2, ({_NUM_SQL}) AS num
  FROM mm_cand
),
mm_best AS (
  SELECT user_id, event_id,
         min((num * 1000 // len2) * 1024 + seg_id) AS snap_key
  FROM mm_num
  WHERE num <= {RHO * RHO} * len2
  GROUP BY 1, 2
)
SELECT CAST(snap_key % 1024 AS BIGINT) AS seg_id,
       count(*) AS n_pings,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(snap_key // 1024) // count(*) AS BIGINT) AS avg_d2_milli
FROM mm_best
GROUP BY 1"""
