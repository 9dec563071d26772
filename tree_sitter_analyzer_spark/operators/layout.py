"""Z-order (Morton) spatial data layout — the 100 TB table-layout operator.

The north rule demands explicit ``repartitionByRange`` thinking: at 10^12
rows the dominant cost of every spatial query is how the Iceberg table is
LAID OUT, not how the join runs. The standard cure is Z-order clustering
(what Delta ``OPTIMIZE ZORDER BY`` / Iceberg ``sort_order`` do): sort by
an interleaved-bit key so each file covers a compact spatial patch and
cell-range scans prune to a handful of files. The reference's analog is
its packed symbol ordering inside the SQLite index (``_ast_cache_schema
.py:425-434`` — rows clustered by file then position so range lookups
touch contiguous pages).

The Morton key is authored as PORTABLE SQL (pure floor/mod/multiply
arithmetic — no engine bit intrinsics, whose shift/xor spellings differ;
``functions/__init__.py``), so Spark evaluates it in whole-stage codegen
and DuckDB replays it verbatim for the oracle.

Two surfaces:

- ``zorder_layout_audit`` (oracled query): assign every tile its Morton
  key, range-bucket with ``ntile`` (the deterministic stand-in for
  ``repartitionByRange`` boundaries), and report per-bucket locality —
  tile count, distinct cells, and the integer bounding box. A Z-ordered
  bucket's bbox is a compact square-ish patch; an id-ordered bucket
  sprawls across the whole extent. The audit returns both layouts'
  bbox areas so the locality win is a recorded number, not a claim.
- ``write_zordered`` (API): the real layout path —
  ``repartitionByRange(n, morton).sortWithinPartitions(morton)`` +
  parquet, producing files with disjoint, compact key ranges (asserted
  in tests via per-file min/max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import grid

LAYOUT_RES = 9  # ix < 2^18, iy < 2^17 at res 9 -> 35-bit Morton key


def _bit(x: str, k: int) -> str:
    """Bit k of a non-negative integer — portable floor/mod arithmetic."""
    return f"(CAST(floor(({x}) / {1 << k}) AS BIGINT) % 2)"


def morton_sql(lon: str, lat: str, res: int = LAYOUT_RES) -> str:
    """Interleaved-bit (Z-order) key of the res-``res`` grid cell, as
    portable SQL: key = Σ_k bit_k(ix)·4^k·2 + bit_k(iy)·4^k  (ix in the
    odd positions, iy in the even ones). 18 ix bits + 17 iy bits at
    res 9 → key < 2^36, exact in bigint on both engines."""
    ix = grid.ix_sql(lon, res)
    iy = grid.iy_sql(lat, res)
    terms = []
    for k in range(18):
        terms.append(f"{_bit(ix, k)} * {1 << (2 * k + 1)}")
        if k < 17:
            terms.append(f"{_bit(iy, k)} * {1 << (2 * k)}")
    return "(" + " + ".join(terms) + ")"


def morton_col(lon: str = "lon", lat: str = "lat", res: int = LAYOUT_RES):
    return F.expr(morton_sql(lon, lat, res))


def zorder_layout_audit(
    tiles: DataFrame, n_buckets: int = 32, res: int = LAYOUT_RES
) -> DataFrame:
    """Per-bucket locality audit of the Z-order layout vs the naive
    key-ordered layout, one row per (layout, bucket):

    (layout, bucket, n_tiles, n_cells, bbox_area) with bbox_area =
    (max ix − min ix + 1)·(max iy − min iy + 1) in res-``res`` cells —
    integer-exact. ``ntile`` over (key, i) is the deterministic proxy
    for ``repartitionByRange`` boundaries (same equal-frequency cut)."""
    base = tiles.select(
        "i",
        grid.ix_col("lon", res).alias("ix"),
        grid.iy_col("lat", res).alias("iy"),
        morton_col("lon", "lat", res).alias("zkey"),
    )
    out = []
    for layout, order in (("zorder", ["zkey", "i"]), ("by_id", ["i"])):
        # Global-order ntile: a one-partition window, fine for an AUDIT
        # (64 output rows); the production layout path is
        # ``write_zordered``'s sampled repartitionByRange, not this.
        w = F.ntile(n_buckets).over(Window.orderBy(*[F.col(c) for c in order]))
        out.append(
            base.withColumn("bucket", w.cast("bigint"))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_tiles"),
                F.countDistinct(
                    (F.col("ix") * F.lit(grid.IX_MUL) + F.col("iy"))
                ).alias("n_cells"),
                (
                    (F.max("ix") - F.min("ix") + 1)
                    * (F.max("iy") - F.min("iy") + 1)
                ).alias("bbox_area"),
            )
            .withColumn("layout", F.lit(layout))
        )
    return out[0].unionByName(out[1]).select(
        "layout", "bucket", "n_tiles", "n_cells", "bbox_area"
    )


def zorder_audit_oracle_sql(n_buckets: int = 32, res: int = LAYOUT_RES) -> str:
    """Identical arithmetic in DuckDB (requires the spliced tiles CTE)."""
    z = morton_sql("lon", "lat", res)
    ix = grid.ix_sql("lon", res)
    iy = grid.iy_sql("lat", res)
    return f"""
keyed AS (
  SELECT i, {ix} AS ix, {iy} AS iy, {z} AS zkey FROM tiles
),
zb AS (SELECT *, ntile({n_buckets}) OVER (ORDER BY zkey, i) AS bucket
       FROM keyed),
ib AS (SELECT *, ntile({n_buckets}) OVER (ORDER BY i) AS bucket FROM keyed),
agg AS (
  SELECT 'zorder' AS layout, CAST(bucket AS BIGINT) AS bucket,
         count(*) AS n_tiles,
         count(DISTINCT ix * {grid.IX_MUL} + iy) AS n_cells,
         (max(ix) - min(ix) + 1) * (max(iy) - min(iy) + 1) AS bbox_area
  FROM zb GROUP BY 2
  UNION ALL
  SELECT 'by_id', CAST(bucket AS BIGINT), count(*),
         count(DISTINCT ix * {grid.IX_MUL} + iy),
         (max(ix) - min(ix) + 1) * (max(iy) - min(iy) + 1)
  FROM ib GROUP BY 2
)
SELECT layout, bucket, n_tiles, n_cells, bbox_area FROM agg
"""


def write_zordered(
    df: DataFrame, path: str, n_files: int, res: int = LAYOUT_RES
) -> None:
    """The actual 100 TB layout pass: range-partition on the Morton key
    (sampled range boundaries — Spark's scalable sort machinery, no
    global sort on the driver), sort within each partition, one parquet
    file per range. Downstream cell-range scans then prune by the
    parquet min/max statistics of the key column."""
    (
        df.withColumn("zkey", morton_col("lon", "lat", res))
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
