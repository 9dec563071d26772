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


def morton_xy_sql(ix: str, iy: str) -> str:
    """Interleaved-bit (Z-order) key over integer cell coordinates:
    key = Σ_k bit_k(ix)·4^k·2 + bit_k(iy)·4^k (ix odd positions, iy
    even). 18 ix bits + 17 iy bits → key < 2^36, exact in bigint on
    both engines."""
    terms = []
    for k in range(18):
        terms.append(f"{_bit(ix, k)} * {1 << (2 * k + 1)}")
        if k < 17:
            terms.append(f"{_bit(iy, k)} * {1 << (2 * k)}")
    return "(" + " + ".join(terms) + ")"


def py_morton(ix: int, iy: int) -> int:
    """Pure-python mirror of morton_xy_sql for test references."""
    key = 0
    for k in range(18):
        key += ((ix >> k) & 1) << (2 * k + 1)
        if k < 17:
            key += ((iy >> k) & 1) << (2 * k)
    return key


def morton_sql(lon: str, lat: str, res: int = LAYOUT_RES) -> str:
    """Z-order key of the res-``res`` grid cell of (lon, lat)."""
    return morton_xy_sql(grid.ix_sql(lon, res), grid.iy_sql(lat, res))


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


# ---------------------------------------------------------------------------
# R81: Hilbert-curve layout (the better space-filling curve, as an audit)
# ---------------------------------------------------------------------------
#
# Z-order has long diagonal jumps at power-of-two boundaries; the Hilbert
# curve never jumps (every consecutive key step is a unit grid move), so
# equal-frequency buckets cover visibly tighter patches. Hilbert is NOT
# bit-separable like Morton — the key comes from the classic 18-step
# rotate/flip state machine (Hilbert 1891 via the xy2d form) — but it
# only needs to run over the DISTINCT CELL frame (≤ #occupied cells
# rows), after which the key broadcasts back onto the tile stream. All
# arithmetic is CASE/DIV/mod on bigints: no XOR (engine spellings
# differ), no floats; the identical step text runs as 18 Spark
# projections (with lineage barriers so Catalyst cannot collapse the
# chain into an exponential expression — the winnow lesson) and as 18
# chained DuckDB CTEs.

HIL_K = 18  # ix < 2^18 at res 9 — the curve's square side


def hilbert_step_sqls(s: int, x: str = "x", y: str = "y", d: str = "d"):
    """(nx, ny, nd) portable-SQL texts for one xy2d step at scale ``s``.

    rx/ry are the s-bit of x/y; the quadrant digit (3·rx) XOR ry is
    spelled CASE (values: rx=0 → ry, rx=1 → 3−ry); x/y then REDUCE into
    the quadrant (x % s) BEFORE the rotate — intermediates stay in
    [0, s), which matters cross-engine: DuckDB % keeps the sign while
    Python/Spark pmod doesn't, so a variant with negative intermediates
    silently diverges (bijection+adjacency property tests pin this
    one)."""
    rx = f"(({x}) DIV {s} % 2)"
    ry = f"(({y}) DIV {s} % 2)"
    mx = f"(({x}) % {s})"
    my = f"(({y}) % {s})"
    nd = f"(({d}) + {s * s} * (CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END))"
    nx = f"(CASE WHEN {ry} = 1 THEN {mx} WHEN {rx} = 1 THEN {s} - 1 - {my} ELSE {my} END)"
    ny = f"(CASE WHEN {ry} = 1 THEN {my} WHEN {rx} = 1 THEN {s} - 1 - {mx} ELSE {mx} END)"
    return nx, ny, nd


def py_hilbert(ix: int, iy: int, k: int = HIL_K) -> int:
    """Pure-python mirror of the SAME step arithmetic (property tests)."""
    x, y, d = ix, iy, 0
    for lev in range(k - 1, -1, -1):
        s = 1 << lev
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * (ry if rx == 0 else 3 - ry)
        x, y = x % s, y % s  # reduce into the quadrant (stays >= 0)
        if ry == 1:
            pass
        elif rx == 1:
            x, y = s - 1 - y, s - 1 - x
        else:
            x, y = y, x
    return d


def hilbert_cells(cells: DataFrame, k: int = HIL_K) -> DataFrame:
    """(ix, iy, hkey) for a distinct-cell frame — 18 projections with a
    lineage barrier every 4 steps (bounded expression depth; the frame
    is ≤ #occupied cells, so the barriers are O(cells) cheap)."""
    df = cells.select("ix", "iy", F.col("ix").alias("x"),
                      F.col("iy").alias("y"), F.lit(0).cast("bigint").alias("d"))
    for i, lev in enumerate(range(k - 1, -1, -1)):
        nx, ny, nd = hilbert_step_sqls(1 << lev)
        df = df.select(
            "ix", "iy",
            F.expr(nx).cast("bigint").alias("x"),
            F.expr(ny).cast("bigint").alias("y"),
            F.expr(nd).cast("bigint").alias("d"),
        )
        if i % 4 == 3:
            df = df.localCheckpoint(eager=False)
    return df.select("ix", "iy", F.col("d").alias("hkey"))


def hilbert_oracle_cte(k: int = HIL_K) -> str:
    """h0..h{k} CTE chain over a ``cells(ix, iy)`` CTE; final relation
    ``hkeys(ix, iy, hkey)``. DuckDB evaluates each CTE once — no
    collapse hazard."""
    steps = []
    prev = "cells"
    stepn = 0
    for lev in range(k - 1, -1, -1):
        nx, ny, nd = hilbert_step_sqls(1 << lev)
        nx, ny, nd = (t.replace(" DIV ", " // ") for t in (nx, ny, nd))
        src_xyd = (
            "ix AS x, iy AS y, CAST(0 AS BIGINT) AS d"
            if stepn == 0
            else "x, y, d"
        )
        if stepn == 0:
            steps.append(f"h0 AS (SELECT ix, iy, {src_xyd} FROM {prev})")
            prev = "h0"
        stepn += 1
        steps.append(
            f"h{stepn} AS (SELECT ix, iy, {nx} AS x, {ny} AS y, {nd} AS d"
            f" FROM {prev})"
        )
        prev = f"h{stepn}"
    steps.append(f"hkeys AS (SELECT ix, iy, d AS hkey FROM {prev})")
    return ",\n".join(steps)


def hilbert_layout_audit(
    tiles: DataFrame, n_buckets: int = 32, res: int = LAYOUT_RES
) -> DataFrame:
    """Hilbert vs Z-order locality, same audit contract as
    ``zorder_layout_audit``: (layout, bucket, n_tiles, n_cells,
    bbox_area). The Hilbert key is computed once per DISTINCT cell and
    broadcast back; the Morton key stays a per-row expression."""
    base = tiles.select(
        "i",
        grid.ix_col("lon", res).alias("ix"),
        grid.iy_col("lat", res).alias("iy"),
        morton_col("lon", "lat", res).alias("zkey"),
    )
    hk = hilbert_cells(base.select("ix", "iy").distinct())
    based = base.join(F.broadcast(hk), ["ix", "iy"])
    out = []
    for layout, order in (("hilbert", ["hkey", "i"]), ("zorder", ["zkey", "i"])):
        w = F.ntile(n_buckets).over(Window.orderBy(*[F.col(c) for c in order]))
        out.append(
            based.withColumn("bucket", w.cast("bigint"))
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


def hilbert_audit_oracle_sql(
    n_buckets: int = 32, res: int = LAYOUT_RES
) -> str:
    z = morton_sql("lon", "lat", res)
    ix = grid.ix_sql("lon", res)
    iy = grid.iy_sql("lat", res)
    return f"""
keyed AS (
  SELECT i, {ix} AS ix, {iy} AS iy, {z} AS zkey FROM tiles
),
cells AS (SELECT DISTINCT ix, iy FROM keyed),
{hilbert_oracle_cte()},
hkeyed AS (
  SELECT k.i, k.ix, k.iy, k.zkey, h.hkey
  FROM keyed k JOIN hkeys h ON h.ix = k.ix AND h.iy = k.iy),
hb AS (SELECT *, ntile({n_buckets}) OVER (ORDER BY hkey, i) AS bucket
       FROM hkeyed),
zb AS (SELECT *, ntile({n_buckets}) OVER (ORDER BY zkey, i) AS bucket
       FROM hkeyed),
agg AS (
  SELECT 'hilbert' AS layout, CAST(bucket AS BIGINT) AS bucket,
         count(*) AS n_tiles,
         count(DISTINCT ix * {grid.IX_MUL} + iy) AS n_cells,
         (max(ix) - min(ix) + 1) * (max(iy) - min(iy) + 1) AS bbox_area
  FROM hb GROUP BY 2
  UNION ALL
  SELECT 'zorder', CAST(bucket AS BIGINT), count(*),
         count(DISTINCT ix * {grid.IX_MUL} + iy),
         (max(ix) - min(ix) + 1) * (max(iy) - min(iy) + 1)
  FROM zb GROUP BY 2
)
SELECT layout, bucket, n_tiles, n_cells, bbox_area FROM agg
"""


def write_hilbert(
    df: DataFrame, path: str, n_files: int, res: int = LAYOUT_RES
) -> None:
    """Production Hilbert layout pass, mirroring ``write_zordered``: the
    key is computed per DISTINCT cell (the 18-step chain never touches
    the row stream) and broadcast back, then
    ``repartitionByRange(key) + sortWithinPartitions`` writes files with
    disjoint, compact key ranges — same machinery, better curve."""
    base = df.withColumn("ix", grid.ix_col("lon", res)).withColumn(
        "iy", grid.iy_col("lat", res)
    )
    hk = hilbert_cells(base.select("ix", "iy").distinct())
    (
        base.join(F.broadcast(hk), ["ix", "iy"])
        .drop("ix", "iy")
        .repartitionByRange(n_files, "hkey")
        .sortWithinPartitions("hkey")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# R166: curve range-fragmentation audit — the clustering-property metric
# of Moon et al. (IEEE TKDE 2001) that decides WHICH space-filling curve
# a table should be laid out in: for a rectangle query, how many
# CONTIGUOUS key ranges does each curve need? (Each extra range is an
# extra row-group seek at 100 TB.) 20 deterministic Lehmer-seeded bbox
# queries (4-8 cells per side) are fanned into their cell sets
# (sequence+explode, ≤64 cells each — bounded), keyed under Z-order and
# Hilbert, and runs are counted with one lag window per curve.
# Hilbert's theoretical win (asymptotically fewer clusters than Z) shows
# up as frag_ratio_pm < 1000 on average — recorded, not claimed.
# ---------------------------------------------------------------------------

RF_NQ = 20


def _rf_query_exprs() -> dict[str, str]:
    from ..synth import lcg

    return {
        "qi": "q",
        "cx0": f"({lcg('q', 48271)} % {(1 << 16) - 16})",
        "cy0": f"({lcg('q', 16807)} % {(1 << 15) - 16})",
        "w": "(4 + q % 5)",
        "h": "(4 + (q * 3) % 5)",
    }


def range_fragmentation(spark) -> DataFrame:
    """(qi, n_cells, z_runs, h_runs, frag_ratio_pm): contiguous-range
    counts per bbox query under Z-order vs Hilbert keys."""
    ex = _rf_query_exprs()
    queries = spark.range(RF_NQ).selectExpr("id AS q").selectExpr(
        *[f"{e} AS {n}" for n, e in ex.items()]
    )
    qcells = (
        queries.selectExpr(
            "qi", "cy0", "h",
            "explode(sequence(cx0, cx0 + w - 1)) AS cx",
        )
        .selectExpr("qi", "cx", "explode(sequence(cy0, cy0 + h - 1)) AS cy")
    )
    zc = qcells.withColumn("zkey", F.expr(morton_xy_sql("cx", "cy")))
    hk = hilbert_cells(
        qcells.selectExpr("cx AS ix", "cy AS iy").dropDuplicates(["ix", "iy"])
    )
    keyed = zc.join(
        hk.selectExpr("ix AS cx", "iy AS cy", "hkey"), ["cx", "cy"]
    ).localCheckpoint(eager=False)

    def runs(col: str, out: str) -> DataFrame:
        w = Window.partitionBy("qi").orderBy(col)
        return (
            keyed.withColumn("prev", F.lag(col).over(w))
            .groupBy("qi")
            .agg(
                F.count("*").cast("bigint").alias("n_cells"),
                F.expr(
                    f"CAST(sum(CASE WHEN prev IS NULL OR {col} - prev <> 1"
                    f" THEN 1 ELSE 0 END) AS BIGINT)"
                ).alias(out),
            )
        )

    z = runs("zkey", "z_runs")
    h = runs("hkey", "h_runs").select("qi", "h_runs")
    return (
        z.join(h, "qi")
        .selectExpr(
            "CAST(qi AS BIGINT) AS qi", "n_cells", "z_runs", "h_runs",
            "(1000 * h_runs) DIV z_runs AS frag_ratio_pm",
        )
    )


def range_fragmentation_oracle() -> str:
    ex = _rf_query_exprs()
    cols = ", ".join(f"{e} AS {n}" for n, e in ex.items())
    return f"""
WITH rf_q AS (
  SELECT {cols} FROM range({RF_NQ}) AS t(q)),
rf_cells AS (
  SELECT qi, cx0 + gx.i AS cx, cy0 + gy.j AS cy
  FROM rf_q
  JOIN (SELECT unnest(range(0, 8)) AS i) gx ON gx.i < w
  JOIN (SELECT unnest(range(0, 8)) AS j) gy ON gy.j < h),
cells AS (SELECT DISTINCT cx AS ix, cy AS iy FROM rf_cells),
{hilbert_oracle_cte()},
rf_keyed AS (
  SELECT c.qi, c.cx, c.cy,
         {morton_xy_sql('c.cx', 'c.cy')} AS zkey, k.hkey
  FROM rf_cells c JOIN hkeys k ON k.ix = c.cx AND k.iy = c.cy),
rf_z AS (
  SELECT qi, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(CASE WHEN prev IS NULL OR zkey - prev <> 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS z_runs
  FROM (SELECT qi, zkey,
               lag(zkey) OVER (PARTITION BY qi ORDER BY zkey) AS prev
        FROM rf_keyed)
  GROUP BY 1),
rf_h AS (
  SELECT qi,
         CAST(sum(CASE WHEN prev IS NULL OR hkey - prev <> 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS h_runs
  FROM (SELECT qi, hkey,
               lag(hkey) OVER (PARTITION BY qi ORDER BY hkey) AS prev
        FROM rf_keyed)
  GROUP BY 1)
SELECT CAST(z.qi AS BIGINT) AS qi, z.n_cells, z.z_runs, h.h_runs,
       (1000 * h.h_runs) // z.z_runs AS frag_ratio_pm
FROM rf_z z JOIN rf_h h ON h.qi = z.qi"""


# ---------------------------------------------------------------------------
# R210: zone-map pruning audit (file skipping under two layouts)
# ---------------------------------------------------------------------------
#
# The reason the layout family exists, measured end-to-end: parquet/
# Iceberg scans skip a file when the query's range predicate is disjoint
# from the file's min/max column statistics ("zone maps"). This audit
# materializes those statistics for an equal-frequency 64-file split of
# the tiles table under (a) Z-order layout and (b) insertion order, runs
# a fixed 6-query bbox workload against them, and reports exactly how
# many files and rows each layout forces the scan to touch vs the true
# match count. The recorded gap IS the I/O win OPTIMIZE ZORDER buys at
# 10^12 rows. Scale: file stats are a 64-row dimension per layout; the
# workload join is literal-sized; the true-match counts are one
# predicate scan with map-side partial agg.

PRUNE_N_FILES = 64
# (qid, ix0, ix1, iy0, iy1) at res 9 — two hotspot boxes, a wide
# lat-band, a tall lon-band, a quadrant, and an empty box east of the
# data extent (pruning must drop ALL files for it).
PRUNE_WORKLOAD = [
    (1, 163642, 163648, 64242, 64248),
    (2, 163755, 163771, 64350, 64366),
    (3, 163584, 163891, 64300, 64315),
    (4, 163700, 163715, 64204, 64460),
    (5, 163584, 163737, 64204, 64332),
    (6, 163900, 163920, 64204, 64460),
]


def _workload_stack() -> str:
    rows = ", ".join(
        f"{q}, {x0}, {x1}, {y0}, {y1}" for q, x0, x1, y0, y1 in PRUNE_WORKLOAD
    )
    return (
        f"stack({len(PRUNE_WORKLOAD)}, {rows})"
        " AS (qid, qx0, qx1, qy0, qy1)"
    )


def zonemap_prune_audit(
    tiles: DataFrame, n_files: int = PRUNE_N_FILES, res: int = LAYOUT_RES
) -> DataFrame:
    """(layout, qid, files_scanned, files_total, rows_scanned,
    rows_matched) — integer-exact file-skipping audit."""
    spark = tiles.sparkSession
    base = tiles.select(
        "i",
        grid.ix_col("lon", res).alias("ix"),
        grid.iy_col("lat", res).alias("iy"),
        morton_col("lon", "lat", res).alias("zkey"),
    ).localCheckpoint(eager=False)
    wl = F.broadcast(spark.range(1).selectExpr(_workload_stack()))
    truth = (
        wl.crossJoin(base)
        .where("ix >= qx0 AND ix <= qx1 AND iy >= qy0 AND iy <= qy1")
        .groupBy("qid")
        .agg(F.count("*").cast("bigint").alias("rows_matched"))
    )
    out = []
    for lay, order in (("zorder", ["zkey", "i"]), ("by_id", ["i"])):
        w = F.ntile(n_files).over(Window.orderBy(*[F.col(c) for c in order]))
        fstats = (
            base.withColumn("f", w)
            .groupBy("f")
            .agg(
                F.min("ix").alias("fx0"), F.max("ix").alias("fx1"),
                F.min("iy").alias("fy0"), F.max("iy").alias("fy1"),
                F.count("*").cast("bigint").alias("n_rows"),
            )
        )
        out.append(
            fstats.crossJoin(wl)
            .groupBy("qid")
            .agg(
                F.expr(
                    "CAST(sum(CASE WHEN fx1 >= qx0 AND fx0 <= qx1 AND"
                    " fy1 >= qy0 AND fy0 <= qy1 THEN 1 ELSE 0 END)"
                    " AS BIGINT)"
                ).alias("files_scanned"),
                F.count("*").cast("bigint").alias("files_total"),
                F.expr(
                    "CAST(sum(CASE WHEN fx1 >= qx0 AND fx0 <= qx1 AND"
                    " fy1 >= qy0 AND fy0 <= qy1 THEN n_rows ELSE 0 END)"
                    " AS BIGINT)"
                ).alias("rows_scanned"),
            )
            .withColumn("layout", F.lit(lay))
        )
    return (
        out[0].unionByName(out[1])
        .join(F.broadcast(truth), "qid", "left")
        .selectExpr(
            "layout", "CAST(qid AS BIGINT) AS qid", "files_scanned",
            "files_total", "rows_scanned",
            "coalesce(rows_matched, CAST(0 AS BIGINT)) AS rows_matched",
        )
    )


def zonemap_prune_oracle_sql(
    n_files: int = PRUNE_N_FILES, res: int = LAYOUT_RES
) -> str:
    """Identical arithmetic in DuckDB (requires the tiles CTE)."""
    z = morton_sql("lon", "lat", res)
    ix = grid.ix_sql("lon", res)
    iy = grid.iy_sql("lat", res)
    vals = ", ".join(
        f"({q}, {x0}, {x1}, {y0}, {y1})"
        for q, x0, x1, y0, y1 in PRUNE_WORKLOAD
    )
    return f"""
zp_keyed AS (
  SELECT i, {ix} AS ix, {iy} AS iy, {z} AS zkey FROM tiles),
zp_wl(qid, qx0, qx1, qy0, qy1) AS (VALUES {vals}),
zp_truth AS (
  SELECT w.qid, CAST(count(*) AS BIGINT) AS rows_matched
  FROM zp_wl w JOIN zp_keyed k
    ON k.ix >= w.qx0 AND k.ix <= w.qx1
   AND k.iy >= w.qy0 AND k.iy <= w.qy1
  GROUP BY 1),
zp_zf AS (
  SELECT ntile({n_files}) OVER (ORDER BY zkey, i) AS f, ix, iy
  FROM zp_keyed),
zp_if AS (
  SELECT ntile({n_files}) OVER (ORDER BY i) AS f, ix, iy
  FROM zp_keyed),
zp_zs AS (
  SELECT f, min(ix) AS fx0, max(ix) AS fx1, min(iy) AS fy0,
         max(iy) AS fy1, CAST(count(*) AS BIGINT) AS n_rows
  FROM zp_zf GROUP BY 1),
zp_is AS (
  SELECT f, min(ix) AS fx0, max(ix) AS fx1, min(iy) AS fy0,
         max(iy) AS fy1, CAST(count(*) AS BIGINT) AS n_rows
  FROM zp_if GROUP BY 1),
zp_agg AS (
  SELECT 'zorder' AS layout, w.qid,
         CAST(sum(CASE WHEN s.fx1 >= w.qx0 AND s.fx0 <= w.qx1
                        AND s.fy1 >= w.qy0 AND s.fy0 <= w.qy1
                   THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         CAST(count(*) AS BIGINT) AS files_total,
         CAST(sum(CASE WHEN s.fx1 >= w.qx0 AND s.fx0 <= w.qx1
                        AND s.fy1 >= w.qy0 AND s.fy0 <= w.qy1
                   THEN s.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
  FROM zp_zs s CROSS JOIN zp_wl w GROUP BY 2
  UNION ALL
  SELECT 'by_id', w.qid,
         CAST(sum(CASE WHEN s.fx1 >= w.qx0 AND s.fx0 <= w.qx1
                        AND s.fy1 >= w.qy0 AND s.fy0 <= w.qy1
                   THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN s.fx1 >= w.qx0 AND s.fx0 <= w.qx1
                        AND s.fy1 >= w.qy0 AND s.fy0 <= w.qy1
                   THEN s.n_rows ELSE 0 END) AS BIGINT)
  FROM zp_is s CROSS JOIN zp_wl w GROUP BY 2)
SELECT a.layout, CAST(a.qid AS BIGINT) AS qid, a.files_scanned,
       a.files_total, a.rows_scanned,
       coalesce(t.rows_matched, 0) AS rows_matched
FROM zp_agg a LEFT JOIN zp_truth t ON t.qid = a.qid
"""


# ---------------------------------------------------------------------------
# R211: space-filling-curve range decomposition (scan planning)
# ---------------------------------------------------------------------------
#
# The S2/quadkey "covering" primitive: translate a bbox predicate into
# the minimal set of CONTIGUOUS key ranges on a space-filling curve, so
# a curve-sorted table serves the bbox with a handful of sequential
# range scans instead of per-cell point lookups. Computed for BOTH
# curves over the same bbox: enumerate the bbox's cells (a bounded
# dimension frame), key each cell (Hilbert via the 18-step state
# machine; Morton via bit interleaving), sort, and merge consecutive
# keys gaps-and-islands style. Hilbert's unit-step continuity yields
# materially fewer ranges than Z-order's diagonal jumps — the recorded
# range counts ARE that claim. Scale: the frame is bbox-area-sized;
# the emitted ranges become key-range predicates against the
# write_zordered layout's parquet min/max stats.

RANGE_BBOX = (163640, 163679, 64240, 64279)  # 40x40 cells at res 9


def curve_range_plan(spark, bbox=RANGE_BBOX, k: int = HIL_K) -> DataFrame:
    x0, x1, y0, y1 = bbox
    cells = spark.range(1).selectExpr(
        f"explode(sequence({x0}, {x1})) AS ix"
    ).selectExpr("ix", f"explode(sequence({y0}, {y1})) AS iy")
    hk = hilbert_cells(cells, k).selectExpr(
        "'hilbert' AS curve", "hkey AS key"
    )
    zk = cells.selectExpr(
        "'zorder' AS curve", f"{morton_xy_sql('ix', 'iy')} AS key"
    )
    keyed = hk.unionByName(zk)
    isl = keyed.selectExpr(
        "curve", "key",
        "CASE WHEN key = lag(key) OVER (PARTITION BY curve ORDER BY key)"
        " + 1 THEN 0 ELSE 1 END AS brk",
    ).selectExpr(
        "curve", "key",
        "sum(brk) OVER (PARTITION BY curve ORDER BY key"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid",
    )
    return (
        isl.groupBy("curve", "rid")
        .agg(
            F.expr("CAST(min(key) AS BIGINT) AS k0"),
            F.expr("CAST(max(key) AS BIGINT) AS k1"),
            F.count("*").cast("bigint").alias("n_cells"),
        )
        .selectExpr(
            "curve", "CAST(rid AS BIGINT) AS range_id", "k0", "k1",
            "n_cells",
        )
    )


def curve_range_plan_oracle(bbox=RANGE_BBOX, k: int = HIL_K) -> str:
    x0, x1, y0, y1 = bbox
    return f"""
WITH cells AS (
  SELECT x.ix, y.iy
  FROM (SELECT unnest(range({x0}, {x1 + 1})) AS ix) x
  CROSS JOIN (SELECT unnest(range({y0}, {y1 + 1})) AS iy) y),
{hilbert_oracle_cte(k)},
crp_keyed AS (
  SELECT 'hilbert' AS curve, hkey AS key FROM hkeys
  UNION ALL
  SELECT 'zorder', {morton_xy_sql('ix', 'iy')} FROM cells),
crp_brk AS (
  SELECT curve, key,
         CASE WHEN key = lag(key) OVER (PARTITION BY curve ORDER BY key)
                + 1 THEN 0 ELSE 1 END AS brk
  FROM crp_keyed),
crp_isl AS (
  SELECT curve, key,
         sum(brk) OVER (PARTITION BY curve ORDER BY key
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
  FROM crp_brk)
SELECT curve, CAST(rid AS BIGINT) AS range_id,
       CAST(min(key) AS BIGINT) AS k0, CAST(max(key) AS BIGINT) AS k1,
       CAST(count(*) AS BIGINT) AS n_cells
FROM crp_isl GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# R228: column-encoding audit — what the layout buys COMPRESSION
# ---------------------------------------------------------------------------
#
# Zone maps (zonemap_prune) measure what the layout buys SCANS; this
# audit measures what it buys STORAGE: per file (the same 64-way
# equal-frequency split), the run count (RLE proxy) and distinct count
# (dictionary proxy) of two columns — the res-9 CELL id, which the
# Z-order sort makes contiguous (runs collapse to ~distinct cells per
# file), and TILE KIND, which is independent of space (the honest
# counter-example: spatial sorting cannot help it). Exact integers:
# runs = 1 + SUM(value != lag value) within the file in layout order.

ENC_COLUMNS = ("cell9", "kind")


def encoding_audit(
    tiles: DataFrame, n_files: int = PRUNE_N_FILES, res: int = LAYOUT_RES
) -> DataFrame:
    """(layout, column, n_rows, total_runs, total_distinct,
    rows_per_run_milli) — RLE/dictionary effectiveness per layout."""
    base = tiles.select(
        "i",
        F.expr(
            f"{grid.ix_sql('lon', res)} * {grid.IX_MUL}"
            f" + {grid.iy_sql('lat', res)}"
        ).alias("cell9"),
        F.col("tile_kind").alias("kind"),
        morton_col("lon", "lat", res).alias("zkey"),
    ).localCheckpoint(eager=False)
    out = []
    for lay, order in (("zorder", ["zkey", "i"]), ("by_id", ["i"])):
        ocols = ", ".join(order)
        w = F.ntile(n_files).over(Window.orderBy(*[F.col(c) for c in order]))
        filed = base.withColumn("f", w)
        for col in ENC_COLUMNS:
            runs = filed.selectExpr(
                "f", col,
                f"CASE WHEN {col} = lag({col}) OVER (PARTITION BY f"
                f" ORDER BY {ocols}) THEN 0 ELSE 1 END AS brk",
            )
            out.append(
                runs.groupBy("f")
                .agg(
                    F.count("*").cast("bigint").alias("rows_f"),
                    F.expr("CAST(sum(brk) AS BIGINT)").alias("runs_f"),
                    F.countDistinct(col).cast("bigint").alias("dist_f"),
                )
                .agg(
                    F.expr("CAST(sum(rows_f) AS BIGINT)").alias("n_rows"),
                    F.expr("CAST(sum(runs_f) AS BIGINT)").alias(
                        "total_runs"
                    ),
                    F.expr("CAST(sum(dist_f) AS BIGINT)").alias(
                        "total_distinct"
                    ),
                )
                .selectExpr(
                    f"'{lay}' AS layout", f"'{col}' AS column_name",
                    "n_rows", "total_runs", "total_distinct",
                    "CAST((1000 * n_rows) DIV total_runs AS BIGINT)"
                    " AS rows_per_run_milli",
                )
            )
    res_df = out[0]
    for o in out[1:]:
        res_df = res_df.unionByName(o)
    return res_df


def encoding_audit_oracle(
    n_files: int = PRUNE_N_FILES, res: int = LAYOUT_RES
) -> str:
    z = morton_sql("lon", "lat", res)
    ix = grid.ix_sql("lon", res)
    iy = grid.iy_sql("lat", res)
    parts = []
    for lay, ocols in (("zorder", "zkey, i"), ("by_id", "i")):
        for col in ENC_COLUMNS:
            parts.append(f"""
  SELECT '{lay}' AS layout, '{col}' AS column_name,
         CAST(sum(rows_f) AS BIGINT) AS n_rows,
         CAST(sum(runs_f) AS BIGINT) AS total_runs,
         CAST(sum(dist_f) AS BIGINT) AS total_distinct,
         CAST((1000 * sum(rows_f)) // sum(runs_f) AS BIGINT)
           AS rows_per_run_milli
  FROM (
    SELECT f, CAST(count(*) AS BIGINT) AS rows_f,
           CAST(sum(brk) AS BIGINT) AS runs_f,
           CAST(count(DISTINCT {col}) AS BIGINT) AS dist_f
    FROM (
      SELECT f, {col},
             CASE WHEN {col} = lag({col}) OVER (PARTITION BY f
               ORDER BY {ocols}) THEN 0 ELSE 1 END AS brk
      FROM (
        SELECT *, ntile({n_files}) OVER (ORDER BY {ocols}) AS f
        FROM ea_keyed))
    GROUP BY f)""")
    body = "\n  UNION ALL\n".join(parts)
    return f"""
ea_keyed AS (
  SELECT i, {ix} * {grid.IX_MUL} + {iy} AS cell9,
         tile_kind AS kind, {z} AS zkey
  FROM tiles)
{body}
"""
