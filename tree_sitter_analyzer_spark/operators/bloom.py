"""Deterministic Bloom-filter runtime filter with a false-positive audit.

The reference's #990 lesson (edge_store.py:224-283) is that scan-side
pre-filtering — replacing a full-scan predicate with an index-driven
candidate test — is where interactive latency comes from. Spark's native
analog is the runtime bloom-filter join (`spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled`); this operator builds the same
structure EXPLICITLY and deterministically so its semantics (one-sided
error: never drops a true match, passes some false ones) are
hash-verifiable cross-engine, exactly like the count-min sketch
(operators/sketch.py — the membership-flavored sibling of that
frequency sketch).

Representation: the m-bit array is kept SPARSELY as the distinct set of
set-bit positions (j, bit) — identical semantics, join-friendly, and
tiny (≤ k·|keys| rows). A probe key passes iff ALL k of its positions
are set (count == k after the (j, bit) equi-join). All positions are
md5-seeded integers; DuckDB rebuilds the filter bit-for-bit.

Scale shape: the bit-set frame broadcasts (≤ k·|keys| rows, the small
dimension); the probe side tests membership map-side with a broadcast
semi-join per hash row + a count — the big side never shuffles before
the filter, which is the entire point of a runtime filter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import grid
from ..functions import md5int_duck, md5int_spark
from .pip_join import tile_cells

K_HASHES = 3
M_BITS = 512   # deliberately small: false positives must be VISIBLE
RES = 8


def _bit_spark(key: str, j: str) -> str:
    seeded = f"concat('b', {j}, '|', CAST({key} AS STRING))"
    return f"({md5int_spark(seeded)} % {M_BITS})"


def _bit_duck(key: str, j: str) -> str:
    seeded = f"('b' || {j} || '|' || CAST({key} AS VARCHAR))"
    return f"({md5int_duck(seeded)} % {M_BITS})"


def bloom_audit(tiles: DataFrame, res: int = RES) -> DataFrame:
    """Build a Bloom filter over the HOT cells (res-``res`` cells holding
    any hotspot tile, i % 5 = 0) and probe every occupied cell.

    Returns ONE audit row: (n_keys, n_bits_set, n_cells, n_pass,
    n_false_pos, fp_rate_milli). Invariants the operator guarantees:
    every hot cell passes (no false negatives — one-sided error) and
    fp_rate_milli tracks the (1 − e^{−kn/m})^k textbook rate.
    """
    cells = (
        tile_cells(tiles, res)
        .groupBy("cell")
        .agg(F.max(F.expr("CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END")).alias("hot"))
    )
    js = ", ".join(str(j) for j in range(K_HASHES))
    bits = (
        cells.where("hot = 1")
        .select("cell", F.explode(F.expr(f"array({js})")).alias("j"))
        .select("j", F.expr(_bit_spark("cell", "j")).alias("bit"))
        .distinct()
    )
    probe = cells.select(
        "cell", "hot", F.explode(F.expr(f"array({js})")).alias("j")
    ).select(
        "cell", "hot", "j", F.expr(_bit_spark("cell", "j")).alias("bit")
    )
    passed = (
        probe.join(F.broadcast(bits), ["j", "bit"])
        .groupBy("cell", "hot")
        .agg(F.count("*").alias("n_set"))
        .where(F.col("n_set") == K_HASHES)
    )
    totals = cells.agg(
        F.count("*").alias("n_cells"),
        F.sum("hot").cast("bigint").alias("n_keys"),
    )
    nbits = bits.agg(F.count("*").alias("n_bits_set"))
    pass_agg = passed.agg(
        F.count("*").alias("n_pass"),
        F.sum(F.expr("1 - hot")).cast("bigint").alias("n_false_pos"),
    )
    return (
        totals.crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(pass_agg))
        .selectExpr(
            "n_keys",
            "n_bits_set",
            "n_cells",
            "n_pass",
            "n_false_pos",
            "1000 * n_false_pos DIV (n_cells - n_keys) AS fp_rate_milli",
        )
    )


def bloom_audit_oracle_sql(res: int = RES) -> str:
    js = ", ".join(f"({j})" for j in range(K_HASHES))
    return f"""
bl_cells AS (
  SELECT {grid.cell_sql('lon', 'lat', res)} AS cell,
         max(CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END) AS hot
  FROM tiles GROUP BY 1
),
bl_js(j) AS (VALUES {js}),
bl_bits AS (
  SELECT DISTINCT j, {_bit_duck('cell', 'j')} AS bit
  FROM bl_cells CROSS JOIN bl_js WHERE hot = 1
),
bl_probe AS (
  SELECT cell, hot, j, {_bit_duck('cell', 'j')} AS bit
  FROM bl_cells CROSS JOIN bl_js
),
bl_pass AS (
  SELECT p.cell, p.hot
  FROM bl_probe p JOIN bl_bits b ON b.j = p.j AND b.bit = p.bit
  GROUP BY 1, 2 HAVING count(*) = {K_HASHES}
),
bl_tot AS (
  SELECT count(*) AS n_cells, CAST(sum(hot) AS BIGINT) AS n_keys
  FROM bl_cells
),
bl_nb AS (SELECT count(*) AS n_bits_set FROM bl_bits),
bl_pa AS (
  SELECT count(*) AS n_pass, CAST(sum(1 - hot) AS BIGINT) AS n_false_pos
  FROM bl_pass
)
SELECT t.n_keys, nb.n_bits_set, t.n_cells, pa.n_pass, pa.n_false_pos,
       1000 * pa.n_false_pos // (t.n_cells - t.n_keys) AS fp_rate_milli
FROM bl_tot t CROSS JOIN bl_nb nb CROSS JOIN bl_pa pa"""
