"""Interval / range joins via bucket binning (SURVEY.md J12).

Spark has no native band join; the engine pattern is the same trick as the
grid cells: bin the range key (``bucket = floor(x / width)``), equi-join
on the bucket (candidates), exact range predicate verifies (O4 again —
the grid IS a 2-D range join).

A row within ±W of a target can only live in the target's bucket or an
adjacent one when bucket width = W, so each left row joins ≤3 buckets —
explode 3 bucket keys on the smaller side, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_pairs_within(events: DataFrame, window_s: int = 60) -> DataFrame:
    """Self-interval join: event pairs (a < b by event_id) whose timestamps
    lie within ``window_s`` seconds. Same bucket-bin trick — each left row
    probes its own + adjacent buckets, never a cross join; at 10^12 rows
    the bucket key is also the shuffle key, so candidate pairs are
    generated within co-partitioned buckets only.
    """
    base = events.select(
        "event_id",
        # NTZ-safe epoch: casting NTZ to TIMESTAMP re-interprets in the
        # SESSION timezone; differences cancel only while the offset is
        # constant (breaks across a DST boundary). timestampdiff on NTZ
        # is pure calendar arithmetic — timezone-free.
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    a = base.select(
        F.col("event_id").alias("event_id_a"), F.col("us").alias("us_a")
    ).withColumn(
        "bucket",
        F.explode(
            F.expr(
                f"sequence(CAST(floor(us_a / ({window_s}e0 * 1e6)) AS BIGINT) - 1, "
                f"CAST(floor(us_a / ({window_s}e0 * 1e6)) AS BIGINT) + 1)"
            )
        ),
    )
    b = base.select(
        F.col("event_id").alias("event_id_b"), F.col("us").alias("us_b")
    ).withColumn(
        "bucket", F.expr(f"CAST(floor(us_b / ({window_s}e0 * 1e6)) AS BIGINT)")
    )
    return (
        a.join(b, "bucket")
        .where(
            (F.col("event_id_a") < F.col("event_id_b"))
            & F.expr(f"abs(us_a - us_b) <= {window_s}e0 * 1e6")
        )
        .select("event_id_a", "event_id_b")
        .dropDuplicates(["event_id_a", "event_id_b"])
    )


def event_pairs_oracle(window_s: int = 60) -> str:
    return f"""
SELECT DISTINCT a.event_id AS event_id_a, b.event_id AS event_id_b
FROM events a JOIN events b
  ON a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {window_s}e0 * 1e6
"""


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """AS-OF join: for each left row, the LATEST right row with
    ``right_ts <= left_ts`` in the same ``key`` group (guide's "as-of /
    range join" pattern; the reference's nearest-preceding-snapshot
    lookups). Spark has no native as-of; the scalable shape is the
    union+ordered-window trick, NOT a per-group ``merge_asof`` UDF:

      tag both sides → one shuffle on ``key`` → sort (ts, side) inside
      each partition → running ``last(right_cols, ignorenulls)`` window
      carries the most recent right row forward onto every left row.

    One exchange total, frame evaluated in-partition, no range explosion
    and no Python in the hot path. Equal timestamps count as "at or
    before" (right sorts first at ts ties). Inner semantics: left rows
    with no preceding right row are dropped.

    Right-side ts ties within a key are pre-collapsed by the caller
    (keep one row per (key, ts)) so the carried row is deterministic.
    Returns left columns + every non-key right column (prefixed r_).
    """
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    from pyspark.sql.types import StructField, StructType

    # The right row is carried as ONE struct through a single
    # last(ignorenulls) window — per-column windows would splice fields
    # from DIFFERENT right rows whenever a right column holds a NULL
    # (last skips nulls per column), fabricating rows that never existed.
    # Never mutate via StructType.add (CLAUDE.md): build fresh.
    rstruct_type = StructType(
        [StructField("_r_ts", right.schema[right_ts].dataType)]
        + [StructField(f"r_{c}", right.schema[c].dataType) for c in rcols]
    )
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            F.col(right_ts).alias("_r_ts"),
            *[F.col(c).alias(f"r_{c}") for c in rcols],
        ).alias("_r"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        key,
        "_ts",
        "_side",
        *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        carried.where((F.col("_side") == 1) & F.col("_r").isNotNull())
        .select(
            key,
            F.col("_ts").alias(left_ts),
            *lcols,
            *[F.col(f"_r.r_{c}").alias(f"r_{c}") for c in rcols],
            F.col("_r._r_ts").alias(f"r_{right_ts}"),
        )
    )
