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
