"""Stream-stream interval join — the I-family's two-sided real-time shape.

Re-expresses the reference's cross-stream correlation (the watch bridge
joins file-change events against the standing query registry,
``watch_push_bridge.py:30-99``) as Structured Streaming's watermarked
stream-stream join: each side declares how late its events can be, and
the state store retains only rows inside the join's time bound — the
planner derives the eviction horizon from the watermarks + the interval
condition, so state is bounded regardless of stream length (the 100 TB/d
requirement: unbounded-state joins are the streaming analog of an
all-pairs join).

Batch parity: the identical predicate over the same rows as a static
DataFrame join — pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Attribution window: a purchase is credited to a same-user click at most
# this long before it (the synthetic event stream spans 30 days at
# ~1.4 events/hour, so a day-scale window keeps the parity test dense).
ATTRIBUTION_WINDOW = "24 hours"
LATENESS = "30 minutes"


def click_attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """(click, purchase) pairs where the purchase follows the click by at
    most ``ATTRIBUTION_WINDOW`` for the same user.

    Works identically on static frames and on streaming frames; for
    streams BOTH sides must carry an event-time watermark (apply
    ``withWatermark`` before calling, or pass streams built by
    ``watermarked``) — the interval condition then bounds the join state.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id", "c_ts", "p_ts"
    )


def watermarked(events: DataFrame, event_type: str) -> DataFrame:
    """One side of the join: filter to a type and declare event-time
    lateness (the state-eviction contract)."""
    return (
        events.where(F.col("event_type") == event_type)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", LATENESS)
    )
