"""Streaming geofence transition detection (SURVEY §2.12 R47).

The movement-analytics streaming primitive: given a stream of per-entity
position fixes already resolved to a zone (or 'none' outside every
fence), emit one row per zone TRANSITION — enter, exit, or hand-off —
the moment it happens, across micro-batch boundaries.

Re-expresses the reference's watch-session push bridge (per-session
last-seen state, emit-on-change — ``watch_push_bridge.py:30-99``) as a
spatial ``applyInPandasWithState`` operator: state per user is just
(last_zone, last_seq); each batch's fixes are sorted by the unique seq
inside the group (micro-batch delivery is unordered), intra-batch
transitions all emit, and the state carries the tail fix forward.

Scale shape: state is O(#active entities) bytes (two fields), the group
key is the entity — the same hash partitioning the batch trajectory ops
use; no broadcast, no global ordering. The zone resolution itself happens
UPSTREAM in the stream plan with the ordinary batch PIP machinery
(cell-keyed broadcast join, `pip_join.py`) — the stateful op only ever
sees (user, seq, zone).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, from_zone string, to_zone string, at_seq long"
)
STATE_SCHEMA = "last_zone string, last_seq long"

OUTSIDE = "none"


def _transitions(key, pdfs, state: GroupState):
    (user_id,) = key
    fixes = [pdf[["seq", "zone"]] for pdf in pdfs]
    if not fixes:
        return
    batch = pd.concat(fixes).sort_values("seq")
    if state.exists:
        last_zone, last_seq = state.get
    else:
        last_zone, last_seq = OUTSIDE, -1
    out = []
    for seq, zone in zip(batch["seq"], batch["zone"]):
        seq = int(seq)
        if seq <= last_seq:  # late duplicate of an already-applied fix
            continue
        if zone != last_zone:
            out.append(
                {
                    "user_id": user_id,
                    "from_zone": last_zone,
                    "to_zone": zone,
                    "at_seq": seq,
                }
            )
        last_zone, last_seq = zone, seq
    state.update((last_zone, last_seq))
    if out:
        yield pd.DataFrame(out)


def geofence_transitions(fixes_stream: DataFrame) -> DataFrame:
    """Input stream schema: (user_id long, seq long, zone string).
    Emits (user_id, from_zone, to_zone, at_seq) per transition."""
    return fixes_stream.groupBy("user_id").applyInPandasWithState(
        _transitions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def geofence_transitions_batch(fixes: DataFrame) -> DataFrame:
    """Batch reference implementation (parity oracle for the streaming
    op): lag() over (user ORDER BY seq) with an OUTSIDE initial state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("seq")
    lagged = fixes.withColumn(
        "from_zone", F.coalesce(F.lag("zone").over(w), F.lit(OUTSIDE))
    )
    return lagged.where(F.col("zone") != F.col("from_zone")).select(
        "user_id",
        "from_zone",
        F.col("zone").alias("to_zone"),
        F.col("seq").alias("at_seq"),
    )
