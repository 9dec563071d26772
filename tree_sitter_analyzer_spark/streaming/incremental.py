"""Incremental sync (CDC) + standing queries.

Re-expresses the reference's incremental machinery:
- ``IncrementalSync`` (incremental_sync.py:78-330): diff indexed rows vs
  current state by mtime-then-hash, classify new/modified/deleted/
  unchanged, re-extract only changed → here a batch MERGE keyed on
  (image_id, content version) — emulated with anti-join + union since no
  Delta/Iceberg jars ship in this image (the write path is factored so a
  MERGE INTO sink drops in).
- ``hyphae_subscribe`` standing queries (watch_push_bridge.py:30-99):
  a selector re-evaluated on change, deltas pushed → here a Structured
  Streaming query re-running a compiled aggregation per micro-batch
  (tests/test_streaming.py drives it with file sources + memory sink).

Scale: the MERGE classifies with ONE full-outer join keyed on image_id —
at 10^12 rows this is the one unavoidable co-partitioned shuffle; Iceberg
bucketing on image_id makes it storage-partitioned (no exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_changes(current: DataFrame, incoming: DataFrame, key: str,
                     fingerprint: str) -> DataFrame:
    """Full-outer diff → change class per key (incremental_sync.py:29-53
    classes: new/modified/deleted/unchanged)."""
    a = current.select(F.col(key).alias("k"), F.col(fingerprint).alias("fp_old"))
    b = incoming.select(F.col(key).alias("k"), F.col(fingerprint).alias("fp_new"))
    j = a.join(b, "k", "full_outer")
    return j.select(
        F.col("k").alias(key),
        F.when(F.col("fp_old").isNull(), "new")
        .when(F.col("fp_new").isNull(), "deleted")
        .when(F.col("fp_old") != F.col("fp_new"), "modified")
        .otherwise("unchanged")
        .alias("change"),
    )


def merge_upsert(current: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """MERGE emulation: incoming rows win on key collision; keys absent
    from incoming survive unchanged; deletions are explicit (incoming is
    the full new state here — the snapshot-sync mode). For delta-mode
    (incoming = changed rows only) use ``merge_delta``."""
    return incoming.unionByName(
        current.join(incoming.select(key), key, "left_anti")
    )


def merge_delta(current: DataFrame, upserts: DataFrame,
                deletes: DataFrame, key: str) -> DataFrame:
    """Delta-mode MERGE: apply upserts + deletes to the current snapshot.
    Equivalent to Iceberg MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT / (separate) DELETE."""
    survivors = current.join(
        upserts.select(key).unionByName(deletes.select(key)), key, "left_anti"
    )
    return survivors.unionByName(upserts)
