"""Stateful quality-regression detection (SURVEY.md I5).

Re-expresses ``health_homeostasis.py`` (per-file grade history, regression
detection with per-file cooldown state) as a custom stateful streaming
operator: per zone, track the last quality grade across micro-batches via
``applyInPandasWithState``; emit an alert row when a zone's grade drops,
suppressing repeats within a cooldown of N batches.

Batch-driven tests (tests/test_streaming.py) run it with availableNow
triggers; in production the source is the streaming audit table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "zone_id string, prev_grade int, new_grade int, batch_seq long"
)
STATE_SCHEMA = "grade int, cooldown int, seq long"

COOLDOWN_BATCHES = 2


def _detect(key, pdfs, state: GroupState):
    (zone_id,) = key
    best = None
    for pdf in pdfs:
        batch_min = int(pdf["grade"].min())
        best = batch_min if best is None else min(best, batch_min)
    if best is None:
        return
    if state.exists:
        prev_grade, cooldown, seq = state.get
    else:
        prev_grade, cooldown, seq = best, 0, 0
    seq += 1
    alert = best < prev_grade and cooldown == 0
    new_cooldown = COOLDOWN_BATCHES if alert else max(0, cooldown - 1)
    state.update((best, new_cooldown, seq))
    if alert:
        yield pd.DataFrame(
            [
                {
                    "zone_id": zone_id,
                    "prev_grade": prev_grade,
                    "new_grade": best,
                    "batch_seq": seq,
                }
            ]
        )


def grade_regressions(zone_grades_stream: DataFrame) -> DataFrame:
    """Input stream schema: (zone_id string, grade int). Emits one alert
    row per (zone, regression) with cooldown suppression."""
    return zone_grades_stream.groupBy("zone_id").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
