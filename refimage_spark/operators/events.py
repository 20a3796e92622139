"""Event-stream operators (batch form of the streaming shapes).

The reference has no streaming surface (SURVEY.md §2.9) — these extend
the engine with the windowed/sessionized aggregations a training-data
pipeline runs over event logs. The same logic runs under Structured
Streaming via refimage_spark.streaming (watermark + window); the batch
form here is the oracle-checkable twin.

Scale notes: sessionization is one shuffle on user_id (windows are
per-user, AQE handles skewed users); tumbling windows are a plain
hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800


def tumbling_agg(events: DataFrame, width: str = "hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return events.groupBy(
        F.date_trunc(width, "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks when the gap to
    the previous event of the same user exceeds ``gap_sec``.

    Output: (user_id, session_idx, n_events, total_value, started, ended).
    Deterministic total order inside a user: (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; route via timestamp for epoch seconds (session
    # tz pinned to UTC, so this matches DuckDB's epoch())
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_sec), F.lit(1)
    ).otherwise(F.lit(0))
    with_s = events.withColumn(
        "session_idx", F.sum(new_session).over(w).cast("long")
    )
    return with_s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.min("ts").alias("started"),
        F.max("ts").alias("ended"),
    )


def running_total(events: DataFrame) -> DataFrame:
    """Per-user running sum over time (window-function coverage)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )
