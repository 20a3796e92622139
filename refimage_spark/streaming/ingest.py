"""Streaming ingest + streaming aggregations.

- ``stream_ingest_pages``: micro-batch incremental indexing — a file
  stream of pages feeds ``foreachBatch(append_pages)``, so each
  micro-batch becomes new log-structured segments with manifest lineage
  (the streaming twin of the reference's synchronous upload→index path,
  src/refimage/api.py:804-880). Checkpointing makes ingest exactly-once
  at the segment level: a replayed batch's urls are already in the docs
  table and get dropped by the anti-join in append_pages.
- ``windowed_event_counts``: watermarked tumbling-window aggregation
  over an event stream (late data beyond the watermark dropped) —
  the streaming twin of operators/events.tumbling_agg.
- ``streaming_sessionize``: CUSTOM STATEFUL operator via
  applyInPandasWithState — per-user session state (start, last_ts,
  count, sum) survives across micro-batches; a session closes when the
  gap is exceeded inside a batch or the state times out. The streaming
  twin of operators/events.sessionize (identical closed-session rows,
  asserted in tests).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from refimage_spark.index.merge import append_pages
from refimage_spark.operators.events import SESSION_GAP_SEC
from refimage_spark.sources.pages import PAGES_SCHEMA


def stream_ingest_pages(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Index every pages parquet file that lands in ``input_dir``."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # lock_blocking: a concurrent compact/merge/delete holds the
        # maintenance lock; waiting it out (backoff inside the lock) is
        # correct here — an immediate raise would kill the whole
        # streaming query. If the wait still times out, the query fails
        # and checkpoint replay makes the retry safe (replayed urls are
        # dropped by append's anti-join).
        append_pages(batch.sparkSession, batch, index_dir, lock_blocking=True)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("started", TimestampType()),
        StructField("ended", TimestampType()),
        StructField("closed_by", StringType()),  # "gap" | "timeout"
    ]
)

# per-user session state carried across micro-batches; timestamps as
# epoch MICROseconds (int64) — float seconds would break the exact
# µs-aligned Arrow timestamp round-trip
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("started", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def streaming_sessionize(
    events_stream: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    state_timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Custom stateful sessionization: one state row per user survives
    across micro-batches (applyInPandasWithState); sessions CLOSE and
    emit when the inter-event gap exceeds ``gap_sec`` (within or across
    batches) or when the user goes idle past the processing-time
    timeout. At scale this is one shuffle on user_id per micro-batch
    with state in the executor state store (RocksDB on a cluster).

    NOTE: a ProcessingTimeTimeout query never self-terminates under
    trigger(availableNow=True) — the engine keeps scheduling empty
    micro-batches to fire pending timers for still-open sessions. On a
    real continuous stream that is exactly right. For a BOUNDED drain
    (replay a finite table, collect the gap-closed sessions) pass
    ``state_timeout_ms=None``: no timers are registered, the availableNow
    run terminates by itself after the data batches, and each user's
    still-open last session simply stays in state."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            started, last_ts, n, tot = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(tot, 4)],
                    "started": [pd.Timestamp(started, unit="us")],
                    "ended": [pd.Timestamp(last_ts, unit="us")],
                    "closed_by": ["timeout"],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
        vals = rows["value"].to_numpy()
        cur = list(state.get) if state.exists else None
        out = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            # gap compares TRUNCATED epoch seconds — bit-identical to the
            # batch twin (events.sessionize casts ts to long seconds)
            if cur is None:
                cur = [t, t, 0, 0.0]
            elif t // 1_000_000 - cur[1] // 1_000_000 > gap_sec:
                out.append(cur)
                cur = [t, t, 0, 0.0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(v)
        state.update(tuple(cur))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "n_events": [c[2] for c in out],
                    "total_value": [round(c[3], 4) for c in out],
                    "started": [pd.Timestamp(c[0], unit="us") for c in out],
                    "ended": [pd.Timestamp(c[1], unit="us") for c in out],
                    "closed_by": ["gap"] * len(out),
                }
            )

    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts with a late-data watermark."""
    # watermarks require TIMESTAMP (tz-aware); the events table is NTZ
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
