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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from refimage_spark.index.merge import append_pages
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
        append_pages(batch.sparkSession, batch, index_dir)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
