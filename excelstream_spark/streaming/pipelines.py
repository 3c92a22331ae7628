"""Structured Streaming pipelines over the ``events`` table shape.

The reference's "streaming" is constant-memory I/O, not event-time
processing (SURVEY.md §2.7) — these pipelines are the genuine Spark
streaming surface layered on the same data model:

- file-source ``readStream`` (parquet here; the xlsx/csv sources work the
  same way as batch-at-a-time micro-batches),
- event-time watermarks bounding state for late data,
- tumbling-window aggregation (the streaming twin of the batch
  ``events_hourly`` catalog query),
- ``session_window`` gap sessionization (twin of ``sessionize_events``).

All pipelines are testable with ``Trigger.AvailableNow`` against static
directories — exactly how they would run incrementally on a cluster with
checkpointing; nothing here is local-mode-specific.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over an events parquet directory/file.  The upstream
    files carry TIMESTAMP(NANOS) (read as bigint under nanosAsLong, see
    tables.py) — restored to timestamp here with integer division."""
    import os

    if os.path.isfile(path):
        # the file-stream source monitors DIRECTORIES; expose a single file
        # through a temp dir of symlinks (read-only, nothing is copied)
        link_dir = tempfile.mkdtemp(prefix="esspark_stream_")
        os.symlink(path, os.path.join(link_dir, os.path.basename(path)))
        path = link_dir
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_windowed_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows per event_type with a late-data watermark.
    State is bounded: windows older than the watermark are finalized and
    evicted — the property that keeps this runnable forever at scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via session_window — the built-in stateful
    operator (dynamic-length windows merged on overlap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_available_now(
    result: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 120,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the data available
    now (micro-batch catch-up semantics) into an in-memory table; returns
    the materialized result.  In production replace the memory sink with
    parquet/kafka and keep the checkpoint dir stable for exactly-once."""
    if timeout_sec <= 0:
        # validate BEFORE .start(): awaitTermination rejects non-positive
        # timeouts, which would leak an already-running query
        raise ValueError(f"timeout_sec must be positive, got {timeout_sec}")
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="esspark_ckpt_")
    query = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:
        # a partial table is worse than an error: stop and say so
        query.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} still active after "
            f"{timeout_sec}s (availableNow should terminate; a "
            "processing-time timeout in a stateful operator keeps the "
            "query alive — prefer event-time timeouts)"
        )
    spark = result.sparkSession
    return spark.table(query_name)
