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

#: Read schema when ``ts`` is parquet TIMESTAMP(MICROS): read as NTZ (the
#: file's true logical type, isAdjustedToUTC=false) and cast to TIMESTAMP
#: after the scan — identity values under the UTC session, and the type
#: event-time operators (watermarks, windows) require.  The batch loader
#: (tables.load_table) applies the same normalization, so stream schema ==
#: batch schema (asserted by the ingest-parity test).
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)

#: Schema when ``ts`` is parquet TIMESTAMP(NANOS) — Spark surfaces it as
#: LongType under ``spark.sql.legacy.parquet.nanosAsLong``; restored with
#: integer division after the read (see :func:`events_source`).
EVENTS_SCHEMA_NANOS = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def _ts_is_nanos(path: str) -> bool:
    """Sniff the stored unit of ``ts`` — the SAME detection the batch path
    uses (tables._nanos_timestamp_columns), so batch reads and stream
    sources can never disagree about event time.  Fixtures have flipped
    between TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across regenerations;
    hard-coding either unit silently shifts every timestamp by 1000x."""
    from excelstream_spark.tables import _nanos_timestamp_columns

    return "ts" in _nanos_timestamp_columns(path)


def _open_events_stream(
    spark: SparkSession, monitor_dir: str, probe_file: str, **options
) -> DataFrame:
    """THE single unit-sniffed stream opener — every events stream source
    goes through here so a future fixture-unit flip is a one-place fix
    (the round-3 regression existed precisely because this branch pair
    lived in two places and only one was updated)."""
    if _ts_is_nanos(probe_file):
        raw = spark.readStream.schema(EVENTS_SCHEMA_NANOS)
        for k, v in options.items():
            raw = raw.option(k, v)
        # integer division (not float) — nanos exceed double's 2^53
        return raw.parquet(monitor_dir).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    raw = spark.readStream.schema(EVENTS_SCHEMA)
    for k, v in options.items():
        raw = raw.option(k, v)
    return raw.parquet(monitor_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def events_source(spark: SparkSession, path: str) -> tuple[DataFrame, str]:
    """Build a unit-correct streaming source over events parquet.

    Returns ``(stream_df, monitored_dir)`` — the df always exposes ``ts``
    as TimestampType regardless of the file's stored unit.  The caller may
    symlink extra files into ``monitored_dir`` (e.g. for replay tests)."""
    import os

    if os.path.isfile(path):
        # the file-stream source monitors DIRECTORIES; expose a single file
        # through a temp dir of symlinks (read-only, nothing is copied)
        link_dir = tempfile.mkdtemp(prefix="esspark_stream_")
        os.symlink(path, os.path.join(link_dir, os.path.basename(path)))
        probe, path = path, link_dir
    else:
        probe = path
    return _open_events_stream(spark, path, probe), path


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over an events parquet directory/file with ``ts``
    restored to TimestampType whatever unit the files store."""
    df, _ = events_source(spark, path)
    return df


def replayed_events_stream(
    spark: SparkSession,
    src_file: str,
    link_dir: str | None = None,
    copies: int = 2,
) -> DataFrame:
    """Exact-redelivery source: the same events file symlinked ``copies``
    times into a monitored dir, one file per micro-batch
    (maxFilesPerTrigger=1).  Unit-sniffed like :func:`events_source`."""
    import os

    src_file = os.path.abspath(src_file)
    d = link_dir or tempfile.mkdtemp(prefix="esspark_replay_")
    for i in range(copies):
        os.symlink(src_file, os.path.join(d, f"batch{i + 1}.parquet"))
    return _open_events_stream(spark, d, src_file, maxFilesPerTrigger=1)


#: Read schema for the ``documents`` table as a stream source.
DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def replayed_docs_stream(
    spark: SparkSession,
    src_file: str,
    link_dir: str | None = None,
    copies: int = 2,
) -> DataFrame:
    """Exact-redelivery source over the ``documents`` table (same
    symlink-per-micro-batch mechanics as :func:`replayed_events_stream`).
    Documents carry no event time, so a deterministic synthetic ``ts``
    is derived from ``doc_id`` (base epoch + doc_id-spread seconds) —
    identical on every delivery, exactly like a replayed upstream queue
    would re-deliver the original ingest timestamps."""
    import os

    src_file = os.path.abspath(src_file)
    d = link_dir or tempfile.mkdtemp(prefix="esspark_docreplay_")
    for i in range(copies):
        os.symlink(src_file, os.path.join(d, f"batch{i + 1}.parquet"))
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return raw.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 600),
    )


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
