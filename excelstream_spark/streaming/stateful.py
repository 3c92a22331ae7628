"""Custom stateful streaming operators via ``applyInPandasWithState``.

The training-data shapes Structured Streaming does not ship as built-ins:

* ``streaming_dedup`` — exactly-once-per-key emission across micro-
  batches: the first event per key passes, replays/duplicates are
  dropped, and per-key state expires at an EVENT-TIME TTL past the
  watermark so state stays bounded on unbounded key spaces.  This is the
  streaming twin of the batch ``dedup_exact`` operator — the pattern a
  100 TB ingest pipeline uses to suppress re-delivered documents.
* ``user_activity_tracker`` — per-key running aggregates (count / sum /
  first-seen / last-seen) re-emitted on every batch the key appears in;
  the incremental-feature-store shape.

Both operators keep state per GROUP KEY, shuffled by Spark's state-store
partitioning — at scale state is distributed across executors and
checkpointed; nothing accumulates on the driver.

Reference parity note: the reference has no event-time/stateful
processing at all (SURVEY.md §2.7 — its "streaming" is constant-memory
file I/O); this module is part of the extension surface.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_DEDUP_STATE = StructType([StructField("seen", LongType())])

#: event-time TTLs (ms): how far past the watermark a key's state lives
_DEDUP_TTL_MS = 6 * 3_600_000
_TRACKER_TTL_MS = 24 * 3_600_000


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # idle key: drop the state, emit nothing (a later replay of this
        # key will pass again — TTL is the dedup horizon, bounded state)
        state.remove()
        return
    first_batch = not state.exists
    if first_batch:
        state.update((1,))
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # event-time TTL: the dedup horizon advances with the WATERMARK, so it
    # is deterministic under replay/reprocessing — and (unlike a
    # processing-time timeout) an availableNow catch-up run terminates
    # instead of spinning empty batches until wall-clock TTLs fire.
    # Anchored at max(watermark, batch event time): on the first batch
    # the watermark is still 0, and watermark+TTL alone would expire as
    # soon as the watermark jumps — dropping every key not re-seen in
    # the very next batch (a dup re-delivered 2+ batches later would be
    # re-admitted; caught by the 3-batch suppression test).
    ev_ms = (
        int(pdf["ts"].astype("int64").max() // 1_000_000) if len(pdf) else 0
    )
    state.setTimeoutTimestamp(
        max(state.getCurrentWatermarkMs(), ev_ms) + _DEDUP_TTL_MS
    )
    if first_batch:
        # emit ONE representative row for the key: the lowest event_id of
        # the first batch it appears in (deterministic under replays)
        rep = pdf.sort_values("event_id").head(1).copy()
        rep["key"] = str(key[0])
        yield rep[["key", "event_id", "ts", "user_id", "event_type", "value"]]


def streaming_dedup(
    events: DataFrame,
    key_col: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicate events by ``key_col`` across micro-batches.

    Emits each key's representative row exactly once (first batch the
    key is seen); subsequent deliveries are suppressed while the key's
    state lives.  State expires 6 event-time hours past the watermark —
    the dedup horizon.  At scale: state is hash-partitioned by key
    across the cluster's state stores; the shuffle carries only the key
    column plus the candidate rows.
    """
    keyed = events.withWatermark("ts", watermark).withColumn(
        "_k", F.col(key_col).cast("string")
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


TRACKER_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)

#: ``total`` is accumulated as int64 MICRO-units (value * 1e6, rounded),
#: not a running double: integer accumulation is order-independent and
#: drift-free over an unbounded stream, so the emitted total is exact for
#: inputs with <= 6 decimal digits regardless of micro-batch boundaries —
#: and it matches an exact-DECIMAL(18,6) batch sum bit-for-bit, which is
#: what lets the catalog oracle compare it without a rounding guard (a
#: round(x, 2) comparison is NOT boundary-safe when the true sum sits at
#: a .005 tie; summation-order ulps flip the rounded digit).
_TRACKER_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total_micros", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _tracker_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total_micros, first_us, last_us = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        # per-event quantization to micro-units, THEN integer sum: exact
        # and order-independent (see _TRACKER_STATE).  Ties (a value*1e6
        # landing exactly on .5) cannot occur for the <= 2-decimal inputs
        # this tracks; nearest-int agrees with a DECIMAL(18,6) cast.
        # fillna BEFORE the int64 cast: a NULL value is NaN here, and
        # NaN.astype(int64) is int64-min garbage (~-9.2e12 in the sum);
        # 0 contribution == the skipna semantics of a float sum AND of
        # the oracle's SQL SUM over a nullable column
        vals = pdf["value"].fillna(0.0).to_numpy()
        total_micros += int((vals * 1e6).round().astype("int64").sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, total_micros, first_us, last_us))
    # watermark-based TTL bounds state size; anchored at the key's last
    # event time for the same first-batch cold-start reason as _dedup_fn
    last_ms = (last_us or 0) // 1000
    state.setTimeoutTimestamp(
        max(state.getCurrentWatermarkMs(), last_ms) + _TRACKER_TTL_MS
    )
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_events": [n],
            # exact: int / 1e6 is one correctly-rounded IEEE division of
            # two exactly-representable operands -> the same double DuckDB
            # produces casting the exact DECIMAL(18,6) sum to DOUBLE
            "total_value": [total_micros / 1e6],
            "first_seen": [pd.Timestamp(first_us, unit="us")],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_activity_tracker(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Running per-user aggregates updated each micro-batch the user is
    active in (update-mode output).  The incremental-feature-store shape:
    downstream sinks upsert on user_id."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _tracker_fn,
            outputStructType=TRACKER_OUTPUT,
            stateStructType=_TRACKER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
