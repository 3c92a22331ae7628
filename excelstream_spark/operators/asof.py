"""As-of join (point-in-time join): for each left row, attach the most
recent right row whose time is <= the left row's time, per key.

Reference parity: the reference (an I/O library, SURVEY.md §2.7) has no
joins at all; this is extension surface, shaped after kdb/pandas
merge_asof semantics.

Scale design
------------
The naive formulation — range join (``r.time <= l.time``) followed by a
row_number dedup — produces |left_key_rows| x |right_key_rows| intermediate
rows per key before pruning, which is quadratic for hot keys.  Instead we
use the classic union + window forward-fill:

1. union left and right rows into one stream with a shared (key, time) pair,
2. one shuffle: partition by key, sort by (time, side, tie_break),
3. forward-fill the right-side payload with ``last(..., ignorenulls=True)``,
4. keep only left rows.

Cost: a single shuffle of |left| + |right| rows and a per-partition sort —
the same as a sort-merge join, with no intermediate blow-up.  This is the
strategy that survives 100 TB fact tables.

Tie semantics: right rows sort *before* left rows at equal time (inclusive
<=); among equal-time right rows the one with the greatest ``tie_break``
wins (deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_KEY = "__asof_key"
_TIME = "__asof_time"
_SIDE = "__asof_is_left"  # 0 = right (sorts first at equal time), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_time: str,
    right_time: str,
    left_by: str,
    right_by: str,
    right_values: Sequence[str],
    tie_break: str | None = None,
    how: str = "left",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Attach the latest ``right_values`` (as of ``left_time``) to each left row.

    how='left' keeps unmatched left rows (right values null);
    how='inner' drops them.

    direction='backward' (default): most recent right row with
    time <= left time.  direction='forward': earliest right row with
    time >= left time.

    ``tolerance`` bounds the time gap (pandas merge_asof semantics):
    a number for numeric time columns, or a Spark interval string
    (e.g. ``"30 days"``) for timestamps; matches farther away than the
    tolerance are treated as no-match.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    right_payload = list(right_values)
    _PAYLOAD = "__asof_payload"
    _RTIME = "__asof_rtime"

    left_cols = left.columns
    rt = dict(right.dtypes)[right_time]
    # Payload travels as ONE struct so the forward-fill always yields a
    # consistent snapshot of a single right row (filling columns
    # independently could mix rows when a payload value is null); the
    # right row's own time rides along for the tolerance check.
    r = right.select(
        F.col(right_by).alias(_KEY),
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(right_time).alias(_RTIME),
            *[F.col(c) for c in right_payload],
        ).alias(_PAYLOAD),
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
    )
    payload_type = (
        "struct<"
        + ",".join(
            [f"{_RTIME}:{rt}"]
            + [f"{c}:{dict(right.dtypes)[c]}" for c in right_payload]
        )
        + ">"
    )
    l = left.select(
        F.col(left_by).alias(_KEY),
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        *left_cols,
    )

    unioned = l.unionByName(r)

    # backward: scan time ascending, fill from the most recent earlier
    # right row.  forward: scan time DESCENDING — the fill then carries
    # the nearest later right row.  Either way right rows sort before
    # left rows at equal time (inclusive match).
    time_order = F.col(_TIME).asc() if direction == "backward" else F.col(_TIME).desc()
    order = [time_order, F.col(_SIDE).asc()]
    if tie_break is not None:
        # among equal-time right rows the greatest tie_break sorts last and
        # therefore wins the forward fill (deterministic)
        order.append(F.col(_PAYLOAD)[tie_break].asc_nulls_first())
    w = (
        W.partitionBy(_KEY)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    filled = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        gap_hi = (
            F.col(_PAYLOAD)[_RTIME] + F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.col(_PAYLOAD)[_RTIME] + F.lit(tolerance)
        )
        within = (
            F.col(_TIME) <= gap_hi
            if direction == "backward"
            else F.col(_TIME) >= (
                F.col(_PAYLOAD)[_RTIME] - F.expr(f"INTERVAL {tolerance}")
                if isinstance(tolerance, str)
                else F.col(_PAYLOAD)[_RTIME] - F.lit(tolerance)
            )
        )
        out = out.withColumn(
            _PAYLOAD, F.when(within, F.col(_PAYLOAD))  # else NULL: out of range
        )
    if how == "inner":
        out = out.filter(F.col(_PAYLOAD).isNotNull())
    return out.select(
        *left_cols,
        *[F.col(_PAYLOAD)[c].alias(c) for c in right_payload],
    )
