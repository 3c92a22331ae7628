"""Excel serial-date semantics, including the 1900 leap-year bug.

Excel stores dates/times as fractional days since its 1900 epoch where
serial 1.0 == 1900-01-01, and (for Lotus 1-2-3 compatibility) pretends
1900-02-29 existed (serial 60).  Hence for serial >= 61 the true date is
``1899-12-30 + serial`` days; for serial <= 59 it is ``1899-12-31 +
serial`` days; serial 60 itself renders as 1900-02-28 (matching the
reference implementation, see /root/reference/src/streaming_reader.rs:37-127
`parse_excel_date`).

Both Python-side converters (used per-cell inside the xlsx reader/writer)
and Spark column expressions (for bulk conversion of already-loaded serial
columns) are provided.  Unlike the reference, which formats to strings and
rounds to whole seconds, we keep native timestamps at microsecond
precision — the reference's behavior is a floor, not a spec (SURVEY.md
§1.2).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Excel's maximum serial: 9999-12-31.
MAX_SERIAL = 2958465.999

#: days from 1899-12-30 (the bug-absorbing epoch) to 1970-01-01, and
#: microseconds per day — shared by the columnar read (batch_scan) and
#: write (batch_write) serial arithmetic so the epoch lives in ONE place
EPOCH_1970_SERIAL = 25569
US_PER_DAY = 86_400_000_000

_EPOCH_GE60 = dt.date(1899, 12, 30)  # serial >= 60: epoch absorbs the bug
_EPOCH_LT60 = dt.date(1899, 12, 31)  # serial < 60: true 1900 calendar


def serial_to_datetime(serial: float) -> dt.datetime | None:
    """Serial number -> naive datetime (microsecond precision).
    Out-of-range serials return None (caller falls back to raw number)."""
    if not (1.0 <= serial <= MAX_SERIAL):
        return None
    days = int(serial)
    frac = serial - days
    epoch = _EPOCH_GE60 if days >= 60 else _EPOCH_LT60
    if days == 60:  # fictitious 1900-02-29 -> renders as 02-28 (ref behavior)
        days = 59
        epoch = _EPOCH_LT60
    date = epoch + dt.timedelta(days=days)
    micros = round(frac * 86400.0 * 1e6)
    return dt.datetime(date.year, date.month, date.day) + dt.timedelta(
        microseconds=micros
    )


def datetime_to_serial(value: dt.datetime | dt.date) -> float:
    """Datetime/date -> Excel serial (inverse of serial_to_datetime for
    dates >= 1900-03-01; pre-bug dates map onto the <60 range)."""
    if isinstance(value, dt.datetime):
        date, time = value.date(), value.time()
    else:
        date, time = value, dt.time()
    days = (date - _EPOCH_GE60).days
    if days < 61:  # before 1900-03-01: shift into the bug-free low range
        days -= 1
    frac = (time.hour * 3600 + time.minute * 60 + time.second) / 86400.0 + (
        time.microsecond / 86400.0 / 1e6
    )
    return days + frac


def excel_serial_to_timestamp(col) -> Column:
    """Bulk column conversion: serial double -> timestamp.

    Implemented as pure timestamp arithmetic (codegen'd):
    ``timestamp'1899-12-30' + serial*86400 seconds`` with the -1 day /
    leap-bug adjustment below serial 61.  NULL for out-of-range serials.
    """
    base = F.lit("1899-12-30 00:00:00").cast("timestamp")
    # serial < 60: true calendar, epoch one day later (+1); serial 60 is the
    # fictitious 1900-02-29 which renders as 02-28 (no shift); >= 61 no shift
    adjusted = F.when(col < 60, col + 1).otherwise(col)
    micros = (adjusted * F.lit(86400.0 * 1e6)).cast("long")
    # Excel serials are timezone-less -> emit TIMESTAMP_NTZ (cast via the
    # UTC session zone is lossless)
    result = F.timestamp_micros(F.unix_micros(base) + micros).cast("timestamp_ntz")
    return F.when((col >= 1.0) & (col <= MAX_SERIAL), result)


def timestamp_to_excel_serial(col) -> Column:
    """Bulk column conversion: timestamp (LTZ or NTZ) -> serial double.
    NTZ input is interpreted in the session zone (UTC) — identical naive
    wall-clock semantics either way."""
    base = F.lit("1899-12-30 00:00:00").cast("timestamp")
    days = (F.unix_micros(col.cast("timestamp")) - F.unix_micros(base)) / F.lit(
        86400.0 * 1e6
    )
    return F.when(days < 61, days - 1).otherwise(days)
