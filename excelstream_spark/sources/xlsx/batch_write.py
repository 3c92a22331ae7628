"""Columnar XLSX row serialization: Arrow RecordBatch -> worksheet XML bytes.

The scalar write path (writer_core.WorkbookWriter.write_row) builds each
cell with Python calls; profiled at sf0.1 that is ~60% of single-thread
write time (the rest is zip deflate).  This module serializes a whole
RecordBatch at once instead:

1. per column, value TEXT is produced in bulk (ndarray.astype — verified
   bit-identical to Python repr() for float64 by test + 200k-value fuzz;
   vectorized Excel-serial arithmetic for dates/timestamps, operation-
   for-operation the float expression of dates.datetime_to_serial,
   1900 leap-bug included),
2. the XML is assembled with ONE ``''.join`` over interleaved streams —
   constant fragments via itertools.repeat, per-row pieces as C-level
   lists — no per-cell Python calls and no intermediate string arrays
   (np.char elementwise concat measured 4x slower than the join).

Columns carrying nulls or special strings (XML entities, control chars,
leading '=' formulas) drop to a per-row fragment comprehension for THAT
column only — same output, still one join.  Combined with
DataSourceArrowWriter feeding the sink Arrow batches (no per-row pickle
across the JVM boundary), this is the write-side mirror of batch_scan.py.

Semantics are exactly write_row's, by construction and by byte-equality
test (tests/test_xlsx.py): same cell XML for every scalar type, same
``r=`` refs (so batch_scan's rectangular fast read path applies), same
null cells, same escaping via the same ooxml.esc.

Non-scalar columns (array/map/struct/binary) and shared-strings mode use
the row writer instead — selected at plan time in datasource.writer().
"""

from __future__ import annotations

from itertools import chain, repeat

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import types as T

from excelstream_spark.sources.xlsx import ooxml
from excelstream_spark.sources.xlsx.dates import EPOCH_1970_SERIAL, US_PER_DAY

#: Spark types the vectorized writer handles; anything else -> row writer
VECTOR_TYPES = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def vectorizable(schema: T.StructType) -> bool:
    return all(isinstance(f.dataType, VECTOR_TYPES) for f in schema.fields)


#: strings needing per-element care: XML entities, control chars (incl.
#: bare \r, escaped numerically), or a leading '=' (formula passthrough)
_SPECIAL_RE = r"""^=|[&<>"'\x00-\x1f]"""


def _special_str_frag(ref: str, s_attr: str, v: str) -> str:
    """Scalar fragment for flagged strings — mirrors _cell_xml exactly."""
    if v.startswith("="):
        return f'<c r="{ref}"{s_attr}><f>{ooxml.esc(v[1:])}</f></c>'
    return (
        f'<c r="{ref}"{s_attr} t="inlineStr"><is>'
        f'<t xml:space="preserve">{ooxml.esc(v)}</t></is></c>'
    )


def _null_mask(col: pa.Array) -> np.ndarray:
    return col.is_null().to_numpy(zero_copy_only=False)


class _ColumnStreams:
    """Accumulates the interleaved piece streams for one batch."""

    def __init__(self, rownum: list[str]):
        self.rownum = rownum
        self.streams: list = []

    def const(self, s: str) -> None:
        self.streams.append(repeat(s))

    def var(self, pieces: list) -> None:
        self.streams.append(pieces)

    def cell(
        self,
        letter: str,
        mid,
        body,
        null_mask: np.ndarray,
        post: str,
    ) -> None:
        """One `<c r="L{row}{mid}{body}{post}` cell per row.  ``mid`` /
        ``body`` are str-or-list (list = per-row).  Null rows become
        `<c r="REF"/>` — with any null present the column drops to a
        fragment comprehension (same output, one stream)."""
        if not null_mask.any():
            self.const(f'<c r="{letter}')
            self.var(self.rownum)
            if isinstance(mid, str):
                self.const(mid)
            else:
                self.var(mid)
            self.var(body)
            self.const(post)
            return
        mids = repeat(mid) if isinstance(mid, str) else mid
        frags = [
            f'<c r="{letter}{r}"/>' if nu else f'<c r="{letter}{r}{m}{v}{post}'
            for r, m, v, nu in zip(self.rownum, mids, body, null_mask.tolist())
        ]
        self.var(frags)

    def render(self, n: int) -> bytes:
        return "".join(chain.from_iterable(zip(*self.streams))).encode("utf-8")


def _serial_parts(micros: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Epoch microseconds -> (Excel serial float64, micros-in-day).
    Operation-for-operation the scalar datetime_to_serial expression."""
    days70 = micros // US_PER_DAY
    in_day = micros - days70 * US_PER_DAY
    days = days70 + EPOCH_1970_SERIAL
    days = np.where(days < 61, days - 1, days)
    secs = in_day // 1_000_000
    us = in_day % 1_000_000
    frac = secs / 86400.0 + us / 86400.0 / 1e6
    return days + frac, in_day


def _append_column(
    out: _ColumnStreams,
    col: pa.Array,
    dtype: T.DataType,
    letter: str,
    style: int | None,
) -> None:
    s_attr = f' s="{style}"' if style else ""
    nulls = _null_mask(col)

    if isinstance(dtype, T.BooleanType):
        vals = pc.fill_null(col, False).to_numpy(zero_copy_only=False)
        body = np.where(vals, "1", "0").tolist()
        out.cell(letter, f'"{s_attr} t="b"><v>', body, nulls, "</v></c>")
    elif isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        vals = pc.fill_null(col.cast(pa.int64()), 0).to_numpy()
        out.cell(letter, f'"{s_attr}><v>', vals.astype("U20").tolist(), nulls, "</v></c>")
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        # float32 widens to binary64 first — same widening the row path
        # gets from Spark's Row conversion, so repr digits agree
        vals = pc.fill_null(col.cast(pa.float64()), 0.0).to_numpy()
        out.cell(letter, f'"{s_attr}><v>', vals.astype("U32").tolist(), nulls, "</v></c>")
    elif isinstance(dtype, T.DecimalType):
        # the row writer stringifies Decimal and writes an inline string;
        # Arrow's decimal->utf8 cast preserves scale digits identically
        _append_column(out, col.cast(pa.string()), T.StringType(), letter, style)
    elif isinstance(dtype, T.DateType):
        days = pc.fill_null(col.cast(pa.int32()), 0).to_numpy().astype(np.int64)
        serial = days + EPOCH_1970_SERIAL
        serial = np.where(serial < 61, serial - 1, serial).astype(np.float64)
        # the row path's date branch writes s= unconditionally — style 0
        # included — so match `is None`, not truthiness
        s = f' s="{style}"' if style is not None else f' s="{ooxml.STYLE_DATE}"'
        out.cell(letter, f'"{s}><v>', serial.astype("U32").tolist(), nulls, "</v></c>")
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # tz-aware columns: the row path receives session-local wall-clock
        # datetimes, so serialize the LOCAL timestamp, not the UTC instant
        # (equal under the library default UTC session, divergent otherwise)
        if getattr(col.type, "tz", None):
            col = pc.local_timestamp(col)
        micros = pc.fill_null(col.cast(pa.int64()), 0).to_numpy()
        serial, in_day = _serial_parts(micros)
        body = serial.astype("U32").tolist()
        if style is not None:  # explicit style (0 included) — row-path parity
            mid: str | list = f'" s="{style}"><v>'
        else:  # per-value style: midnight -> date format, else datetime
            mid = np.where(
                in_day == 0,
                f'" s="{ooxml.STYLE_DATE}"><v>',
                f'" s="{ooxml.STYLE_DATETIME}"><v>',
            ).tolist()
        out.cell(letter, mid, body, nulls, "</v></c>")
    elif isinstance(dtype, T.StringType):
        special = pc.match_substring_regex(
            pc.fill_null(col, ""), _SPECIAL_RE
        ).to_numpy(zero_copy_only=False)
        vals = col.to_numpy(zero_copy_only=False)  # object ndarray
        mid = f'"{s_attr} t="inlineStr"><is><t xml:space="preserve">'
        post = "</t></is></c>"
        if not special.any():
            out.cell(letter, mid, vals.tolist(), nulls, post)
            return
        frags = [
            f'<c r="{letter}{r}"/>'
            if nu
            else (
                _special_str_frag(f"{letter}{r}", s_attr, v)
                if sp
                else f'<c r="{letter}{r}{mid}{v}{post}'
            )
            for r, v, nu, sp in zip(
                out.rownum, vals.tolist(), nulls.tolist(), special.tolist()
            )
        ]
        out.var(frags)
    else:  # pragma: no cover — writer() routes these to the row path
        raise TypeError(f"batch writer cannot serialize {dtype}")


def batch_to_rows_xml(
    batch: pa.RecordBatch,
    schema: T.StructType,
    start_row: int,
    col_styles: list[int | None] | None = None,
    row_height: float | None = None,
) -> bytes:
    """Serialize a RecordBatch to `<row>...</row>` XML, first row numbered
    ``start_row`` (1-based).  Byte-equivalent to write_row() per row."""
    n = batch.num_rows
    if n == 0:
        return b""
    rownum = np.arange(start_row, start_row + n, dtype=np.int64).astype("U7").tolist()
    out = _ColumnStreams(rownum)
    out.const('<row r="')
    out.var(rownum)
    if row_height is not None:
        out.const(f'" ht="{row_height:g}" customHeight="1">')
    else:
        out.const('">')
    for ci, field in enumerate(schema.fields):
        style = None
        if col_styles is not None and ci < len(col_styles):
            style = col_styles[ci]
        _append_column(out, batch.column(ci), field.dataType, ooxml.col_letter(ci), style)
    out.const("</row>")
    return out.render(n)
