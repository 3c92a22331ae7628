"""Columnar batch scanner for xlsx worksheets — the fast read path.

The streaming row reader (reader_core.iter_rows) types every cell with
Python calls; at ~20k rows/s/thread that is the throughput floor the
reference's single-thread numbers (src/streaming_reader.rs:143-147,
60-85k rows/s) would beat.  This module reads the same worksheet XML in
large ``</row>``-aligned chunks and processes them COLUMNARLY:

1. one compiled-regex ``findall`` extracts every cell of the chunk (C),
2. if the chunk is perfectly rectangular — cell count == rows x ncol and
   every column-stride carries a single column letter — each column is a
   C-level list slice; no per-cell Python runs at all,
3. per column, values convert in bulk: shared-string indices via an Arrow
   ``take`` on the SST, numerics via Arrow string->int64/float64 casts,
   date-styled serials via vectorized numpy arithmetic (identical
   semantics to dates.serial_to_datetime, 1900-leap-bug included).

Anything the scanner cannot prove it handled — cell-count mismatch
(formulas, rich text, unusual attribute order), non-rectangular rows,
values Arrow's strict casts reject — falls back per CHUNK to an
ElementTree fragment parse with the exact per-cell semantics of
reader_core (and per COLUMN to scalar typing), so the fast path is a
pure optimization: byte-identical results, verified by
tests/test_xlsx.py::test_batch_reader_matches_row_reader and the
driver's xlsx_roundtrip_lineitem oracle.

Measured (local[32], sf0.1 lineitem, 600k rows over 32 part files):
single-thread 21k -> 68k rows/s (3.2x); Spark-level warm read
~370k -> ~650k rows/s wall.  The Arrow batches feed Spark's Python
data source directly (one RecordBatch per 8 MB XML chunk).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html import unescape  # superset of XML entities incl. &quot;/&apos;/&#NN;

import typing

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import types as T

from excelstream_spark.sources.xlsx.dates import (
    EPOCH_1970_SERIAL as _EPOCH_1970_SERIAL,
    MAX_SERIAL,
    US_PER_DAY as _US_PER_DAY,
)

#: One token per cell.  Groups: 0 column letters, 1 remaining attrs blob,
#: 2 self-close flag, 3 <v> text, 4 inline-string <t> text.  Cells with
#: other shapes (formulas <f>, multi-run rich text, prefixed namespaces,
#: reordered attributes) simply do not match — the per-chunk coverage
#: check (matched cells == literal "<c " count) catches that and routes
#: the chunk to the ElementTree fallback.
_CELL_RE = re.compile(
    r'<c r="([A-Z]+)\d+"([^>]*?)'
    r"(?:(/)>"
    r"|><v>([^<]*)</v></c>"
    r"|><is><t(?: [^>]*)?>([^<]*)</t></is></c>"
    r"|><is><t(?: [^>]*)?/></is></c>"
    r")"
)

_T_ATTR_RE = re.compile(r' t="([^"]+)"')
_S_ATTR_RE = re.compile(r' s="(\d+)"')
_ROW_OPEN_RE = re.compile(r"<row[ />]")  # \b alone would skip <row/> vs <rowBreaks>
_ROW_SELFCLOSE_RE = re.compile(r"<row\b[^>]*/>")


def to_arrow_schema(schema: T.StructType) -> pa.Schema:
    """Spark schema -> pyarrow schema for RecordBatch-yielding readers."""
    mapping = {
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.DoubleType(): pa.float64(),
        T.FloatType(): pa.float32(),
        T.BooleanType(): pa.bool_(),
        T.StringType(): pa.string(),
        T.DateType(): pa.date32(),
        T.TimestampNTZType(): pa.timestamp("us"),
        T.TimestampType(): pa.timestamp("us", tz="UTC"),
        T.BinaryType(): pa.binary(),
    }
    fields = []
    for f in schema.fields:
        pa_t = mapping.get(f.dataType)
        if pa_t is None:
            raise ValueError(
                f"xlsx arrow reader: unsupported column type {f.dataType} "
                f"for {f.name!r}; set arrowBatches=false"
            )
        fields.append(pa.field(f.name, pa_t, nullable=True))
    return pa.schema(fields)


def _iter_xml_chunks(fh, chunk_bytes: int = 8 << 20):
    """Yield the worksheet XML as text chunks split on </row> boundaries
    (constant memory: one chunk of decompressed XML at a time)."""
    buf = b""
    while True:
        data = fh.read(chunk_bytes)
        if not data:
            if buf:
                yield buf.decode("utf-8")
            return
        buf += data
        cut = buf.rfind(b"</row>")
        if cut < 0:
            continue
        cut += len(b"</row>")
        yield buf[:cut].decode("utf-8")
        buf = buf[cut:]


def _serials_to_us(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized dates.serial_to_datetime: float serials -> (epoch
    microseconds int64, valid mask).  Serial 60 (the fictitious
    1900-02-29) needs no branch: 1899-12-30 + 60 days == 1900-02-28,
    exactly what the scalar converter renders."""
    valid = np.isfinite(vals) & (vals >= 1.0) & (vals <= MAX_SERIAL)
    clean = np.where(valid, vals, 2.0)
    days = np.floor(clean)
    adj = days.astype(np.int64) + (days < 60)
    micros = np.rint((clean - days) * 86400.0 * 1e6).astype(np.int64)
    return (adj - _EPOCH_1970_SERIAL) * _US_PER_DAY + micros, valid


class _Kind(typing.NamedTuple):
    """Resolved cell kind for one attrs blob: (t attribute, date-styled).
    Value equality matters: one column's cells may carry different attr
    blobs (varying s= indices) that resolve to the same kind."""

    t: str | None
    is_date: bool


class BatchSheetReader:
    """Reads one worksheet as pyarrow RecordBatches against a declared
    Spark schema, with reader_core-identical semantics."""

    def __init__(
        self,
        wb,
        sheet: str | int,
        schema: T.StructType,
        header: bool,
        schema_mode: str = "realign",
        limit: int | None = None,
        init_remap: list[int | None] | None = None,
    ):
        self.wb = wb
        self.sheet = sheet
        self.schema = schema
        self.header = header
        self.schema_mode = schema_mode
        self.limit = limit
        self.pa_schema = to_arrow_schema(schema)
        self._kind_cache: dict[str, _Kind] = {}
        self._col_of: dict[str, int] = {}
        self._sst_pa: pa.Array | None = None
        #: source-column index for each schema field (None until the
        #: header row resolves it; identity when headers match positions).
        #: init_remap pre-resolves headerless columns-pruned reads.
        self._remap: list[int | None] | None = init_remap

    # -- metadata ----------------------------------------------------------

    def _kind(self, blob: str) -> _Kind:
        k = self._kind_cache.get(blob)
        if k is None:
            m = _T_ATTR_RE.search(blob)
            t = m.group(1) if m else None
            if t == "n":  # explicit numeric == untyped (reader_core parity)
                t = None
            is_date = False
            if t is None:
                ms = _S_ATTR_RE.search(blob)
                if ms and int(ms.group(1)) in self.wb.date_styles:
                    is_date = True
            k = _Kind(t, is_date)
            self._kind_cache[blob] = k
        return k

    def _sst_array(self) -> pa.Array:
        if self._sst_pa is None:
            self._sst_pa = pa.array(self.wb.sst, type=pa.string())
        return self._sst_pa

    # -- driver ------------------------------------------------------------

    def batches(self):
        entry = self.wb.resolve_sheet(self.sheet)
        first = True
        remaining = self.limit
        # small-limit reads shouldn't decompress 8 MB for 5 rows: start
        # with a chunk sized to the limit and let the iterator grow back
        chunk_bytes = 8 << 20
        if remaining is not None:
            chunk_bytes = min(chunk_bytes, max(64 << 10, remaining * 512))
        with self.wb.open_entry(entry) as fh:
            for text in _iter_xml_chunks(fh, chunk_bytes):
                batch = self._chunk_to_batch(text, skip_header=first and self.header)
                first = False
                if batch is None or not batch.num_rows:
                    continue
                if remaining is not None:
                    if batch.num_rows >= remaining:
                        yield batch.slice(0, remaining)
                        return
                    remaining -= batch.num_rows
                yield batch

    # -- per-chunk ---------------------------------------------------------

    def _chunk_to_batch(self, text: str, skip_header: bool) -> pa.RecordBatch | None:
        # every <row> spelling counts: missing one silently DROPS rows the
        # row reader would yield (e.g. bare self-closed <row/>)
        n_rows = text.count("<row ") + text.count("<row>") + text.count("<row/>")
        if n_rows == 0:
            return None
        cells = _CELL_RE.findall(text)
        n_cells = text.count("<c ") + text.count("<c>")
        columns = None
        if len(cells) == n_cells and n_cells % n_rows == 0:
            ncol = n_cells // n_rows
            columns = self._columnize_rectangular(cells, n_rows, ncol)
        if columns is None:
            rows = self._rows_via_et(text)
            return self._batch_from_rows(rows, skip_header)
        return self._batch_from_columns(columns, n_rows, text, skip_header)

    def _columnize_rectangular(self, cells, n_rows: int, ncol: int):
        """Split the flat cell-token list into per-column slices; None if
        the stride structure doesn't prove strict rectangularity."""
        if ncol == 0:
            return []
        letters = [m[0] for m in cells]
        cols = []
        seen = set()
        for j in range(ncol):
            lset = set(letters[j::ncol])
            if len(lset) != 1:
                return None
            seen |= lset
            cols.append(
                (
                    [m[1] for m in cells[j::ncol]],  # attr blobs
                    [m[2] for m in cells[j::ncol]],  # self-close flags
                    [m[3] for m in cells[j::ncol]],  # <v> texts
                    [m[4] for m in cells[j::ncol]],  # inline texts
                )
            )
        if len(seen) != ncol:  # duplicate letters across strides
            return None
        return cols

    # -- columnar conversion ----------------------------------------------

    def _batch_from_columns(self, columns, n_rows, text, skip_header):
        has_amp = "&" in text
        if skip_header:
            header_vals = []
            for blobs, scs, vs, ts in columns:
                k = self._kind(blobs[0])
                v = ts[0] if k.t == "inlineStr" else vs[0]
                header_vals.append(unescape(v) if has_amp and "&" in v else v)
            self._resolve_remap(header_vals)
            columns = [
                (blobs[1:], scs[1:], vs[1:], ts[1:])
                for blobs, scs, vs, ts in columns
            ]
            n_rows -= 1
            if n_rows == 0:
                return None
        fields = self.schema.fields
        arrays = []
        for fi, field in enumerate(fields):
            si = self._source_index(fi)
            if si is None or si >= len(columns):
                arrays.append(pa.nulls(n_rows, type=self.pa_schema.field(fi).type))
                continue
            blobs, scs, vs, ts = columns[si]
            # kind over LIVE cells only: self-closed (null) cells carry a
            # bare/attr-less blob that would otherwise mix kinds
            kinds = {self._kind(b) for b, sc in zip(blobs, scs) if not sc}
            arr = None
            if not kinds:  # every cell self-closed -> all-null column
                arrays.append(pa.nulls(n_rows, type=self.pa_schema.field(fi).type))
                continue
            if len(kinds) == 1:
                arr = self._convert_uniform(
                    next(iter(kinds)), scs, vs, ts, field.dataType,
                    self.pa_schema.field(fi).type, has_amp,
                )
            if arr is None:  # mixed kinds or strict-cast failure: scalar path
                arr = self._convert_scalar(blobs, scs, vs, ts, field.dataType, fi, has_amp)
            arrays.append(arr)
        return pa.RecordBatch.from_arrays(arrays, schema=self.pa_schema)

    def _convert_uniform(self, kind, scs, vs, ts, dtype, pa_type, has_amp):
        """Bulk-convert one uniform-kind column; None => use scalar path.
        Arrow's casts are STRICTLY narrower than the scalar coercion
        (they fail where Python's lenient parsing would succeed), so a
        successful vector cast always equals the scalar result."""
        try:
            vals: list = ts if kind.t == "inlineStr" else vs
            if "/" in set(scs):  # self-closed cells -> no value
                vals = [None if s else v for s, v in zip(scs, vals)]
            if kind.t is None:  # plain numeric (possibly date-styled)
                if "" in vals:
                    vals = [v if v else None for v in vals]
                if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
                    f = pa.array(vals, type=pa.string()).cast(pa.float64())
                    np_f = f.to_numpy(zero_copy_only=False)
                    us, valid = _serials_to_us(np_f)
                    return pa.array(us, type=pa.int64(), mask=~valid).cast(pa_type)
                if kind.is_date:
                    # date-styled cell typed as datetime scalar-side; its
                    # coercion to numeric/string/date targets must go
                    # through the scalar path (e.g. long target -> None)
                    return None
                if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType)):
                    return pa.array(vals, type=pa.string()).cast(pa_type)
                return None  # string/bool targets keep scalar formatting
            if kind.t == "s":  # shared strings
                idx = pa.array(vals, type=pa.string()).cast(pa.int64())
                strs = pc.take(self._sst_array(), idx)
                if isinstance(dtype, T.StringType):
                    return strs
                if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType)):
                    return strs.cast(pa_type)
                return None
            if kind.t in ("inlineStr", "str"):
                if has_amp:
                    vals = [
                        unescape(v) if v and "&" in v else v for v in vals
                    ]
                if isinstance(dtype, T.StringType):
                    return pa.array(vals, type=pa.string())
                if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType)):
                    return pa.array(
                        [v if v else None for v in vals], type=pa.string()
                    ).cast(pa_type)
                return None
            if kind.t == "b":
                if isinstance(dtype, T.BooleanType):
                    return pa.array(
                        [None if v is None else v == "1" for v in vals],
                        type=pa.bool_(),
                    )
                return None
            return None  # errors ('e') and anything else: scalar path
        except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, OverflowError):
            return None

    def _convert_scalar(self, blobs, scs, vs, ts, dtype, fi, has_amp):
        """Per-cell fallback with reader_core semantics (typed value ->
        lenient coerce); used for mixed-kind columns and values Arrow's
        strict casts reject."""
        from excelstream_spark.sources.xlsx.reader_core import _coerce

        out = []
        for blob, sc, v, t in zip(blobs, scs, vs, ts):
            k = self._kind(blob)
            raw = ts_v = t if k.t == "inlineStr" else v
            if sc:
                typed = None
            else:
                if has_amp and ts_v and "&" in ts_v:
                    raw = unescape(ts_v)
                typed = self._typed(raw, k)
            out.append(_coerce(typed, dtype))
        return pa.array(out, type=self.pa_schema.field(fi).type)

    def _typed(self, raw: str, k: _Kind):
        """Scalar typing identical to reader_core._typed_value, driven by
        a resolved kind."""
        wb = self.wb
        if k.t == "s":
            try:
                return wb.sst[int(raw)]
            except (ValueError, IndexError):
                return raw
        if k.t in ("inlineStr", "str"):
            return raw
        if k.t == "b":
            return raw.strip() == "1"
        if k.t == "e":
            from excelstream_spark.sources.xlsx.reader_core import ExcelError

            return ExcelError(raw)
        if raw == "":
            return None
        try:
            num = float(raw)
        except ValueError:
            return raw
        if k.is_date:
            from excelstream_spark.sources.xlsx.dates import serial_to_datetime

            converted = serial_to_datetime(num)
            if converted is not None:
                return converted
        if num.is_integer() and "." not in raw and "e" not in raw.lower():
            return int(raw)
        return num

    # -- ET fragment fallback ----------------------------------------------

    def _rows_via_et(self, text: str) -> list[list]:
        """Chunk-level fallback: parse the chunk's <row> elements with
        ElementTree and type per cell — exact reader_core.iter_rows
        semantics for shapes the regex scanner doesn't cover (formulas,
        rich text, attribute reordering, missing cells)."""
        m_start = _ROW_OPEN_RE.search(text)
        if m_start is None:
            return []
        end = text.rfind("</row>")
        endpos = end + len("</row>") if end >= 0 else -1
        # a trailing self-closed row (<row r="9"/>) can sit past the last
        # </row>; the slice must include it or the row silently vanishes
        for m in _ROW_SELFCLOSE_RE.finditer(text, m_start.start()):
            endpos = max(endpos, m.end())
        if endpos < 0:
            return []
        root = ET.fromstring("<R>" + text[m_start.start() : endpos] + "</R>")
        from excelstream_spark.sources.xlsx import ooxml

        wb = self.wb
        col_cache: dict[str, int] = {}
        rows: list[list] = []
        for relem in root:
            if relem.tag.rsplit("}", 1)[-1] != "row":
                continue
            row: list = []
            for c in relem:
                if c.tag.rsplit("}", 1)[-1] != "c":
                    continue
                ref = c.get("r")
                if ref is None:
                    cell_col = len(row)
                else:
                    letters = ref.rstrip("0123456789")
                    cell_col = col_cache.get(letters)
                    if cell_col is None:
                        cell_col = ooxml.letter_to_index(letters)
                        col_cache[letters] = cell_col
                value_parts = []
                is_text_run = False
                for child in c.iter():
                    tag = child.tag.rsplit("}", 1)[-1]
                    if tag == "v":
                        if child.text is not None:
                            value_parts.append(child.text)
                    elif tag == "t":
                        is_text_run = True
                        if child.text is not None:
                            value_parts.append(child.text)
                while len(row) < cell_col:
                    row.append(None)
                row.append(
                    wb.typed_value(
                        "".join(value_parts), c.get("t"), c.get("s"),
                        had_text_run=is_text_run,
                    )
                )
            rows.append(row)
        return rows

    def _batch_from_rows(self, rows: list[list], skip_header: bool):
        from excelstream_spark.sources.xlsx.reader_core import coerce_row

        if skip_header and rows:
            self._resolve_remap([None if v is None else str(v) for v in rows[0]])
            rows = rows[1:]
        if not rows:
            return None
        remap = self._remap
        n = len(self.schema.fields)
        cols: list[list] = [[] for _ in range(n)]
        for row in rows:
            if remap is not None:
                row = [
                    row[i] if i is not None and i < len(row) else None
                    for i in remap
                ]
            out = coerce_row(row, self.schema)
            for i in range(n):
                cols[i].append(out[i])
        arrays = [
            pa.array(c, type=self.pa_schema.field(i).type)
            for i, c in enumerate(cols)
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=self.pa_schema)

    # -- header realignment ------------------------------------------------

    def _resolve_remap(self, header_vals: list) -> None:
        """Match datasource._read_rows: realign this sheet's columns to
        the global schema by header name, under the same sheetSchemaMode
        policy (reader_core.resolve_header_remap)."""
        from excelstream_spark.sources.xlsx.reader_core import resolve_header_remap

        self._remap = resolve_header_remap(
            header_vals, self.schema, self.schema_mode
        )

    def _source_index(self, field_index: int) -> int | None:
        if self._remap is None:
            return field_index
        return self._remap[field_index]
