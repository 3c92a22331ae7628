"""Spark Python Data Source for XLSX: ``format("xlsx")`` read and write.

Read path (reference S1-S5 semantics, Spark-shaped):
  schema() on the driver samples the first file/sheet (SST + first
  ``samplingRows`` rows); partitions() yields one partition per
  (file, sheet) — a worksheet is one deflate stream and cannot be split
  mid-sheet (same constraint the reference has, streaming_reader.rs:18),
  so parallelism comes from many files / many sheets.  A directory of
  part-workbooks written by this sink is therefore read fully in parallel.

Write path (reference K1-K8): each partition streams one part-workbook
(``part-NNNNN.xlsx``) with constant memory; commit() writes _SUCCESS.
``singleFile=true`` + a single partition (coalesce(1)) emits exactly the
target path as one workbook — the Excel-openable mode.

Options (read):  sheetName | sheetIndex, header (default true),
  inferSchema (default true), samplingRows (default 200),
  sheetSchemaMode (realign | union | strict, default realign — policy
  for sheets whose headers don't match the schema: realign by name when
  fully resolvable, union-by-name with null-fill + widened inference,
  or fail fast; see reader_core.resolve_header_remap),
  batchReader (default true — columnar regex+Arrow scan with exact
  per-chunk fallback; false forces the per-cell row reader),
  arrowBatches (default true), arrowBatchSize (row-reader batching),
  columns ("a,b" — prune the scan to the named columns; Spark 4.1's
  Python DS API has no pruneColumns hook, so pruning is an explicit
  option), limitRows (N — each partition stops scanning after N data
  rows; the early-stop analogue of limit pushdown for df.limit(N))

The source also implements a STREAM reader: ``spark.readStream
.format("xlsx")`` watches a directory and processes each new workbook
exactly once (offsets = the processed-file set, checkpointed; bound
them with maxFileAgeSec), and a STREAM writer: ``df.writeStream
.format("xlsx")`` lands each micro-batch as deterministic
``batch-<id>-part-<pid>.xlsx`` workbooks (idempotent on replay, temp
files invisible to readers).  Note
Spark's PythonMicroBatchStream executes availableNow as a single batch
per run — incremental pickup across restarts is exact either way.

The reader implements ``pushFilters`` (Spark 4.1 Python Data Source
filter pushdown): with ``option("pushdown", true)``, comparison / null /
IN / string-match predicates are evaluated during row parsing, so
filtered-out rows never cross the Arrow boundary — the xlsx analogue of
parquet PushedFilters.  OPT-IN because Spark's planner can reuse a
cached filtered scan for a later filterless query on the same DataFrame
(see XlsxReader.pushFilters); enable it for write-once-read-once ETL
frames.  Requires ``spark.sql.python.filterPushdown.enabled=true`` (set
by register_xlsx).
Options (write): sheetName, header (default true), compression (0-9,
  default 6), useSharedStrings, sheetProtectPassword, singleFile,
  maxRowsPerSheet (default 1,048,576 -> auto-split),
  columnWidths ("20,12,8" positional, blank to skip a column),
  rowHeight (points) — widths/heights actually emitted, unlike the
  reference's no-op stubs (writer.rs:375-412),
  columnStyles ("currency,,percent" positional style names from the
  fixed style table — reference K4 write_row_styled semantics)
"""

from __future__ import annotations

import glob
import os
import re
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from excelstream_spark.sources.xlsx.reader_core import (
    WorkbookReader,
    coerce_row,
    infer_schema,
    merge_schemas,
    resolve_header_remap,
)
from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter


def _truthy(value: str | bool | None, default: bool = False) -> bool:
    if value is None:
        return default
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("1", "true", "yes", "y")


def _local_path(path: str) -> str:
    """Normalize a ``file:``/``file://`` URI to a plain local path.  The
    xlsx DataSource runs PYTHON-side (os/glob/open), so only
    locally-visible paths are valid — but callers reasonably pass the
    same URI form Spark's JVM sources accept (export_presigned's
    ``write_path`` contract does exactly that), which previously created
    a literal ``./file:`` directory and wrote nowhere useful.  Non-file
    schemes fail loudly instead of silently doing the same."""
    if path.startswith("file:") or "://" in path:
        from urllib.parse import urlparse

        u = urlparse(path)
        if u.scheme in ("", "file"):
            return u.path or path
        raise ValueError(
            f"xlsx source/sink is Python-filesystem-backed and cannot "
            f"open {u.scheme}:// paths directly; mount the object store "
            f"or write locally and replicate (sources/cloud.py)"
        )
    return path


def _list_xlsx_files(path: str) -> list[str]:
    path = _local_path(path)
    if os.path.isdir(path):
        files = sorted(
            f
            for f in glob.glob(os.path.join(path, "**", "*.xlsx"), recursive=True)
            if not os.path.basename(f).startswith(("_", "."))
        )
        if not files:
            raise FileNotFoundError(f"no .xlsx files under {path}")
        return files
    if os.path.exists(path):
        return [path]
    files = sorted(glob.glob(path))
    if not files:
        raise FileNotFoundError(path)
    return files


#: Filter classes the xlsx reader can evaluate worker-side.  Pushing these
#: into the scan avoids materializing + Arrow-shipping rows Spark would
#: immediately drop — the xlsx analogue of parquet PushedFilters (SURVEY §4:
#: "optional niceties (a)/(b)").  Evaluation uses SQL three-valued logic so
#: accepted filters are EXACTLY as strict as Spark's own post-scan filter.
_COMPARISONS = {
    EqualTo: lambda a, b: a == b,
    GreaterThan: lambda a, b: a > b,
    GreaterThanOrEqual: lambda a, b: a >= b,
    LessThan: lambda a, b: a < b,
    LessThanOrEqual: lambda a, b: a <= b,
}


def _compile_filter(flt: Filter, col_idx: dict[str, int]):
    """-> row-predicate returning True/False/None (SQL unknown), or None
    if the filter is not supported and must be left to Spark."""
    if isinstance(flt, Not):
        inner = _compile_filter(flt.child, col_idx)
        if inner is None:
            return None
        return lambda row: (lambda v: None if v is None else not v)(inner(row))

    attr = getattr(flt, "attribute", None)
    if attr is None or len(attr) != 1 or attr[0] not in col_idx:
        return None
    i = col_idx[attr[0]]

    if isinstance(flt, IsNull):
        return lambda row: row[i] is None
    if isinstance(flt, IsNotNull):
        return lambda row: row[i] is not None

    if type(flt) in _COMPARISONS:
        op, val = _COMPARISONS[type(flt)], flt.value
        if val is None:
            return None

        def cmp(row, op=op, val=val):
            v = row[i]
            if v is None:
                return None
            try:
                return op(v, val)
            except TypeError:  # incomparable types: let Spark decide
                return None

        return cmp

    if isinstance(flt, In):
        vals = tuple(v for v in flt.value if v is not None)
        has_null = len(vals) != len(flt.value)
        def contains(row):
            v = row[i]
            if v is None:
                return None
            if v in vals:
                return True
            return None if has_null else False
        return contains

    if isinstance(flt, (StringStartsWith, StringEndsWith, StringContains)):
        val = flt.value
        fn = {
            StringStartsWith: str.startswith,
            StringEndsWith: str.endswith,
            StringContains: str.__contains__,
        }[type(flt)]
        def strpred(row):
            v = row[i]
            if v is None:
                return None
            if not isinstance(v, str):
                return None
            return fn(v, val)
        return strpred

    return None


def _prune_schema(schema: T.StructType, columns: str | None) -> T.StructType:
    """column-pruned scan via option("columns", "a,b"): only the named
    columns survive inference, in the requested order, and the scan never
    converts the others.  Spark 4.1's Python Data Source API has no
    pruneColumns/pushLimit hooks (only pushFilters), so pruning and limit
    are explicit options rather than planner-driven — the xlsx analogue
    of parquet ReadSchema pruning (SURVEY §4 niceties a/b)."""
    if not columns:
        return schema
    want = [c.strip() for c in columns.split(",") if c.strip()]
    by_name = {f.name: f for f in schema.fields}
    missing = [c for c in want if c not in by_name]
    if missing:
        raise ValueError(
            f"columns option names unknown columns {missing}; "
            f"available: {[f.name for f in schema.fields]}"
        )
    return T.StructType([by_name[c] for c in want])


_POSITIONAL_NAME_RE = re.compile(r"_c(\d+)")


def _positional_remap(schema: T.StructType) -> list[int | None] | None:
    """For headerless pruned reads the schema names are the inferred
    ``_cN`` positionals — recover each field's source column index from
    its name (no header row exists to realign by)."""
    idx: list[int | None] = []
    for f in schema.fields:
        m = _POSITIONAL_NAME_RE.fullmatch(f.name)
        if not m:
            return None
        idx.append(int(m.group(1)))
    return idx if idx != list(range(len(idx))) else None


class XlsxPartition(InputPartition):
    def __init__(self, file: str, sheet: str, predicates=None):
        self.file = file
        self.sheet = sheet
        self.predicates = predicates or []


def _to_arrow_schema(schema: T.StructType):
    """Spark schema -> pyarrow schema for RecordBatch-yielding readers."""
    from excelstream_spark.sources.xlsx.batch_scan import to_arrow_schema

    return to_arrow_schema(schema)


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        path = self.options.get("path")
        if path is None:
            raise ValueError("xlsx source requires a path")
        files = _list_xlsx_files(path)
        n_sample = int(self.options.get("samplingrows", 200))
        header = _truthy(self.options.get("header"), True)
        infer = _truthy(self.options.get("inferschema"), True)
        mode = self.options.get("sheetschemamode", "realign").lower()
        all_sheets = _truthy(self.options.get("allsheets"), False)

        def sample_sheet(wb, s):
            sample = []
            for row in wb.iter_rows(s):
                sample.append(row)
                if len(sample) >= n_sample:
                    break
            return infer_schema(sample, header=header, infer_types=infer)

        with WorkbookReader(files[0]) as wb:
            if all_sheets and mode == "union":
                # union-by-name across the FIRST file's sheets (driver-side
                # inference stays O(one file); later files realign by
                # header at read time)
                schema = merge_schemas(
                    [sample_sheet(wb, s) for s in wb.sheet_names()]
                )
            else:
                schema = sample_sheet(wb, self._pick_sheet(wb))
        return _prune_schema(schema, self.options.get("columns"))

    def _pick_sheet(self, wb: WorkbookReader) -> str:
        name = self.options.get("sheetname")
        if name:
            return name
        idx = self.options.get("sheetindex")
        return wb.sheet_names()[int(idx) if idx else 0]

    def reader(self, schema: T.StructType) -> "XlsxReader":
        return XlsxReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> "XlsxStreamReader":
        return XlsxStreamReader(schema, self.options)

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> "XlsxStreamWriter":
        from excelstream_spark.sources.xlsx.batch_write import vectorizable

        if (
            _truthy(self.options.get("batchwriter"), True)
            and not _truthy(self.options.get("usesharedstrings"), False)
            and vectorizable(schema)
        ):
            return XlsxStreamArrowWriter(schema, self.options, truncate=overwrite)
        return XlsxStreamWriter(schema, self.options, truncate=overwrite)

    def writer(self, schema: T.StructType, overwrite: bool) -> "XlsxWriter":
        from excelstream_spark.sources.xlsx.batch_write import vectorizable

        # columnar write path (batch_write.py): Arrow batches in, numpy-
        # vectorized XML out.  Row path when the schema has non-scalar
        # columns, for shared-strings mode (stateful dedup), or on
        # batchWriter=false.
        if (
            _truthy(self.options.get("batchwriter"), True)
            and not _truthy(self.options.get("usesharedstrings"), False)
            and vectorizable(schema)
        ):
            return XlsxArrowWriter(schema, self.options, overwrite)
        return XlsxWriter(schema, self.options, overwrite)


class XlsxReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options):
        self.schema_ = schema
        self.options = options
        self.path = options.get("path")
        self.header = _truthy(options.get("header"), True)
        self.sheet_name = options.get("sheetname")
        self.sheet_index = options.get("sheetindex")
        self.all_sheets = _truthy(options.get("allsheets"), False)
        # OPT-IN: Spark's Python-datasource planning caches the worker's
        # scan blob per relation and can reuse a FILTERED scan for a later
        # filterless query on the same DataFrame (observed on 4.1.2: an
        # unfiltered count returning the previous query's filtered count).
        # Pushdown is therefore only armed when the user asks for it —
        # safe for write-once-read-once ETL frames, where it saves the
        # Arrow transfer of every dropped row.
        self.pushdown = _truthy(options.get("pushdown"), False)
        self._predicates = []
        lim = options.get("limitrows")
        #: per-partition row cap (option("limitRows", N)): each partition
        #: stops SCANNING after N data rows — a sound upper bound for
        #: df.limit(N), which Spark still applies exactly post-scan
        self.limit = int(lim) if lim is not None else None
        #: with columns-pruned headerless reads, field names are _cN
        #: positionals; recover source indices from them
        self._init_remap = (
            _positional_remap(schema) if options.get("columns") and not self.header
            else None
        )

    def pushFilters(self, filters):
        """Accept every filter we can evaluate exactly; yield the rest back
        to Spark.  (Spark removes accepted filters from its post-scan
        Filter, so acceptance is a correctness contract, not a hint.)

        Lifecycle: Spark reuses ONE reader instance across every query on
        the same DataFrame, calling pushFilters only for plans that have
        filters, then partitions(), then pickling the lot for executors.
        Predicate state must therefore bind to the SCAN, not the reader:
        pushFilters stages them, partitions() moves them into the
        partition objects and clears the staging — otherwise one query's
        filters leak into the next (observed: an unfiltered count on the
        same DataFrame returning the previous query's filtered count)."""
        self._predicates = []
        if not self.pushdown:
            yield from filters
            return
        col_idx = {f.name: i for i, f in enumerate(self.schema_.fields)}
        for flt in filters:
            pred = _compile_filter(flt, col_idx)
            if pred is None:
                yield flt
            else:
                self._predicates.append(pred)

    def partitions(self):
        preds, self._predicates = self._predicates, []  # bind to this scan
        parts = []
        for f in _list_xlsx_files(self.path):
            if self.sheet_name:
                parts.append(XlsxPartition(f, self.sheet_name, preds))
            elif self.all_sheets:
                with WorkbookReader(f) as wb:
                    for s in wb.sheet_names():
                        parts.append(XlsxPartition(f, s, preds))
            else:
                with WorkbookReader(f) as wb:
                    names = wb.sheet_names()
                    idx = int(self.sheet_index) if self.sheet_index else 0
                    parts.append(XlsxPartition(f, names[idx], preds))
        return parts

    def read(self, partition: XlsxPartition):
        """Yields pyarrow RecordBatches (columnar transfer into the JVM —
        measurably faster than per-row pickling); set arrowBatches=false
        to fall back to tuple rows.

        Default fast path: the columnar batch scanner (batch_scan.py) —
        regex cell extraction + per-column vectorized typing, ~4x the
        per-cell row reader — with chunk-level fallback to exact per-cell
        semantics.  ``batchReader=false`` forces the row reader (also used
        automatically when pushed predicates need per-row evaluation)."""
        if not _truthy(self.options.get("arrowbatches"), True):
            yield from self._read_rows(partition)
            return
        import pyarrow as pa

        if not partition.predicates and _truthy(self.options.get("batchreader"), True):
            from excelstream_spark.sources.xlsx.batch_scan import BatchSheetReader

            yielded = False
            try:
                with WorkbookReader(partition.file) as wb:
                    reader = BatchSheetReader(
                        wb,
                        partition.sheet,
                        self.schema_,
                        self.header,
                        schema_mode=self.options.get(
                            "sheetschemamode", "realign"
                        ).lower(),
                        limit=self.limit,
                        init_remap=self._init_remap,
                    )
                    for batch in reader.batches():
                        yielded = True
                        yield batch
                if yielded:
                    return
                # zero rows: re-verify with the row reader (cheap when the
                # sheet is truly empty; catches scanner-invisible layouts
                # such as namespace-prefixed worksheets)
            except Exception:
                if yielded:
                    raise
                # pre-yield failure: fall through to the exact row reader

        pa_schema = _to_arrow_schema(self.schema_)
        batch_size = int(self.options.get("arrowbatchsize", 4096))
        cols: list[list] = [[] for _ in self.schema_.fields]
        n = 0
        for out in self._read_rows(partition):
            for i, v in enumerate(out):
                cols[i].append(v)
            n += 1
            if n >= batch_size:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c, type=f.type) for c, f in zip(cols, pa_schema)],
                    schema=pa_schema,
                )
                cols = [[] for _ in self.schema_.fields]
                n = 0
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, pa_schema)],
                schema=pa_schema,
            )

    def _read_rows(self, partition: XlsxPartition):
        preds = partition.predicates
        mode = self.options.get("sheetschemamode", "realign").lower()
        n_out = 0
        with WorkbookReader(partition.file) as wb:
            first = self.header
            remap = self._init_remap
            for row in wb.iter_rows(partition.sheet):
                if first:
                    first = False
                    # realign THIS sheet's columns to the global schema by
                    # header name — sheets/files whose column order differs
                    # from the schema-inference sheet would otherwise be
                    # coerced positionally and silently mis-typed (policy
                    # per sheetSchemaMode; see resolve_header_remap)
                    remap = resolve_header_remap(row, self.schema_, mode)
                    continue
                if remap is not None:
                    row = [
                        row[i] if i is not None and i < len(row) else None
                        for i in remap
                    ]
                out = coerce_row(row, self.schema_)
                if all(p(out) is True for p in preds):
                    yield out
                    n_out += 1
                    if self.limit is not None and n_out >= self.limit:
                        return


class XlsxStreamReader(DataSourceStreamReader):
    """Micro-batch file-source semantics for workbooks: each trigger picks
    up .xlsx files that appeared since the last committed offset; one
    partition per NEW (file, sheet).  A workbook must be written atomically
    (rename into the watched directory) — the same contract as Spark's
    built-in file sources.

    Offsets are {"seen": sorted [file, ...]} — the full processed set, so
    recovery from any checkpointed offset pair is exact regardless of
    listing order or file mtimes.  An offset therefore grows with total
    file count; option("maxFileAgeSec", N) switches to COMPACTED offsets
    {"mark": max mtime, "recent": [files with mtime >= mark - N]} that
    stay bounded by the arrival rate x window instead — the semantics of
    the built-in file source's maxFileAge: a file whose mtime is older
    than the window behind the newest file is assumed already processed
    and skipped.  The cutoff is relative to the newest CURRENT file, so
    if the stream is down longer than the window while files keep
    arriving, backlog older than (newest mtime - N) is skipped too —
    identical to the built-in source's purge behavior.  Pick N
    comfortably above max delivery delay + max expected downtime.
    Enabling compaction on an existing exact-mode checkpoint is safe
    (both offset formats are accepted as the start side); DISABLING it
    is rejected at the first trigger — the bounded 'recent' list cannot
    stand in for the full processed set, so reprocessing everything in
    the directory would silently follow.
    """

    def __init__(self, schema: T.StructType, options):
        self.schema_ = schema
        self.options = options
        self.path = options.get("path")
        self.header = _truthy(options.get("header"), True)
        self.sheet_name = options.get("sheetname")
        self.sheet_index = options.get("sheetindex")
        self.all_sheets = _truthy(options.get("allsheets"), False)
        age = options.get("maxfileagesec")
        self.max_age = float(age) if age is not None else None

    def _current_files(self) -> list[str]:
        try:
            return _list_xlsx_files(self.path)
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        if self.max_age is not None:
            return {"mark": 0.0, "recent": []}
        return {"seen": []}

    def latestOffset(self) -> dict:
        files = self._current_files()
        if self.max_age is None:
            return {"seen": files}
        pairs = []
        for f in files:
            try:
                pairs.append((f, os.path.getmtime(f)))
            except OSError:  # raced deletion between list and stat
                pass
        mark = max((m for _, m in pairs), default=0.0)
        return {
            "mark": mark,
            "recent": sorted(f for f, m in pairs if m >= mark - self.max_age),
        }

    def partitions(self, start: dict, end: dict):
        if "recent" in start and self.max_age is None:
            raise ValueError(
                "this checkpoint was written with maxFileAgeSec (compacted "
                "offsets); running without the option would reprocess every "
                "file in the directory — keep the option or start a fresh "
                "checkpoint"
            )
        processed = set(start.get("seen") or start.get("recent") or [])
        new_files = sorted(
            set(end.get("seen") or end.get("recent") or []) - processed
        )
        parts = []
        for f in new_files:
            if self.sheet_name:
                parts.append(XlsxPartition(f, self.sheet_name))
            elif self.all_sheets:
                with WorkbookReader(f) as wb:
                    for s in wb.sheet_names():
                        parts.append(XlsxPartition(f, s))
            else:
                with WorkbookReader(f) as wb:
                    names = wb.sheet_names()
                    idx = int(self.sheet_index) if self.sheet_index else 0
                    parts.append(XlsxPartition(f, names[idx]))
        return parts

    def read(self, partition: XlsxPartition):
        with WorkbookReader(partition.file) as wb:
            first = self.header
            for row in wb.iter_rows(partition.sheet):
                if first:
                    first = False
                    continue
                yield coerce_row(row, self.schema_)

    def commit(self, end: dict) -> None:
        pass  # progress is fully encoded in the checkpointed offset


class XlsxCommitMessage(WriterCommitMessage):
    def __init__(self, file: str, rows: int, pid: int = 0):
        self.file = file
        self.rows = rows
        self.pid = pid


class _XlsxWriteOptions:
    """Write-option parsing + workbook scaffolding shared by every xlsx
    sink (batch row/Arrow, streaming row/Arrow) so all of them honor the
    same documented option set."""

    def _init_write_options(self, schema: T.StructType, options) -> None:
        self.schema_ = schema
        self.options = options
        self.path = options.get("path")
        if self.path is None:
            raise ValueError("xlsx sink requires a path")
        self.path = _local_path(self.path)
        self.header = _truthy(options.get("header"), True)
        self.sheet_name = options.get("sheetname", "Sheet1")
        self.compression = int(options.get("compression", 6))
        self.use_sst = _truthy(options.get("usesharedstrings"), False)
        self.protect = options.get("sheetprotectpassword")
        from excelstream_spark.sources.xlsx.writer_core import EXCEL_MAX_ROWS

        self.max_rows_per_sheet = int(
            options.get("maxrowspersheet", EXCEL_MAX_ROWS)
        )
        # real width/height support (reference K8 declares-but-no-ops these)
        cw = options.get("columnwidths")
        self.col_widths = (
            [float(w) if w.strip() else None for w in cw.split(",")] if cw else None
        )
        rh = options.get("rowheight")
        self.row_height = float(rh) if rh else None
        # per-column cell styles by name (reference K4 write_row_styled):
        # option("columnStyles", "currency,,percent") — blank = default
        cs = options.get("columnstyles")
        if cs:
            from excelstream_spark.sources.xlsx import ooxml

            self.col_styles = []
            for s in cs.split(","):
                s = s.strip().lower()
                if s and s not in ooxml.STYLE_NAMES:
                    raise ValueError(
                        f"unknown columnStyles entry {s!r}; valid: "
                        f"{sorted(ooxml.STYLE_NAMES)}"
                    )
                self.col_styles.append(ooxml.STYLE_NAMES[s] if s else None)
        else:
            self.col_styles = None

    def _open_workbook(self, target: str) -> WorkbookWriter:
        wb = WorkbookWriter(
            target,
            compression=self.compression,
            use_shared_strings=self.use_sst,
            protect_password=self.protect,
            col_widths=self.col_widths,
            row_height=self.row_height,
            max_rows_per_sheet=self.max_rows_per_sheet,
        )
        wb.add_sheet(self.sheet_name)
        if self.header:
            wb.write_header([f.name for f in self.schema_.fields])
        return wb

    def _write_rows(self, wb: WorkbookWriter, iterator) -> int:
        n = 0
        for row in iterator:
            wb.write_row(list(row), styles=self.col_styles)
            n += 1
        return n

    def _write_arrow_batches(self, wb: WorkbookWriter, iterator) -> int:
        """Shared Arrow write loop: slices batches at the auto-split
        sheet boundary (identical behavior to the row path)."""
        from excelstream_spark.sources.xlsx.batch_write import batch_to_rows_xml

        n = 0
        for batch in iterator:
            offset = 0
            while offset < batch.num_rows:
                if wb.rows_remaining() <= 0:
                    wb.advance_sheet_for_split()
                take = min(wb.rows_remaining(), batch.num_rows - offset)
                chunk = batch.slice(offset, take)
                xml = batch_to_rows_xml(
                    chunk,
                    self.schema_,
                    wb.next_row_index,
                    col_styles=self.col_styles,
                    row_height=self.row_height,
                )
                wb.write_rows_xml(xml, take)
                offset += take
                n += take
        return n


class XlsxWriter(_XlsxWriteOptions, DataSourceWriter):
    def __init__(self, schema: T.StructType, options, overwrite: bool):
        self._init_write_options(schema, options)
        self.single_file = _truthy(options.get("singlefile"), False)
        # driver-side setup: Spark's planner has already handled the
        # overwrite/errorifexists decision before constructing the writer
        if self.single_file:
            parent = os.path.dirname(os.path.abspath(self.path))
            os.makedirs(parent, exist_ok=True)
            if overwrite and os.path.exists(self.path):
                os.remove(self.path)
        else:
            if overwrite and os.path.isdir(self.path):
                for f in glob.glob(os.path.join(self.path, "part-*.xlsx")):
                    os.remove(f)
            os.makedirs(self.path, exist_ok=True)

    def _target_path(self) -> str:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        if self.single_file:
            if pid != 0:
                raise ValueError(
                    "singleFile=true requires exactly one partition — "
                    "coalesce(1) / repartition(1) before writing"
                )
            # write to a temp sibling; commit() renames atomically so a
            # mid-write task failure or retry never leaves a truncated
            # workbook at the destination
            return f"{self.path}.__tmp-{uuid.uuid4().hex[:8]}"
        return os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.xlsx")

    def write(self, iterator) -> XlsxCommitMessage:
        target = self._target_path()
        with self._open_workbook(target) as wb:
            n = self._write_rows(wb, iterator)
        return XlsxCommitMessage(file=target, rows=n)

    def commit(self, messages) -> None:
        if self.single_file:
            for m in messages:
                if m is not None:
                    os.replace(m.file, self.path)  # atomic publish
        else:
            success = os.path.join(self.path, "_SUCCESS")
            with open(success, "w") as f:
                total = sum(m.rows for m in messages if m is not None)
                f.write(f"rows={total}\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class XlsxStreamWriter(_XlsxWriteOptions, DataSourceStreamWriter):
    """Micro-batch xlsx sink: ``writeStream.format("xlsx")``.

    Each task streams its partition into a DOT-PREFIXED temp workbook
    (invisible to this source's readers, which skip ``_``/``.`` files);
    ``commit(messages, batchId)`` renames them to deterministic
    ``batch-<batchId>-part-<pid>.xlsx`` names.  Deterministic names make
    a REPLAYED commit (crash between sink commit and checkpoint write)
    overwrite its own files instead of duplicating rows — the same
    idempotence the built-in file sink gets from its metadata log,
    without requiring readers to consult one.  A crash before commit
    leaves only dotfile temps, swept by the next successful commit.

    The batch directory composes with the batch/streaming readers: the
    whole output stays one parallel-readable workbook directory.

    Complete/truncate output mode (Spark passes ``overwrite=True`` to
    streamWriter): commit() clears ALL earlier batches so the directory
    always holds exactly the latest complete result.

    Checkpoint coupling (same as the built-in file sink): batch ids come
    from the query's checkpoint, so restarting with a FRESH checkpoint
    restarts numbering at 0 and overwrites earlier output — pair a new
    checkpoint with a new output directory.
    """

    def __init__(self, schema: T.StructType, options, truncate: bool = False):
        self._init_write_options(schema, options)
        self.truncate = truncate
        os.makedirs(self.path, exist_ok=True)

    def _tmp_target(self) -> tuple[str, int]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        tmp = os.path.join(
            self.path, f".tmp-{uuid.uuid4().hex[:8]}-part-{pid:05d}.xlsx"
        )
        return tmp, pid

    def write(self, iterator) -> XlsxCommitMessage:
        tmp, pid = self._tmp_target()
        with self._open_workbook(tmp) as wb:
            n = self._write_rows(wb, iterator)
        if n == 0:  # empty partition: no part file
            os.remove(tmp)
            return XlsxCommitMessage(file="", rows=0, pid=pid)
        return XlsxCommitMessage(file=tmp, rows=n, pid=pid)

    def commit(self, messages, batchId: int) -> None:
        # replay hygiene: a replayed batch may produce FEWER partitions
        # than the crashed attempt published — clear this batch's prior
        # parts so orphans cannot duplicate rows
        for stale in glob.glob(
            os.path.join(self.path, f"batch-{batchId:08d}-part-*.xlsx")
        ):
            os.remove(stale)
        if self.truncate:  # complete mode: output = this batch only
            for old in glob.glob(os.path.join(self.path, "batch-*.xlsx")):
                os.remove(old)
        for m in messages:
            if m is None or not m.file:
                continue
            final = os.path.join(
                self.path, f"batch-{batchId:08d}-part-{m.pid:05d}.xlsx"
            )
            os.replace(m.file, final)
        # sweep temps from crashed earlier attempts of ANY batch
        for stale in glob.glob(os.path.join(self.path, ".tmp-*.xlsx")):
            try:
                os.remove(stale)
            except OSError:
                pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None or not m.file:
                continue
            if os.path.exists(m.file):
                os.remove(m.file)


class XlsxStreamArrowWriter(XlsxStreamWriter, DataSourceStreamArrowWriter):
    """Columnar micro-batch sink: Arrow RecordBatches in, batch_write.py
    serialization out (split-aware, full option set) — same
    temp-then-deterministic-rename commit protocol as the row stream
    sink."""

    def write(self, iterator) -> XlsxCommitMessage:
        tmp, pid = self._tmp_target()
        with self._open_workbook(tmp) as wb:
            n = self._write_arrow_batches(wb, iterator)
        if n == 0:
            os.remove(tmp)
            return XlsxCommitMessage(file="", rows=0, pid=pid)
        return XlsxCommitMessage(file=tmp, rows=n, pid=pid)


class XlsxArrowWriter(XlsxWriter, DataSourceArrowWriter):
    """Columnar sink: Spark ships Arrow RecordBatches to the worker (no
    per-row pickling) and batch_write.py serializes each batch with numpy
    — same workbook bytes as the row path for every scalar schema.
    Auto-split at maxRowsPerSheet is preserved by slicing batches at the
    sheet boundary."""

    def write(self, iterator) -> XlsxCommitMessage:
        target = self._target_path()
        with self._open_workbook(target) as wb:
            n = self._write_arrow_batches(wb, iterator)
        return XlsxCommitMessage(file=target, rows=n)


def register_xlsx(spark) -> None:
    """Idempotently register the xlsx format on this session.

    Re-registering works but logs a "data source xlsx replaced" WARN per
    call (the sink entry and repeated bench runs would spam it).  The
    marker lives ON the session object — an id()-keyed set would both
    leak entries and mistake a new session allocated at a recycled
    address for an already-registered one."""
    if getattr(spark, "_esspark_xlsx_registered", False):
        return
    # the reader implements pushFilters(), which Spark REJECTS (hard
    # error, not a fallback) unless this conf is on — set it here so a
    # caller-provided bare session works, not just our get_spark ones
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    try:
        spark.dataSource.register(XlsxDataSource)
        spark._esspark_xlsx_registered = True
    except Exception as e:  # already registered is fine
        if "already" not in str(e).lower():
            raise
        # someone registered xlsx on this session outside this helper —
        # still mark it, or every later call would re-attempt and the
        # WARN-spam suppression would never engage for this session
        spark._esspark_xlsx_registered = True
