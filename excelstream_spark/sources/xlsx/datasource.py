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
  inferSchema (default true), samplingRows (default 200)
Options (write): sheetName, header (default true), compression (0-9,
  default 6), useSharedStrings, sheetProtectPassword, singleFile,
  maxRowsPerSheet (default 1,048,576 -> auto-split)
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from excelstream_spark.sources.xlsx.reader_core import (
    WorkbookReader,
    coerce_row,
    infer_schema,
)
from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter


def _truthy(value: str | bool | None, default: bool = False) -> bool:
    if value is None:
        return default
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("1", "true", "yes", "y")


def _list_xlsx_files(path: str) -> list[str]:
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


class XlsxPartition(InputPartition):
    def __init__(self, file: str, sheet: str):
        self.file = file
        self.sheet = sheet


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        path = self.options.get("path")
        if path is None:
            raise ValueError("xlsx source requires a path")
        files = _list_xlsx_files(path)
        sheet = self._pick_sheet
        n_sample = int(self.options.get("samplingrows", 200))
        header = _truthy(self.options.get("header"), True)
        infer = _truthy(self.options.get("inferschema"), True)
        with WorkbookReader(files[0]) as wb:
            sample = []
            for row in wb.iter_rows(sheet(wb)):
                sample.append(row)
                if len(sample) >= n_sample:
                    break
        return infer_schema(sample, header=header, infer_types=infer)

    def _pick_sheet(self, wb: WorkbookReader) -> str:
        name = self.options.get("sheetname")
        if name:
            return name
        idx = self.options.get("sheetindex")
        return wb.sheet_names()[int(idx) if idx else 0]

    def reader(self, schema: T.StructType) -> "XlsxReader":
        return XlsxReader(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> "XlsxWriter":
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

    def partitions(self):
        parts = []
        for f in _list_xlsx_files(self.path):
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


class XlsxCommitMessage(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class XlsxWriter(DataSourceWriter):
    def __init__(self, schema: T.StructType, options, overwrite: bool):
        self.schema_ = schema
        self.options = options
        self.path = options.get("path")
        if self.path is None:
            raise ValueError("xlsx sink requires a path")
        self.header = _truthy(options.get("header"), True)
        self.sheet_name = options.get("sheetname", "Sheet1")
        self.compression = int(options.get("compression", 6))
        self.use_sst = _truthy(options.get("usesharedstrings"), False)
        self.protect = options.get("sheetprotectpassword")
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

    def write(self, iterator) -> XlsxCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        if self.single_file:
            if pid != 0:
                raise ValueError(
                    "singleFile=true requires exactly one partition — "
                    "coalesce(1) / repartition(1) before writing"
                )
            target = self.path
        else:
            target = os.path.join(
                self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.xlsx"
            )
        names = [f.name for f in self.schema_.fields]
        n = 0
        with WorkbookWriter(
            target,
            compression=self.compression,
            use_shared_strings=self.use_sst,
            protect_password=self.protect,
        ) as wb:
            wb.add_sheet(self.sheet_name)
            if self.header:
                wb.write_header(names)
            for row in iterator:
                wb.write_row(list(row))
                n += 1
        return XlsxCommitMessage(file=target, rows=n)

    def commit(self, messages) -> None:
        if not self.single_file:
            success = os.path.join(self.path, "_SUCCESS")
            with open(success, "w") as f:
                total = sum(m.rows for m in messages if m is not None)
                f.write(f"rows={total}\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and not self.single_file and os.path.exists(m.file):
                os.remove(m.file)


def register_xlsx(spark) -> None:
    """Idempotently register the xlsx format on this session."""
    try:
        spark.dataSource.register(XlsxDataSource)
    except Exception as e:  # already registered is fine
        if "already" not in str(e).lower():
            raise
