"""XLSX source/sink for Spark (Python Data Source API).

Usage::

    from excelstream_spark.sources.xlsx import register_xlsx
    register_xlsx(spark)
    df = spark.read.format("xlsx").option("header", True).load(path)
    df.write.format("xlsx").option("sheetName", "Data").save(out)

Architecture (Spark-first, not a port): the reference is a single-process
streaming Rust library; here each *partition* streams one worksheet with
constant memory — a directory of part-workbooks behaves like any
distributed dataset, and ``singleFile`` mode (with ``coalesce(1)``)
produces one Excel-openable artifact when that's what a human needs.
"""

from excelstream_spark.sources.xlsx.datasource import XlsxDataSource, register_xlsx
from excelstream_spark.sources.xlsx.reader_core import WorkbookReader, infer_schema
from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter


def sheet_names(path: str) -> list[str]:
    """List worksheet names of a workbook (reference S5 sheet_names)."""
    with WorkbookReader(path) as wb:
        return wb.sheet_names()


def dimensions(path: str, sheet: str | int = 0) -> tuple[int, int]:
    """(n_rows, max_cols) of one sheet by full scan (reference S6)."""
    with WorkbookReader(path) as wb:
        return wb.dimensions(sheet)


__all__ = [
    "XlsxDataSource",
    "register_xlsx",
    "WorkbookReader",
    "WorkbookWriter",
    "infer_schema",
    "sheet_names",
    "dimensions",
]
