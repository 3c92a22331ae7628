"""Format converters + workbook utilities.

The reference ships dedicated converter classes (ParquetToExcelConverter /
ExcelToParquetConverter, /root/reference/src/parquet/converter.rs); in
Spark these are read->write one-liners — kept as named functions so the
capability is discoverable and testable, with schema inference improving
on the reference's all-strings Parquet schema (converter.rs:202-207).

``append_to_workbook`` implements what the reference stubbed out
(AppendableExcelWriter.save() returns an error, src/append/mod.rs:190-207):
read existing sheet + union + rewrite.

``write_sheets`` streams several DataFrames into ONE workbook (driver-side
via toLocalIterator — bounded memory, for human-sized workbooks; the
distributed path is one directory per table).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from excelstream_spark.sources.xlsx import register_xlsx
from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter


def excel_to_parquet(
    spark: SparkSession, src: str, dst: str, header: bool = True, **options
) -> None:
    """XLSX -> Parquet with real inferred types (reference C2, improved)."""
    register_xlsx(spark)
    (
        spark.read.format("xlsx")
        .option("header", header)
        .options(**options)
        .load(src)
        .write.mode("overwrite")
        .parquet(dst)
    )


def parquet_to_excel(
    spark: SparkSession, src: str, dst: str, header: bool = True, **options
) -> None:
    """Parquet -> XLSX (reference C1)."""
    register_xlsx(spark)
    (
        spark.read.parquet(src)
        .write.format("xlsx")
        .mode("overwrite")
        .option("header", header)
        .options(**options)
        .save(dst)
    )


def csv_to_excel(
    spark: SparkSession, src: str, dst: str, header: bool = True, **options
) -> None:
    register_xlsx(spark)
    (
        spark.read.options(header=header, inferSchema=True, **options)
        .csv(src)
        .write.format("xlsx")
        .mode("overwrite")
        .save(dst)
    )


def append_to_workbook(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    sheet_name: str | None = None,
    header: bool = True,
) -> None:
    """Append rows to an existing single-file workbook: read + union +
    rewrite (the operation the reference left unimplemented).

    Atomic: writes a sibling temp file then replaces the original.
    """
    register_xlsx(spark)
    reader = spark.read.format("xlsx").option("header", header)
    if sheet_name:
        reader = reader.option("sheetName", sheet_name)
    existing = reader.load(path)
    combined = existing.unionByName(df.toDF(*existing.columns))
    fd, tmp = tempfile.mkstemp(suffix=".xlsx", dir=os.path.dirname(os.path.abspath(path)))
    os.close(fd)
    os.remove(tmp)
    writer = (
        combined.coalesce(1)
        .write.format("xlsx")
        .mode("overwrite")
        .option("singleFile", True)
        .option("header", header)
    )
    if sheet_name:
        writer = writer.option("sheetName", sheet_name)
    writer.save(tmp)
    os.replace(tmp, path)


def write_sheets(
    dfs: dict[str, DataFrame],
    path: str,
    header: bool = True,
    compression: int = 6,
    max_rows_per_sheet: int | None = None,
) -> None:
    """Several DataFrames -> one multi-sheet workbook (driver-streamed)."""
    with WorkbookWriter(path, compression=compression) as wb:
        for name, df in dfs.items():
            wb.add_sheet(name)
            if header:
                wb.write_header(df.columns)
            n = 0
            for row in df.toLocalIterator():
                wb.write_row(list(row))
                n += 1
                if max_rows_per_sheet and n >= max_rows_per_sheet:
                    break
