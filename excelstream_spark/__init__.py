"""excelstream_spark — a PySpark-native analytics engine with the
capabilities of the reference excelstream library (streaming XLSX/CSV/Parquet
I/O, cloud transfer) plus the full Spark relational layer and large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns, sequence packing, corpus composition).

Design: DataFrame/SQL-first, Catalyst-optimized.  Custom code exists only
where Spark has no built-in: the XLSX source/sink (Python Data Source API),
Excel-semantics column functions, and the extension operators.

Quick start (the reference's whole surface in three lines)::

    from excelstream_spark import get_spark, register_xlsx
    spark = get_spark(); register_xlsx(spark)
    spark.read.parquet(src).write.format("xlsx").save(dst)

Library-style (no Spark) workbook access mirrors the reference's
ExcelWriter/StreamingReader::

    from excelstream_spark import WorkbookReader, WorkbookWriter
"""

from excelstream_spark.session import get_spark, stop_spark
from excelstream_spark.sources.xlsx import register_xlsx
from excelstream_spark.sources.xlsx.reader_core import WorkbookReader
from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter
from excelstream_spark.tables import TABLE_NAMES, load_tables, register_views

__version__ = "0.2.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "register_xlsx",
    "WorkbookReader",
    "WorkbookWriter",
    "load_tables",
    "register_views",
    "TABLE_NAMES",
    "__version__",
]
