"""excelstream_spark — a PySpark-native analytics engine with the
capabilities of the reference excelstream library (streaming XLSX/CSV/Parquet
I/O, cloud transfer) plus the full Spark relational layer and large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns).

Design: DataFrame/SQL-first, Catalyst-optimized.  Custom code exists only
where Spark has no built-in: the XLSX source/sink (Python Data Source API),
Excel-semantics column functions, and the extension operators.
"""

from excelstream_spark.session import get_spark, stop_spark
from excelstream_spark.tables import TABLE_NAMES, load_tables, register_views

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "load_tables",
    "register_views",
    "TABLE_NAMES",
    "__version__",
]
