"""Test-data table loading.

The driver provides a TPC-H-ish star schema plus ``events`` (stream-shaped),
``documents`` (text corpus) and ``embeddings`` (vector table) as parquet at
``/root/testdata/sf*/``.  All queries in the catalog read through these
helpers so that a future cluster deployment only has to change the path
(s3a://... works unchanged).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    LongType under ``spark.sql.legacy.parquet.nanosAsLong``; we restore
    them to TimestampType (truncating ns -> us, matching DuckDB/Arrow)."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path).schema
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    except Exception:
        return []


#: Runtime SQL confs every catalog query depends on.  Set defensively on
#: whatever session the caller provides (the round driver builds its own
#: bare SparkSession — without these, events' TIMESTAMP(NANOS) fails to
#: read and timestamps render in local time instead of UTC).
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build: get_spark sessions already have it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_columns(path):
        if dict(df.dtypes).get(col) == "bigint":
            # integer division (not float) — nanos exceed double's 2^53
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Normalize TIMESTAMP_NTZ (Spark 4's inference for parquet micros with
    # isAdjustedToUTC=false) to TIMESTAMP: identity values under the UTC
    # session, and the type event-time operators (watermarks, windows)
    # require — keeping batch and stream ingest schema-identical.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
