"""I/O-parity catalog entries: the reference's core competency (XLSX/CSV
round-trips, Excel date semantics) proven through the driver's oracle gate.

Each query writes real data through the sink, reads it back through the
source, and returns the read DataFrame — the oracle is the original table,
so a hash match certifies the full write->read cycle is lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from excelstream_spark.plans.catalog import query
from excelstream_spark.sources.xlsx import register_xlsx
from excelstream_spark.sources.xlsx.dates import (
    excel_serial_to_timestamp,
    timestamp_to_excel_serial,
)
from excelstream_spark.tables import load_table


def _tmp(suffix: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix="esspark_"), suffix)


@query(
    "xlsx_roundtrip_lineitem",
    oracle="""
        SELECT l_orderkey, l_partkey, l_suppkey,
               CAST(l_linenumber AS BIGINT) AS l_linenumber,
               l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM lineitem
    """,
    tags=("io", "xlsx"),
)
def xlsx_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> xlsx sink (4 part-workbooks, typed cells incl. serial
    dates) -> xlsx source (schema inference) -> hash vs the parquet
    original.  Certifies W2/W3/S1-S4 semantics end-to-end."""
    register_xlsx(spark)
    li = load_table(spark, sf_dir, "lineitem")
    out = _tmp("lineitem_xlsx")
    li.repartition(4).write.format("xlsx").mode("overwrite").save(out)
    return spark.read.format("xlsx").load(out)


@query(
    "csv_roundtrip_orders",
    oracle="SELECT * FROM orders",
    tags=("io", "csv"),
)
def csv_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> gzip CSV (built-in sink, RFC-4180 quoting) -> read with
    declared schema.  Covers the reference's S7/S8/K9 surface (compressed
    CSV I/O) via Spark built-ins — no custom code, by design."""
    orders = load_table(spark, sf_dir, "orders")
    out = _tmp("orders_csv")
    (
        orders.write.mode("overwrite")
        .options(header=True, compression="gzip")
        .csv(out)
    )
    return spark.read.schema(orders.schema).options(header=True).csv(out)


@query(
    "excel_serial_dates",
    oracle="""
        WITH d AS (SELECT DISTINCT l_shipdate AS ts FROM lineitem),
        s AS (
          SELECT ts,
                 CASE WHEN (epoch_us(ts) - epoch_us(TIMESTAMP '1899-12-30')) / 86400000000.0 < 61
                      THEN (epoch_us(ts) - epoch_us(TIMESTAMP '1899-12-30')) / 86400000000.0 - 1
                      ELSE (epoch_us(ts) - epoch_us(TIMESTAMP '1899-12-30')) / 86400000000.0
                 END AS serial
          FROM d
        )
        SELECT ts, serial,
               TIMESTAMP '1899-12-30'
                 + to_microseconds(CAST((CASE WHEN serial < 60 THEN serial + 1 ELSE serial END)
                                        * 86400000000.0 AS BIGINT)) AS back_ts
        FROM s
    """,
    tags=("io", "excel", "functions"),
)
def excel_serial_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel serial <-> timestamp as bulk column expressions (reference
    F1/parse_excel_date semantics incl. the 1900 leap-bug offset), applied
    to every distinct ship date and round-tripped."""
    d = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").alias("ts")
    ).distinct()
    s = d.withColumn("serial", timestamp_to_excel_serial(F.col("ts")))
    return s.withColumn("back_ts", excel_serial_to_timestamp(F.col("serial")))
