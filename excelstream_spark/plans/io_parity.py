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
        # defensive cast: a regenerated fixture could flip this column
        # between DATE and TIMESTAMP (the events.ts unit flipped in
        # round 3); DuckDB's oracle implicitly promotes DATE the same way
        F.col("l_shipdate").cast("timestamp").alias("ts")
    ).distinct()
    s = d.withColumn("serial", timestamp_to_excel_serial(F.col("ts")))
    return s.withColumn("back_ts", excel_serial_to_timestamp(F.col("serial")))


@query(
    "lenient_casts",
    oracle="""
        WITH src AS (
          SELECT event_id,
                 CAST(value AS VARCHAR)        AS s_num,
                 json_extract_string(props, 'k') AS s_int,
                 CASE event_id % 6
                   WHEN 0 THEN 'true' WHEN 1 THEN 'YES' WHEN 2 THEN '1'
                   WHEN 3 THEN 'No'  WHEN 4 THEN '0'   ELSE event_type
                 END AS s_bool
          FROM events
        )
        SELECT event_id,
               CASE WHEN regexp_matches(s_num, '^[+-]?[0-9]+$')
                    THEN TRY_CAST(s_num AS BIGINT) END  AS num_as_long,
               TRY_CAST(s_num AS DOUBLE)                AS num_as_double,
               CASE WHEN regexp_matches(s_int, '^[+-]?[0-9]+$')
                    THEN TRY_CAST(s_int AS BIGINT) END  AS k_as_long,
               CAST(CASE WHEN lower(s_bool) IN ('true','yes','1') THEN true
                         WHEN lower(s_bool) IN ('false','no','0') THEN false
                    END AS VARCHAR)                     AS flag_as_bool
        FROM src
    """,
    tags=("functions", "casts"),
)
def lenient_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F5 lenient-cast parity (types.rs:101-152) applied to
    data-derived strings: decimal strings reject as_i64 (strict integer
    parse) but pass as_f64; the as_bool word list (true/yes/1/false/no/0,
    case-insensitive) and nothing else."""
    from excelstream_spark.functions import casts as C

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        F.col("value").cast("string").alias("s_num"),
        F.get_json_object("props", "$.k").alias("s_int"),
        F.when(F.col("event_id") % 6 == 0, F.lit("true"))
        .when(F.col("event_id") % 6 == 1, F.lit("YES"))
        .when(F.col("event_id") % 6 == 2, F.lit("1"))
        .when(F.col("event_id") % 6 == 3, F.lit("No"))
        .when(F.col("event_id") % 6 == 4, F.lit("0"))
        .otherwise(F.col("event_type"))
        .alias("s_bool"),
    )
    return src.select(
        "event_id",
        C.lenient_long("s_num").alias("num_as_long"),
        C.lenient_double("s_num").alias("num_as_double"),
        C.lenient_long("s_int").alias("k_as_long"),
        C.lenient_bool("s_bool").cast("string").alias("flag_as_bool"),
    )


@query(
    "warc_roundtrip_documents",
    oracle="""
        SELECT CAST(doc_id AS VARCHAR) AS record_id,
               'https://crawl' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
                 AS target_uri,
               coalesce(text, '') AS text,
               octet_length(encode(coalesce(text, ''))) AS content_length
        FROM documents
        WHERE doc_id IS NOT NULL
    """,
    tags=("io", "warc", "provenance"),
)
def warc_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> WARC sink (4 part-archives, per-record gzip members,
    ISO 28500 headers) -> WARC source (length-delimited streaming parse)
    -> hash vs the parquet original.  WARC is the Common Crawl container
    — the FIRST format a 100 TB web-corpus build reads — and this row
    certifies the full write->read cycle is lossless at the byte level:
    ``content_length`` is gated against DuckDB's own UTF-8 byte count
    (``octet_length(encode(text))``), so a writer that counted
    characters instead of bytes, or a parser that scanned for record
    markers instead of honoring Content-Length, hash-fails (the
    marker-in-payload falsifier is pinned in tests/test_warc.py).

    100 TB shape (sources/warc.py): both directions are embarrassingly
    parallel over files/partitions with zero shuffle; the reader
    streams each archive record-by-record with O(batch) memory and the
    per-record gzip-member convention keeps archives splittable at
    member boundaries downstream."""
    from excelstream_spark.sources.warc import register_warc

    register_warc(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    uri = F.concat(
        F.lit("https://crawl"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    out = _tmp("documents_warc")
    (
        docs.select(
            F.col("doc_id").cast("string").alias("record_id"),
            uri.alias("target_uri"),
            # WARC cannot represent a null payload (every record has a
            # Content-Length) — the sink writes null as an empty record,
            # so the oracle coalesces symmetrically and the row count
            # is preserved under the driver's null-injection rehearsals
            F.coalesce(F.col("text"), F.lit("")).alias("payload"),
        )
        .repartition(4)
        .write.format("warc")
        .mode("overwrite")
        .save(out)
    )
    back = spark.read.format("warc").load(out)
    return back.select(
        "record_id",
        "target_uri",
        F.decode("payload", "UTF-8").alias("text"),
        "content_length",
    )
