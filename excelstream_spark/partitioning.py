"""Partitioning utilities.

``fan_out`` addresses the small-file/compute-heavy mismatch: Spark sizes
scan partitions by BYTES (``spark.sql.files.maxPartitionBytes``), so a
few-MB parquet file arrives as one partition even on a 32-core box — and
any per-row-expensive stage chained onto the scan (shingling, hashing,
BLAS batches) serializes onto one core.  At 100 TB inputs already carry
thousands of partitions, in which case this is a no-op passthrough — the
repartition shuffle is paid only when the input is too small for it to
matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's parallelism iff it has fewer
    partitions than that; never shrinks, never touches at-scale inputs."""
    if df.isStreaming:
        # a streaming DataFrame has no static partition count to inspect
        # (.rdd raises AnalysisException); micro-batch parallelism is the
        # source's concern, so fan_out is an identity there
        return df
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        # JVM-side partition count: physical planning only — df.rdd would
        # additionally build the Python-deserializer RDD plan on every call
        n = df._jdf.rdd().getNumPartitions()
    except Exception:  # Connect or API change: fall back to the public path
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
