"""Rule-based document quality filtering (the Gopher rules).

The published heuristic rule set from Gopher (Rae et al. 2021 §A1.1) as
a first-class pipeline operator: word-count bounds, mean-word-length
bounds, symbol-to-word ratio, bullet/ellipsis line fractions,
alphabetic-word fraction, and a minimum stop-word presence.  This is the
coarse pre-filter a training pipeline runs BEFORE the expensive dedup
stages — it drops machine-generated and boilerplate-heavy documents at
scan speed so downstream shuffles see less data.

The reference engine has no analogue (it stops at I/O + row
transforms); this extends the training-pipeline surface alongside
operators/dedup.py and operators/curation.py.

100 TB: every metric and every rule is a JVM-side expression over the
text column (functions/text.py:gopher_metrics) — zero shuffle, zero
Python, the filter runs inside the scan stage (verified: 0 exchanges,
no Python eval in the physical plan) and composes with parquet
predicate pushdown on any structured columns.  The line/token-fraction
metrics use higher-order array functions, which Spark evaluates
interpreted (not whole-stage-codegen) — still executor-local scan
work, just not fused; the regex counts and bounds are codegen'd.  The
identical arithmetic runs in DuckDB for the pytest oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the Gopher metric columns plus per-rule booleans and the
    composed ``gopher_pass`` flag — the auditable form (keep the flags,
    filter downstream, measure per-rule rejection rates)."""
    m = TXT.gopher_metrics(F.col(text_col))
    out = df
    for name, col in m.items():
        out = out.withColumn(name, col)
    for name, lo, hi in TXT.GOPHER_RULES:
        flag = F.lit(True)
        if lo is not None:
            flag = flag & (F.col(name) >= F.lit(lo))
        if hi is not None:
            flag = flag & (F.col(name) <= F.lit(hi))
        out = out.withColumn(f"pass_{name}", flag)
    return out.withColumn(
        "gopher_pass",
        F.lit(True)
        & F.aggregate(
            F.array(*[F.col(f"pass_{name}") for name, _, _ in TXT.GOPHER_RULES]),
            F.lit(True),
            lambda acc, x: acc & x,
        ),
    )


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", rules=TXT.GOPHER_RULES
) -> DataFrame:
    """Keep only documents passing every rule (default: the full Gopher
    set); schema unchanged.  The single-predicate form — one codegen'd
    filter in the scan stage."""
    return df.filter(TXT.gopher_pass(F.col(text_col), rules))
