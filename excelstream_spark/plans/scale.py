"""Scale-technique catalog entries: skew mitigation proven correct.

Salting changes the physical distribution, never the result — so each
entry's oracle is the PLAIN (unsalted) SQL equivalent; a hash match
certifies the rewrite is semantics-preserving.  ``event_type`` is the
deliberately skewed key: a handful of values over the whole events
table, the classic hot-key join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from excelstream_spark.operators.skew import salted_join, salted_two_phase_agg
from excelstream_spark.plans.catalog import query
from excelstream_spark.tables import load_table


@query(
    "skew_salted_join_agg",
    oracle="""
        SELECT e.event_type,
               CAST(count(*) AS BIGINT)                            AS n_events,
               CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
               max(e.value)                                        AS max_value,
               max(t.type_avg)                                     AS type_avg
        FROM events e
        JOIN (SELECT event_type,
                     CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS type_avg
              FROM events GROUP BY event_type) t
          ON e.event_type = t.event_type
        GROUP BY e.event_type
    """,
    tags=("scale", "skew", "join", "agg"),
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH skew techniques in one pipeline (the former skew_salted_join
    + skew_salted_agg entries merged to free a driver-window slot; each
    operator still runs and is still hash-checked through the combined
    result): every event joins its type's average through a SALTED join
    (worst-case skew: 5-ish distinct keys over the whole fact table,
    each hot key spread over 8 reducers), then the joined rows reduce
    through a two-phase SALTED aggregation over the same hot key.  The
    oracle is the plain join + plain groupBy, proving both rewrites are
    semantics-preserving.  Sums re-aggregate partials, so they run over
    exact DECIMAL (accumulation-order-free, see plans/relational.py)."""
    ev = load_table(spark, sf_dir, "events")
    type_stats = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("type_avg")
    )
    joined = salted_join(
        ev.select(
            "event_id",
            "event_type",
            "value",
            F.col("value").cast("decimal(18,6)").alias("value_dec"),
        ),
        type_stats,
        on="event_type",
        n_salts=8,
    )
    out = salted_two_phase_agg(
        joined,
        key="event_type",
        agg_exprs={
            "n_events": ("count", None),
            "total_value": ("sum", "value_dec"),
            "max_value": ("max", "value"),
            "type_avg": ("max", "type_avg"),
        },
        n_salts=16,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


@query(
    "join_interval_binned",
    oracle="""
        SELECT c.c_custkey, s.s_suppkey, c.c_acctbal, s.s_acctbal
        FROM customer c
        JOIN supplier s
          ON c.c_acctbal >= s.s_acctbal - 50.0
         AND c.c_acctbal <= s.s_acctbal + 50.0
    """,
    tags=("scale", "join", "range"),
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE interval join (no equi key: every customer vs every supplier
    within +-50 acctbal) rewritten as a binned equi-join — Catalyst alone
    would plan a BroadcastNestedLoopJoin here.  Oracle is the plain
    BETWEEN join, proving the rewrite is exact."""
    from excelstream_spark.operators.rangejoin import binned_interval_join

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        (F.col("s_acctbal") - 50.0).alias("lo"),
        (F.col("s_acctbal") + 50.0).alias("hi"),
    )
    out = binned_interval_join(c, s, "c_acctbal", "lo", "hi", bin_width=100.0)
    return out.select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")
