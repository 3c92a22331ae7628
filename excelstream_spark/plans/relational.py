"""Classic relational operator coverage (SURVEY.md §2.7).

The reference has no relational layer; these queries demonstrate that the
Spark build ships the full operator surface — scans, filters, hash/broadcast
joins, semi/anti joins, partial+final aggregation, distinct, rollup/cube/
grouping sets, window functions, set operations, sort/limit/top-k, pivot —
each verified against a DuckDB oracle on the same parquet.

Scale notes are inline: dimension joins broadcast (customer/supplier/part/
nation/region are tiny relative to fact tables at any SF), fact-fact joins
shuffle on their keys, and AQE handles skew/coalescing at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from excelstream_spark.operators.asof import asof_join
from excelstream_spark.plans.catalog import query
from excelstream_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                                       AS sum_qty,
               sum(l_extendedprice)                                  AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity)                                       AS avg_qty,
               avg(l_extendedprice)                                  AS avg_price,
               avg(l_discount)                                       AS avg_disc,
               count(*)                                              AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter (pushed to parquet) + hash aggregate.

    Partial aggregation happens map-side; only |groups| x |partitions| rows
    shuffle, so this scales linearly to any SF.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct_count",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT)                  AS n_orders,
               sum(o_totalprice)                         AS total_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Spark expands to a two-phase aggregate
    (partial distinct map-side), no driver involvement."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               sum(o_totalprice)        AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one shuffle (Expand operator)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
    )


@query(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)          AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem status dimensions."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> broadcast join -> fact join
    -> aggregate -> top-k (TakeOrderedAndProject, no full sort)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
        SELECT n.n_name,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey   = o.o_custkey
        JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
        JOIN supplier s ON l.l_suppkey   = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    tags=("join", "agg"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join.  All dimensions broadcast; the only
    shuffle is lineitem x orders on orderkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS; emits each left row at most once without
    materializing the right side's columns."""
    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS: customers with no order since 2000
    (date-restricted so the result is non-empty in the test data —
    an unrestricted NOT EXISTS matches zero customers there)."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_outer_coalesce",
    oracle="""
        SELECT c.c_custkey,
               COALESCE(sum(o.o_totalprice), 0.0)                          AS spend,
               CAST(count(o.o_orderkey) AS BIGINT)                          AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    tags=("join", "agg"),
)
def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + per-customer aggregate (null-safe totals)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "join_range",
    oracle="""
        SELECT o.o_orderkey,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_late_lines
        FROM orders o
        JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >  o.o_orderdate + INTERVAL 60 DAY
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
        GROUP BY o.o_orderkey
    """,
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join expressed as equi-join + range residual: Catalyst keeps
    the equi key for the shuffle and evaluates the band predicate post-join,
    so this does NOT degenerate to a cartesian product at scale."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_late_lines"))
    )


@query(
    "join_asof",
    oracle="""
        WITH ranked AS (
          SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
                 row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e
          JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, ts, o_orderkey, o_orderdate
        FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each event, per user).

    Implemented scale-first as union + window forward-fill (one shuffle on
    the key, sort within partition) rather than the naive range-join +
    dedup, which explodes quadratically per key.  See operators/asof.py.
    """
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return asof_join(
        left=events,
        right=orders,
        left_time="ts",
        right_time="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        right_values=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
        how="inner",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@query(
    "window_topn_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 3
    """,
    tags=("window",),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number window (deterministic
    tie-break on orderkey), filter rn<=3.  One shuffle on custkey."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_running_lag",
    oracle="""
        SELECT event_id, user_id, ts, value,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value,
               lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id)      AS prev_value,
               lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)      AS next_value
        FROM events
    """,
    tags=("window",),
)
def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead over an event stream, per user."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_value"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_rank_dense",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS price_rank,
               CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS price_dense_rank,
               CAST(ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INT) AS quartile
        FROM part
    """,
    tags=("window",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over parts by brand."""
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    wt = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return _t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@query(
    "sessionize_events",
    oracle="""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), numbered AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               sum(value) AS session_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the classic
    lag -> flag -> cumulative-sum -> aggregate composition.  Batch analogue
    of Structured Streaming's session_window (see streaming/)."""
    gap_s = 30 * 60
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap_s),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("value").alias("session_value"),
    )


# --------------------------------------------------------------------------
# Set operations / sort / pivot
# --------------------------------------------------------------------------

@query(
    "setop_intersect_except",
    oracle="""
        WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate < TIMESTAMP '1998-01-01'),
             h2 AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
        UNION ALL
        SELECT o_custkey, 'early_only' AS bucket FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
    """,
    tags=("setop",),
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over customer activity halves."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    h1 = orders.filter(F.col("o_orderdate") < cutoff).select("o_custkey").distinct()
    h2 = orders.filter(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()
    both = h1.intersect(h2).withColumn("bucket", F.lit("both"))
    early = h1.exceptAll(h2).withColumn("bucket", F.lit("early_only"))
    return both.unionAll(early)


@query(
    "sort_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 25
    """,
    tags=("sort", "topk"),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge of k rows), never a full sort at scale."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
    )


@query(
    "pivot_status",
    oracle="""
        SELECT o_orderpriority,
               sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS status_o,
               sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS status_f,
               sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with explicit value list (avoids the extra distinct scan).
    Pivot columns are re-aliased to case-unambiguous names so the
    column-sorted oracle compare is robust."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .sum("o_totalprice")
        .withColumnsRenamed({"O": "status_o", "F": "status_f", "P": "status_p"})
    )


@query(
    "events_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(value)               AS total_value,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    tags=("agg", "time"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup — the batch shape of the streaming windowed
    aggregation in streaming/pipelines.py."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "json_extract_props",
    oracle="""
        SELECT event_type,
               sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
               CAST(count(*) AS BIGINT)                               AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("json",),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON field extraction inside the JVM
    (get_json_object), no Python involved."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Subquery shapes (decorrelated the Spark way)
# --------------------------------------------------------------------------

@query(
    "corr_above_nation_avg",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("subquery",),
)
def corr_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery, decorrelated as a window average —
    one shuffle on the correlation key instead of a per-row subquery
    (what Catalyst's decorrelation produces from the SQL form too)."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    return (
        c.withColumn("nat_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@query(
    "exists_not_exists",
    oracle="""
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("subquery", "join"),
)
def exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi + left-anti joins — the physical
    plan SQL EXISTS lowers to; both sides shuffle on o_custkey once."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    has_f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    has_p = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return (
        c.join(has_f, c.c_custkey == has_f.k, "leftsemi")
        .join(has_p, F.col("c_custkey") == has_p.k, "leftanti")
        .select("c_custkey")
    )


@query(
    "scalar_subquery_threshold",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_acctbal > (SELECT avg(s_acctbal) * 1.5 FROM supplier)
    """,
    tags=("subquery",),
)
def scalar_subquery_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery: the 1-row aggregate is broadcast and
    cross-joined — no driver collect, the threshold never leaves the
    cluster."""
    s = _t(spark, sf_dir, "supplier")
    thresh = s.agg((F.avg("s_acctbal") * 1.5).alias("_thr"))
    return (
        s.crossJoin(F.broadcast(thresh))
        .filter(F.col("s_acctbal") > F.col("_thr"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# More TPC-H-shaped joins/aggregations
# --------------------------------------------------------------------------

@query(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-time residual predicate,
    then a two-level aggregation (per-customer count -> histogram).
    count(col) ignores the NULLs the outer join introduces — the exact
    semantic the oracle checks."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_share",
    oracle="""
        SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
    """,
    tags=("join", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join.
    part broadcasts (tiny vs lineitem at any SF); the date filter pushes
    to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q8_region_yearly_revenue",
    oracle="""
        SELECT r_name, CAST(year(o_orderdate) AS INT) AS yr,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, yr
    """,
    tags=("join", "agg"),
)
def q8_region_yearly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join: the one fact-fact join (lineitem x orders) shuffles
    on orderkey; customer/nation/region broadcast.  The aggregation is
    partial map-side before the final group shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(rev).alias("revenue"))
    )


@query(
    "join_asof_forward_tolerance",
    oracle="""
        WITH ranked AS (
          SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
                 e.event_id, e.ts,
                 row_number() OVER (
                   PARTITION BY o.o_orderkey
                   ORDER BY e.ts ASC, e.event_id DESC) AS rn
          FROM orders o
          JOIN events e
            ON e.user_id = o.o_custkey
           AND e.ts >= o.o_orderdate
        )
        SELECT o2.o_orderkey, o2.o_custkey, o2.o_orderdate,
               CASE WHEN r.ts <= o2.o_orderdate + INTERVAL 11000 DAY
                    THEN r.event_id END AS event_id,
               CASE WHEN r.ts <= o2.o_orderdate + INTERVAL 11000 DAY
                    THEN r.ts END       AS ts
        FROM orders o2
        LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
          ON r.o_orderkey = o2.o_orderkey
    """,
    tags=("join", "asof"),
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each order attaches the
    EARLIEST event at-or-after it from the same customer, nulled when
    the gap exceeds 11000 days — both the direction and the tolerance
    produce a mixed matched/unmatched result on this data.  Same
    single-shuffle union+window plan as the backward variant (pandas
    merge_asof parity, quadratic-blowup-free)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = _t(spark, sf_dir, "events")
    return asof_join(
        o,
        ev,
        left_time="o_orderdate",
        right_time="ts",
        left_by="o_custkey",
        right_by="user_id",
        right_values=["event_id", "ts"],
        tie_break="event_id",
        how="left",
        direction="forward",
        tolerance="11000 DAY",
    )


@query(
    "agg_percentiles",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5)  AS p50,
               quantile_cont(value, 0.95) AS p95,
               quantile_cont(value, 0.99) AS p99
        FROM events
        GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group: Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the same linear-interpolation
    definition, so this is hash-exact.  (At 100 TB switch to
    ``approx_percentile`` — same call shape, sketch-based, one pass.)"""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.95).alias("p95"),
        F.percentile("value", 0.99).alias("p99"),
    )


@query("agg_approx_sketches", tags=("agg", "approx"))  # approximate -> rows-only
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (HLL++ distinct count, t-digest-style
    percentile): the one-pass 100 TB forms of the exact queries above —
    approximate by construction, so rows-only here; error bounds are
    asserted against exact answers in tests/test_scale_plans.py."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.approx_percentile("value", 0.95, 10000).alias("approx_p95"),
    )


@query(
    "window_frames_ntile",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
               avg(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)         AS avg_last3,
               ntile(4) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS price_quartile,
               round(percent_rank() OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 9) AS pct_rank
        FROM orders
    """,
    tags=("window",),
)
def window_frames_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame shapes: unbounded running sum, sliding 3-row average,
    ntile quartiles, percent_rank — one shuffle on the partition key for
    all four (same window spec reused)."""
    o = _t(spark, sf_dir, "orders")
    wt = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.sum("o_totalprice").over(wt.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("running_spend"),
        F.avg("o_totalprice").over(wt.rowsBetween(-2, W.currentRow)).alias("avg_last3"),
        F.ntile(4).over(wp).alias("price_quartile"),
        F.round(F.percent_rank().over(wp), 9).alias("pct_rank"),
    )


@query(
    "events_time_buckets",
    oracle="""
        SELECT date_trunc('day', ts)                          AS day_b,
               time_bucket(INTERVAL 15 MINUTE, ts)            AS bucket_15m,
               event_type,
               CAST(count(*) AS BIGINT)                       AS n,
               sum(value)                                     AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    tags=("agg", "time"),
)
def events_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time bucketing: 15-minute buckets nested in days
    (timescale time_bucket semantics via timestamp arithmetic — epoch
    floor-division, identical across engines)."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 900).cast("bigint") * 900
    )
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day_b"),
            bucket.alias("bucket_15m"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


@query(
    "string_functions",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                                   AS name_upper,
               substring(p_name, 1, 4)                         AS name_prefix,
               replace(p_name, ' ', '_')                       AS name_snake,
               CAST(length(p_name) AS INT)                     AS name_len,
               CAST(levenshtein(p_name, p_brand) AS INT)       AS dist_to_brand,
               CAST(position('e' IN p_name) AS INT)            AS first_e,
               lpad(CAST(p_size AS VARCHAR), 3, '0')           AS size_padded
        FROM part
        WHERE p_name LIKE '%o%' AND regexp_matches(p_name, '^[a-z]')
    """,
    tags=("functions", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function coverage incl. levenshtein — identical
    classic-DP semantics in both engines."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%o%") & F.col("p_name").rlike("^[a-z]"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.length("p_name").alias("name_len"),
            F.levenshtein("p_name", "p_brand").alias("dist_to_brand"),
            F.instr("p_name", "e").alias("first_e"),
            F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        )
    )


@query(
    "null_semantics",
    oracle="""
        WITH j AS (
          SELECT c.c_custkey, c.c_acctbal, o.o_totalprice
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        )
        SELECT CAST(count(*) AS BIGINT)                      AS n_rows,
               CAST(count(o_totalprice) AS BIGINT)           AS n_priced,
               CAST(count(DISTINCT o_totalprice) AS BIGINT)  AS n_distinct_price,
               sum(coalesce(o_totalprice, 0.0))              AS total_coalesced,
               CAST(count(nullif(c_acctbal > 0, false)) AS BIGINT) AS n_positive_bal
        FROM j
    """,
    tags=("agg", "null"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null semantics end-to-end: count(*) vs count(col) vs
    count(distinct col) over outer-join nulls, coalesce, nullif."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_acctbal", "o_totalprice"
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_priced"),
        F.countDistinct("o_totalprice").alias("n_distinct_price"),
        F.sum(F.coalesce("o_totalprice", F.lit(0.0))).alias("total_coalesced"),
        F.count(F.nullif(F.col("c_acctbal") > 0, F.lit(False))).alias("n_positive_bal"),
    )


@query(
    "agg_arrays",
    oracle="""
        SELECT event_type,
               list_sort(list(DISTINCT user_id))                    AS users_sorted,
               (list_sort(list(value)) )[1:5]                       AS smallest5,
               CAST(len(list(DISTINCT user_id)) AS INT)             AS n_users
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "array"),
)
def agg_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array functions: collect_set/sort_array/slice
    — engine-identical once sorted (collection order is undefined in
    both, so sorting is part of the contract)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sort_array(F.collect_set("user_id")).alias("users_sorted"),
        F.slice(F.sort_array(F.collect_list("value")), 1, 5).alias("smallest5"),
        F.size(F.collect_set("user_id")).alias("n_users"),
    )


@query(
    "date_math_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)                     AS yr,
               CAST(month(o_orderdate) AS INT)                    AS mo,
               CAST(dayofweek(o_orderdate) + 1 AS INT)            AS dow,  -- duckdb 0=Sun, spark 1=Sun
               CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP)   AS due_date,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
               round(sqrt(o_totalprice), 6)                       AS price_sqrt,
               round(ln(o_totalprice + 1), 6)                     AS price_ln,
               round(pow(o_totalprice, 0.25), 6)                  AS price_qrt,
               CAST(sign(o_totalprice - 100000) AS DOUBLE)        AS above_100k
        FROM orders
        WHERE o_orderkey % 7 = 0
    """,
    tags=("functions", "date", "math"),
)
def date_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction/arithmetic + math scalar coverage (year/month/dow,
    interval add, datediff, sqrt/ln/pow/sign) — rounded to 6 decimals
    where transcendental libm implementations could differ in the last
    ulp."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    day = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(day, F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("o_totalprice", F.lit(0.25)), 6).alias("price_qrt"),
        F.signum(F.col("o_totalprice") - 100000).alias("above_100k"),
    )


@query(
    "unpivot_metrics",
    oracle="""
        SELECT o_orderkey, metric, val
        FROM (SELECT o_orderkey, o_totalprice,
                     CAST(year(o_orderdate) AS DOUBLE) AS order_year
              FROM orders WHERE o_orderkey % 11 = 0)
        UNPIVOT (val FOR metric IN (o_totalprice, order_year))
    """,
    tags=("reshape",),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt): the inverse of pivot_status, one output
    row per (row, metric) — no shuffle, pure projection explosion."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("double").alias("order_year"),
    )
    return o.unpivot(
        "o_orderkey", ["o_totalprice", "order_year"], "metric", "val"
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
        SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 5 AND l_quantity <= 25)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 40)
           OR (p_type = 'PROMO' AND l_discount > 0.05)
    """,
    tags=("join", "predicate"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-table predicates — the join
    stays a single broadcast hash join with the OR tree as a residual
    (no union-of-three-joins blowup)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") > 0.05))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(F.sum(rev).alias("revenue"))
