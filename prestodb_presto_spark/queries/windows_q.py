"""Window-function catalog — SURVEY.md §2.4.

Reference: WindowOperator (operator/WindowOperator.java:47), frames
(operator/window/FrameInfo.java), functions under operator/window/
registered at metadata/FunctionRegistry.java:407-417; RowNumberOperator
(operator/RowNumberOperator.java:41) and TopNRowNumberOperator
(operator/TopNRowNumberOperator.java:38).

Scale: each window spec is one shuffle on partitionBy keys + a per-
partition sort.  Catalyst's WindowGroupLimit (Spark 3.5) pushes
rank-filters below the sort — the Spark-native equivalent of Presto's
TopNRowNumberOperator.  Determinism: every ORDER BY includes a unique
key so ranks are total.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import dec, t


@query(
    "window_ranking",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           ROUND(CUME_DIST()    OVER w, 6) AS cdist
    FROM orders
    WHERE o_orderkey <= 300
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderpriority, o_orderkey
    """,
    tags=("window",),
)
def window_ranking(spark, sf_dir):
    """row_number/rank/dense_rank/ntile/percent_rank/cume_dist over a
    hash-partitioned sorted window (reference operator/window/*Function.java)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 300)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


@query(
    "window_offsets",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey)      OVER w AS prev_key,
           LAG(o_orderkey, 2, -1) OVER w AS prev2_key,
           LEAD(o_orderkey)     OVER w AS next_key,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
    FROM orders WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_offsets(spark, sf_dir):
    """lag/lead (+default), first/last/nth_value with explicit frames
    (reference LagFunction.java, LeadFunction.java, NthValueFunction.java)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_key"),
            F.lag("o_orderkey", 2, -1).over(w).alias("prev2_key"),
            F.lead("o_orderkey").over(w).alias("next_key"),
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(wfull).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_key"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_running_agg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
           MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
    FROM orders WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "frame"),
)
def window_running_agg(spark, sf_dir):
    """Aggregates as window functions over ROWS frames (reference
    AggregateWindowFunction.java); running decimal sums are exact."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("running_total"),
            F.count("*")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("running_n"),
            F.max("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)).alias("max3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER (ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_in_range
    FROM orders WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
    tags=("window", "frame"),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame with a numeric offset — Spark's rangeBetween is a
    superset of the reference's RANGE surface (StatementAnalyzer.java:1372-1393
    only allows UNBOUNDED/CURRENT; we support offsets too).

    Scale note: an ORDER-BY-only window is single-partition by
    construction (Spark warns accordingly) — legitimate ONLY over a
    bounded input like the ≤1000-key filter here.  At 100 TB a global
    RANGE frame must be rewritten with PARTITION BY (every other window
    entry in this module partitions)."""
    w = Window.orderBy("o_orderkey").rangeBetween(-100, Window.currentRow)
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", F.count("*").over(w).alias("n_in_range"))
        .orderBy("o_orderkey")
    )


@query(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) ranked WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
    tags=("window", "topn"),
)
def window_topn_per_group(spark, sf_dir):
    """Top-N per group (reference TopNRowNumberOperator
    (operator/TopNRowNumberOperator.java:38)); Spark plans WindowGroupLimit,
    pruning below the sort — no full per-partition materialization at scale."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_partition_total",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_total,
           ROUND(l_extendedprice /
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY l_orderkey) AS DOUBLE), 6) AS price_share
    FROM lineitem WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("window",),
)
def window_partition_total(spark, sf_dir):
    """Whole-partition window aggregate (no ORDER BY → full-frame)."""
    w = Window.partitionBy("l_orderkey")
    total = F.sum(dec("l_extendedprice")).over(w).cast("double")
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            total.alias("order_total"),
            F.round(F.col("l_extendedprice") / total, 6).alias("price_share"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
