"""Set-operation catalog — SURVEY.md §2.6.

Reference: UnionNode (plan/UnionNode.java), IntersectNode / ExceptNode
rewritten by ImplementIntersectAndExceptAsUnion.java.  Spark executes all
six variants natively (INTERSECT/EXCEPT [ALL] since 3.0), so no rewrite
layer is needed — each is a shuffle on the full row as key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import t


def _buyers(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
    )


def _machinery(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("k"))
    )


_BUYERS_SQL = "SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'"
_MACH_SQL = "SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'"


@query(
    "setop_union_all",
    oracle=f"SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS d FROM ({_BUYERS_SQL} UNION ALL {_MACH_SQL}) u",
    tags=("setop",),
)
def setop_union_all(spark, sf_dir):
    """UNION ALL — pure concatenation, no shuffle (reference UnionNode)."""
    u = _buyers(spark, sf_dir).unionAll(_machinery(spark, sf_dir))
    return u.agg(F.count("*").alias("n"), F.countDistinct("k").alias("d"))


@query(
    "setop_union_distinct",
    oracle=f"SELECT COUNT(*) AS n FROM ({_BUYERS_SQL} UNION {_MACH_SQL}) u",
    tags=("setop",),
)
def setop_union_distinct(spark, sf_dir):
    """UNION DISTINCT — union + hash aggregate on the row."""
    u = _buyers(spark, sf_dir).union(_machinery(spark, sf_dir)).distinct()
    return u.agg(F.count("*").alias("n"))


@query(
    "setop_intersect",
    oracle=f"SELECT COUNT(*) AS n FROM ({_BUYERS_SQL} INTERSECT {_MACH_SQL}) u",
    tags=("setop",),
)
def setop_intersect(spark, sf_dir):
    """INTERSECT (DISTINCT) — reference rewrites to union+count filter
    (ImplementIntersectAndExceptAsUnion.java); Spark plans a left-semi."""
    u = _buyers(spark, sf_dir).intersect(_machinery(spark, sf_dir))
    return u.agg(F.count("*").alias("n"))


@query(
    "setop_intersect_all",
    oracle=f"SELECT COUNT(*) AS n FROM ({_BUYERS_SQL} INTERSECT ALL {_MACH_SQL}) u",
    tags=("setop",),
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics (min multiplicity)."""
    u = _buyers(spark, sf_dir).intersectAll(_machinery(spark, sf_dir))
    return u.agg(F.count("*").alias("n"))


@query(
    "setop_except",
    oracle=f"SELECT COUNT(*) AS n FROM ({_BUYERS_SQL} EXCEPT {_MACH_SQL}) u",
    tags=("setop",),
)
def setop_except(spark, sf_dir):
    """EXCEPT (DISTINCT) — Spark plans a left-anti join."""
    u = _buyers(spark, sf_dir).subtract(_machinery(spark, sf_dir))
    return u.agg(F.count("*").alias("n"))


@query(
    "setop_except_all",
    oracle=f"SELECT COUNT(*) AS n FROM ({_BUYERS_SQL} EXCEPT ALL {_MACH_SQL}) u",
    tags=("setop",),
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference (multiplicity subtraction)."""
    u = _buyers(spark, sf_dir).exceptAll(_machinery(spark, sf_dir))
    return u.agg(F.count("*").alias("n"))
