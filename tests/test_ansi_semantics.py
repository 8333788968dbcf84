"""ANSI error-semantics parity (SURVEY §7 risk #1).

Presto raises on division by zero, numeric overflow, and bad casts
(non-ANSI Spark used to return NULL).  The engine runs with
spark.sql.ansi.enabled (Spark 4 default) so the same queries fail the
same way — and the TRY family is the sanctioned escape hatch, exactly
as in the reference (TryFunction.java / TryCastFunction.java).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prestodb_presto_spark.functions import presto as P


def test_ansi_mode_is_on(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_division_by_zero_raises(spark):
    with pytest.raises(Exception, match="(?i)divide.*zero|DIVIDE_BY_ZERO"):
        spark.sql("SELECT 1/0").collect()


def test_overflow_raises(spark):
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC_OVERFLOW"):
        spark.range(1).select(
            (F.lit(2**63 - 1).cast("bigint") + F.lit(1).cast("bigint")).alias("x")
        ).collect()


def test_bad_cast_raises(spark):
    with pytest.raises(Exception, match="(?i)cast|CAST_INVALID_INPUT"):
        spark.sql("SELECT CAST('not a number' AS INT)").collect()


def test_try_family_returns_null_instead(spark):
    row = spark.range(1).select(
        P.try_divide(F.lit(1), F.lit(0)).alias("div0"),
        P.try_cast(F.lit("nope"), "int").alias("badcast"),
        P.try_add(F.lit(2**63 - 1).cast("bigint"), F.lit(1)).alias("ovf"),
        P.try_element_at(F.array(F.lit(1)), F.lit(9)).alias("oob"),
    ).collect()[0]
    assert (row.div0, row.badcast, row.ovf, row.oob) == (None, None, None, None)


def test_array_index_out_of_bounds_raises(spark):
    """element_at past the end errors under ANSI (Presto: 'Array subscript
    out of bounds')."""
    with pytest.raises(Exception, match="(?i)INVALID_ARRAY_INDEX|array"):
        spark.range(1).select(F.element_at(F.array(F.lit(1)), 5)).collect()
