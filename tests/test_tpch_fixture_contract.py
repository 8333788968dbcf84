"""Pin the TPC-H data-contract assumptions behind the r13 long-cents
aggregation rewrites (tpch_q01 and friends).

The rewrites compute exact decimal money sums as integer-cents longs:
``cast(x * 100 + 0.5 as long)`` must equal the cents denoted by
``CAST(x AS DECIMAL(18,2))`` for every row, which holds exactly when the
column is a non-negative 2-decimal quantity (TPC-H spec: quantities are
integral, prices/rates have 2 decimal digits, all lineitem columns are
NOT NULL).  If a regenerated fixture ever violated this, these tests
fail before the differential gate does — with a message naming the
assumption instead of a bare hash mismatch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prestodb_presto_spark.queries.util import t

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
MONEY_COLS = [
    ("l_quantity", 8),
    ("l_extendedprice", 12),
    ("l_discount", 4),
    ("l_tax", 4),
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_part_retailprice_is_2dp_nonneg_nonnull(spark, sf_dir):
    pt = t(spark, sf_dir, "part")
    dec_cents = (
        F.col("p_retailprice").cast("decimal(12,2)") * F.lit(100).cast("decimal(3,0)")
    ).cast("long")
    arith_cents = (F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    bad = pt.filter(
        F.col("p_retailprice").isNull()
        | (F.col("p_retailprice") < 0)
        | (dec_cents != arith_cents)
    ).count()
    assert bad == 0, (
        "part.p_retailprice violates the 2dp/non-negative/non-null contract "
        "behind tpch_q09's long-cents rewrite"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lineitem_money_columns_are_2dp_nonneg_nonnull(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    checks = []
    for col, prec in MONEY_COLS:
        dec_cents = (
            F.col(col).cast(f"decimal({prec},2)") * F.lit(100).cast("decimal(3,0)")
        ).cast("long")
        arith_cents = (F.col(col) * 100 + F.lit(0.5)).cast("long")
        checks.append(
            F.sum(
                (
                    F.col(col).isNull()
                    | (F.col(col) < 0)
                    | (dec_cents != arith_cents)
                ).cast("int")
            ).alias(col)
        )
    row = li.agg(*checks).collect()[0]
    bad = {c: row[c] for c, _ in MONEY_COLS if row[c]}
    assert not bad, (
        f"lineitem money columns violate the 2dp/non-negative/non-null "
        f"contract the long-cents aggregation rewrite relies on: {bad}"
    )
