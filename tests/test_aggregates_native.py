"""Native statistical aggregates vs DuckDB with numeric tolerance.

The hash-exact gate (queries/aggregates.py) pins the algebra via exact
power sums; these tests exercise the NATIVE Spark implementations
(reference impls: operator/aggregation/VarianceAggregation.java,
CentralMomentsAggregation.java, DoubleCorrelationAggregation.java,
DoubleCovarianceAggregation.java, DoubleRegressionAggregation.java).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_TINY


def _li(spark):
    return spark.read.parquet(f"{SF_TINY}/lineitem.parquet")


def _one(con, sql):
    return con.execute(sql).fetchone()


def test_variance_family(spark, oracle):
    row = _li(spark).agg(
        F.var_pop("l_quantity"), F.var_samp("l_quantity"),
        F.stddev_pop("l_quantity"), F.stddev_samp("l_quantity"),
    ).first()
    exp = _one(oracle, "SELECT var_pop(l_quantity), var_samp(l_quantity), stddev_pop(l_quantity), stddev_samp(l_quantity) FROM lineitem")
    for got, want in zip(row, exp):
        assert math.isclose(got, want, rel_tol=1e-9)


def test_skew_kurtosis(spark, oracle):
    """Registry parity with CentralMomentsAggregation.java: skewness is
    population g1 (= Spark's), kurtosis is the SAMPLE-corrected excess —
    which DuckDB's kurtosis also computes, so it compares directly."""
    from prestodb_presto_spark.functions import presto as P

    got_skew, got_kurt = _li(spark).agg(
        P.skewness("l_extendedprice"), P.kurtosis("l_extendedprice")
    ).first()
    n, skew_s, kurt_s = _one(
        oracle,
        "SELECT COUNT(*), skewness(l_extendedprice), kurtosis(l_extendedprice) FROM lineitem",
    )
    g1 = skew_s * (n - 2) / math.sqrt(n * (n - 1))  # sample → population
    assert math.isclose(got_skew, g1, rel_tol=1e-6)
    assert math.isclose(got_kurt, kurt_s, rel_tol=1e-6)

    # reference edge case: NULL (not NaN) below 3/4 rows
    import pyspark.sql.functions as SF

    two = spark.createDataFrame([(1.0,), (2.0,)], "x: double")
    row = two.agg(P.skewness("x").alias("s"), P.kurtosis("x").alias("k")).first()
    assert row.s is None and row.k is None


def test_corr_covar_regr(spark, oracle):
    row = _li(spark).agg(
        F.corr("l_quantity", "l_extendedprice"),
        F.covar_pop("l_quantity", "l_extendedprice"),
        F.covar_samp("l_quantity", "l_extendedprice"),
        F.regr_slope("l_extendedprice", "l_quantity"),
        F.regr_intercept("l_extendedprice", "l_quantity"),
    ).first()
    exp = _one(
        oracle,
        "SELECT corr(l_quantity, l_extendedprice), covar_pop(l_quantity, l_extendedprice),"
        " covar_samp(l_quantity, l_extendedprice), regr_slope(l_extendedprice, l_quantity),"
        " regr_intercept(l_extendedprice, l_quantity) FROM lineitem",
    )
    for got, want in zip(row, exp):
        assert math.isclose(got, want, rel_tol=1e-9)


def test_any_value_and_first(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, None), (2, "c")], "k int, v string")
    rows = df.groupBy("k").agg(
        F.any_value("v", ignoreNulls=True).alias("av"),
        F.first("v", ignorenulls=True).alias("fv"),
    ).collect()
    by_k = {r["k"]: r for r in rows}
    assert by_k[1]["av"] in ("a", "b") and by_k[1]["fv"] in ("a", "b")
    assert by_k[2]["av"] == "c" and by_k[2]["fv"] == "c"


def test_approx_percentile_bounds(spark, oracle):
    got = _li(spark).agg(
        F.percentile_approx("l_extendedprice", F.lit([0.25, 0.5, 0.75]), F.lit(10000))
    ).first()[0]
    lo, mid, hi = _one(
        oracle,
        "SELECT quantile_cont(l_extendedprice, 0.25), quantile_cont(l_extendedprice, 0.5),"
        " quantile_cont(l_extendedprice, 0.75) FROM lineitem",
    )
    for g, w in zip(got, (lo, mid, hi)):
        assert abs(g - w) / w < 0.05


def test_mode_and_median(spark, oracle):
    got_med = _li(spark).agg(F.median("l_quantity")).first()[0]
    want_med = _one(oracle, "SELECT median(l_quantity) FROM lineitem")[0]
    assert math.isclose(got_med, want_med, rel_tol=1e-12)


def test_histogram_map(spark, oracle):
    """histogram() (value→count map; reference histogram/Histogram.java)
    via map_from_entries(collect_list)."""
    got = (
        _li(spark)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("c"))
        .agg(F.map_from_entries(F.sort_array(F.collect_list(F.struct("l_returnflag", "c")))).alias("h"))
        .first()[0]
    )
    want = dict(
        oracle.execute("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").fetchall()
    )
    assert got == want
