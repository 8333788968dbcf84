"""Bit-exact approx_distinct parity vs the reference's airlift-HLL values.

Every testApproximateCountDistinct assertion from
presto-tests/.../AbstractTestAggregations.java (scraped live) must
reproduce the airlift-HyperLogLog estimate EXACTLY through
functions/hll.py, plus the three GROUP BY values the reference pins in
testApproximateCountDistinctGroupBy.  Also checks the public XXH64 test
vectors and that the distributed by-group form equals the UDAF form.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.abstract_queries_scrape import scrape
from tests.test_reference_abstract_queries import aq_env  # noqa: F401 — fixture


def test_xxh64_spec_vectors():
    """Public xxHash spec vectors (seed 0)."""
    from prestodb_presto_spark.functions.hll import xxh64_bytes, xxh64_u64

    assert xxh64_bytes(b"") == 0xEF46DB3751D8E999
    # the 8-byte vectorized path agrees with the general path
    for v in (0, 1, -1, 123456789, 2**62, -(2**40)):
        u = np.asarray([v], dtype=np.int64)
        assert int(xxh64_u64(u)[0]) == xxh64_bytes(
            (v & ((1 << 64) - 1)).to_bytes(8, "little")
        ), v
    # >=32-byte stripe path is exercised by long strings; sanity: stable
    assert xxh64_bytes(b"a" * 40) == xxh64_bytes(b"a" * 40)


def test_reference_approx_distinct_assertions_exact(aq_env):
    """All scraped testApproximateCountDistinct cases: our value == the
    airlift value the reference asserts (engine SQL path)."""
    engine, _fresh = aq_env
    cases = [
        (k, actual, expected)
        for _f, method, k, kind, actual, expected in scrape()
        if method == "testApproximateCountDistinct"
    ]
    assert len(cases) >= 29, len(cases)
    bad = []
    for k, actual, expected in cases:
        want = int(expected.upper().replace("SELECT", "").strip())
        got = engine.sql(actual, dialect="presto").collect()[0][0]
        if got != want:
            bad.append(f"[{k}] {actual[:80]}: {got} != {want}")
    assert not bad, bad


def test_reference_approx_distinct_group_by(aq_env):
    """testApproximateCountDistinctGroupBy[WithStandardError]: the
    reference pins O=990, F=990, P=303 (AbstractTestAggregations.java)."""
    engine, _fresh = aq_env
    for sql in (
        "SELECT orderstatus, approx_distinct(custkey) FROM orders GROUP BY orderstatus",
        "SELECT orderstatus, approx_distinct(custkey, 0.023) FROM orders GROUP BY orderstatus",
    ):
        rows = {r[0]: r[1] for r in engine.sql(sql, dialect="presto").collect()}
        assert rows == {"O": 990, "F": 990, "P": 303}, rows


def test_by_group_scale_path_matches_udaf(aq_env):
    """approx_distinct_by_group (native-shuffle scale path) returns the
    same estimates as the GROUPED_AGG UDAF."""
    from prestodb_presto_spark.functions.hll import approx_distinct_by_group

    engine, _fresh = aq_env
    spark = engine.spark
    df = spark.table("orders")
    got = {
        r["orderstatus"]: r["approx_distinct"]
        for r in approx_distinct_by_group(df, ["orderstatus"], "custkey").collect()
    }
    assert got == {"O": 990, "F": 990, "P": 303}, got
    glob = approx_distinct_by_group(df, [], "orderdate").collect()
    assert glob[0]["approx_distinct"] == 2443, glob


def test_hll_empty_and_nulls(spark):
    """NULL inputs are skipped (Presto input-function semantics); the
    all-NULL group estimates 0.  Known Spark quirk, documented: a global
    pandas-UDAF aggregation over EMPTY input emits zero rows where
    Presto emits one 0 row (built-in Spark aggs emit the row; the pandas
    GROUPED_AGG path does not) — callers needing that row aggregate a
    non-empty relation or coalesce against a literal group."""
    from prestodb_presto_spark.functions.hll import register_approx_distinct

    register_approx_distinct(spark)
    r = spark.sql(
        "SELECT presto_approx_distinct(x) FROM VALUES (1), (NULL), (2), (1) t(x)"
    ).collect()
    assert r[0][0] == 2
    r = spark.sql(
        "SELECT presto_approx_distinct(x) FROM VALUES (CAST(NULL AS BIGINT)) t(x)"
    ).collect()
    assert r[0][0] == 0


def test_checksum_parity_formula(aq_env):
    """presto_checksum == ChecksumAggregationFunction: the wrapping
    64-bit sum of Type.hash(value) * PRIME64 (+PRIME64 per NULL),
    independently re-derived here per the reference sources
    (AbstractLongType.hash:130 mix, ShortDecimalType.hash:89 raw,
    BooleanType.hash:100, block slice xxh64), rendered LE."""
    from prestodb_presto_spark.functions.hll import xxh64_bytes

    engine, _fresh = aq_env
    P1, P2, M = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, (1 << 64) - 1

    def mix(v):
        t = (v * P2) & M
        t = ((t << 31) | (t >> 33)) & M
        return (t * P1) & M

    def le(total):
        return (total & M).to_bytes(8, "little").hex().upper()

    def run(sql):
        return engine.sql(sql, dialect="presto").collect()[0][0]

    # the reference's own frozen assertion
    assert run("SELECT to_hex(checksum(0))") == "0000000000000000"
    # ints with NULL (+ the pandas float-upcast trap)
    want = le(sum(mix(v) * P1 for v in (1, 2, 3)) + P1)
    assert run("SELECT to_hex(checksum(x)) FROM (VALUES 1, 2, NULL, 3) t(x)") == want
    # varchar
    want = le(xxh64_bytes(b"a") * P1 + xxh64_bytes(b"bc") * P1)
    assert run("SELECT to_hex(checksum(x)) FROM (VALUES 'a', 'bc') t(x)") == want
    # boolean 1231/1237
    want = le(1231 * P1 + 1237 * P1)
    assert run("SELECT to_hex(checksum(x)) FROM (VALUES true, false) t(x)") == want
    # short decimal hashes the RAW unscaled long
    want = le(sum((u * P1) & M for u in (150, 250)))
    assert (
        run("SELECT to_hex(checksum(CAST(x AS DECIMAL(9,2)))) FROM (VALUES 1.5, 2.5) t(x)")
        == want
    )
    # long decimal: xxh64(low) ^ xxh64(high), sign-stripped
    tot = 0
    for x in (3, 7):
        raw = x * 10**20
        h = xxh64_bytes((raw & M).to_bytes(8, "little")) ^ xxh64_bytes(
            (raw >> 64).to_bytes(8, "little")
        )
        tot = (tot + h * P1) & M
    assert (
        run("SELECT to_hex(checksum(CAST(x AS DECIMAL(25,20)))) FROM (VALUES 3, 7) t(x)")
        == le(tot)
    )
    # order independence over real data
    a = run("SELECT to_hex(checksum(custkey)) FROM orders")
    b = run("SELECT to_hex(checksum(custkey)) FROM (SELECT custkey FROM orders ORDER BY orderkey DESC) t")
    assert a == b


def test_review_r7_nan_is_a_value_not_null(aq_env):
    """Presto treats NaN as a VALUE (hash of the canonical NaN bits) and
    NULL as absence; the IS NULL indicator column keeps them apart
    through pandas' NaN conflation."""
    engine, _fresh = aq_env
    P1, M = 0x9E3779B185EBCA87, (1 << 64) - 1

    def mix(v):
        t = (v * 0xC2B2AE3D27D4EB4F) & M
        t = ((t << 31) | (t >> 33)) & M
        return (t * P1) & M

    got = engine.sql(
        "SELECT to_hex(checksum(x)) FROM (VALUES nan(), CAST(NULL AS DOUBLE)) t(x)",
        dialect="presto",
    ).collect()[0][0]
    import struct

    bits_one = 0x7FF8000000000000  # Java canonical NaN
    want = ((mix(bits_one) * P1 + P1) & M).to_bytes(8, "little").hex().upper()
    assert got == want, (got, want)
    # approx_distinct: NaN counts, NULL doesn't
    n = engine.sql(
        "SELECT approx_distinct(x) FROM (VALUES nan(), CAST(NULL AS DOUBLE), 1.0e0) t(x)",
        dialect="presto",
    ).collect()[0][0]
    assert n == 2, n


def test_review_r7_negative_long_decimal_sign_magnitude(aq_env):
    """XX_HASH_64 of a long decimal hashes the sign-magnitude packed
    slice (|v| LE + sign flag bit 127), not two's complement — so -x and
    x hash DIFFERENTLY in approx_distinct."""
    engine, _fresh = aq_env
    n = engine.sql(
        "SELECT approx_distinct(CAST(x AS DECIMAL(25,20)))"
        " FROM (VALUES 3, -3, 7) t(x)",
        dialect="presto",
    ).collect()[0][0]
    assert n == 3, n


def test_review_r7_mix_guard_spark_side_aggregates(aq_env):
    """Aggregates only visible under their SPARK names after earlier
    rewrites (percentile_approx from approx_percentile, max_by) must
    still trip the parity-UDAF mix guard — the query runs instead of
    raising INVALID_PANDAS_UDF_PLACEMENT."""
    engine, _fresh = aq_env
    row = engine.sql(
        "SELECT approx_distinct(custkey), approx_percentile(totalprice, 0.5),"
        " max_by(orderkey, totalprice) FROM orders",
        dialect="presto",
    ).collect()[0]
    assert row[0] > 0 and row[1] is not None
    # derived-table aggregates do NOT trip the guard (inner scope)
    n = engine.sql(
        "SELECT approx_distinct(x) FROM"
        " (SELECT sum(custkey) AS x FROM orders GROUP BY orderstatus) t",
        dialect="presto",
    ).collect()[0][0]
    assert n == 3, n


def _physical_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_r8_native_plan_shape(aq_env):
    """The dialect path of ``SELECT k, approx_distinct(x) .. GROUP BY k``
    must be the native two-phase plan: JVM partial aggregation (partial
    collect_set of (bucket, rho) + count(DISTINCT prefix26)) over ONE
    Arrow-vectorized hash column — never an AggregateInPandas that
    materializes a group's raw values in one Python worker (the round-7
    scale hazard, closed round 8)."""
    engine, _fresh = aq_env
    df = engine.sql(
        "SELECT orderstatus, approx_distinct(custkey) FROM orders"
        " GROUP BY orderstatus",
        dialect="presto",
    )
    plan = _physical_plan(df)
    assert "AggregateInPandas" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "partial_collect_set" in plan, plan
    assert "distinct" in plan.lower(), plan
    # Python appears exactly twice: the row hash and the per-group-row
    # estimator — both scalar ArrowEvalPython, no grouped Python
    assert plan.count("ArrowEvalPython") == 2, plan
    # checksum likewise: native decimal sums, one row-hash UDF, a
    # finish UDF over the two per-group sums
    plan = _physical_plan(
        engine.sql(
            "SELECT orderstatus, checksum(orderkey) FROM orders"
            " GROUP BY orderstatus",
            dialect="presto",
        )
    )
    assert "AggregateInPandas" not in plan, plan
    assert "partial_sum" in plan, plan
    assert plan.count("ArrowEvalPython") == 2, plan


def test_r8_parity_in_mixed_aggregations(aq_env):
    """approx_distinct / checksum mixed with JVM aggregates in one query
    level now keep PARITY values (the round-7 documented deviation —
    'mixed keeps Spark's native estimator' — is closed: the native
    forms ARE JVM aggregates and plan into the same Aggregate)."""
    engine, _fresh = aq_env
    rows = {
        r[0]: (r[1], r[2])
        for r in engine.sql(
            "SELECT orderstatus, approx_distinct(custkey), count(*)"
            " FROM orders GROUP BY orderstatus",
            dialect="presto",
        ).collect()
    }
    assert {k: v[0] for k, v in rows.items()} == {"O": 990, "F": 990, "P": 303}
    solo = engine.sql(
        "SELECT to_hex(checksum(custkey)) FROM orders", dialect="presto"
    ).collect()[0][0]
    mixed = engine.sql(
        "SELECT to_hex(checksum(custkey)), sum(totalprice), count(*)"
        " FROM orders",
        dialect="presto",
    ).collect()[0]
    assert mixed[0] == solo and mixed[2] > 0
    # cardinality(approx_set(..)) mixed keeps its p=12 parity value too
    row = engine.sql(
        "SELECT cardinality(approx_set(custkey)), count(*) FROM orders",
        dialect="presto",
    ).collect()[0]
    assert row[0] == 1002, row


def test_r8_windowed_checksum_parity(aq_env):
    """checksum(x) OVER (..) is parity VARBINARY now (each 32-bit
    half-sum carries the window clause) — the round-7 BIGINT md5-XOR
    wart for windowed checksum is gone; per-partition values equal the
    GROUP BY parity values."""
    engine, _fresh = aq_env
    windowed = {
        r[0]: r[1]
        for r in engine.sql(
            "SELECT DISTINCT orderstatus,"
            " to_hex(checksum(custkey) OVER (PARTITION BY orderstatus))"
            " FROM orders",
            dialect="presto",
        ).collect()
    }
    grouped = {
        r[0]: r[1]
        for r in engine.sql(
            "SELECT orderstatus, to_hex(checksum(custkey)) FROM orders"
            " GROUP BY orderstatus",
            dialect="presto",
        ).collect()
    }
    assert windowed == grouped, (windowed, grouped)


def test_approx_set_cardinality_reference_values(aq_env):
    """testApproxSet* (AbstractTestQueries.java:6970-7090, computeActual
    style so not scrape-gated): cardinality(approx_set(x)) reproduces
    airlift's p=12 Murmur3-fed HLL values exactly."""
    engine, _fresh = aq_env

    def run(sql):
        return engine.sql(sql, dialect="presto").collect()

    assert run("SELECT cardinality(approx_set(custkey)) FROM orders")[0][0] == 1002
    assert (
        run("SELECT cardinality(approx_set(CAST(custkey AS VARCHAR))) FROM orders")[0][0]
        == 1024
    )
    assert (
        run("SELECT cardinality(approx_set(CAST(custkey AS DOUBLE))) FROM orders")[0][0]
        == 1014
    )
    got = {
        r[0]: r[1]
        for r in run(
            "SELECT orderstatus, cardinality(approx_set(custkey))"
            " FROM orders GROUP BY orderstatus"
        )
    }
    assert got == {"O": 1001, "F": 998, "P": 304}, got
    got = {
        r[0]: r[1]
        for r in run(
            "SELECT orderstatus, cardinality(approx_set(CAST(custkey AS VARCHAR)))"
            " FROM orders GROUP BY orderstatus"
        )
    }
    assert got == {"O": 1021, "F": 1019, "P": 304}, got
    got = {
        r[0]: r[1]
        for r in run(
            "SELECT orderstatus, cardinality(approx_set(CAST(custkey AS DOUBLE)))"
            " FROM orders GROUP BY orderstatus"
        )
    }
    assert got == {"O": 1011, "F": 1011, "P": 304}, got
    # NULLs are skipped; an all-NULL input yields NULL (not 0)
    assert (
        run(
            "SELECT cardinality(approx_set(IF(orderstatus = 'O', custkey))) FROM orders"
        )[0][0]
        == 1001
    )
    assert run("SELECT cardinality(approx_set(null)) FROM orders")[0][0] is None
