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
