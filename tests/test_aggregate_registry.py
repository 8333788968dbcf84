"""Presto-named aggregate builders (functions/aggregates_reg.py) and
information_schema synthesis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prestodb_presto_spark.functions import presto as A

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_basic_aggs(spark, li):
    row = li.agg(
        A.count("l_orderkey").alias("n"),
        A.count_if(F.col("l_quantity") > 25).alias("nbig"),
        A.bool_or(F.col("l_quantity") > 49).alias("any49"),
        A.approx_distinct("l_partkey").alias("nd"),
        A.arbitrary("l_returnflag").alias("some_flag"),
        A.min_by("l_orderkey", "l_quantity").alias("k_of_min_q"),
        A.geometric_mean("l_quantity").alias("gm"),
        A.checksum("l_orderkey").alias("ck"),
    ).collect()[0]
    assert row.n == 6000 and 0 < row.nbig < 6000
    assert row.any49 is True
    exact = li.select("l_partkey").distinct().count()
    assert abs(row.nd - exact) <= max(1, exact * 0.05)
    assert row.some_flag in ("A", "N", "R")
    assert row.gm > 0 and row.ck != 0


def test_checksum_order_independent(spark, li):
    a = li.agg(A.checksum("l_orderkey").alias("ck")).collect()[0].ck
    b = (
        li.repartition(13, "l_partkey")
        .agg(A.checksum("l_orderkey").alias("ck"))
        .collect()[0]
        .ck
    )
    assert a == b


def test_approx_percentile_forms(spark, li):
    row = li.agg(
        A.approx_percentile("l_quantity", 0.5).alias("p50"),
        A.approx_percentile("l_quantity", [0.25, 0.75]).alias("pq"),
    ).collect()[0]
    assert 1 <= row.p50 <= 50
    assert len(row.pq) == 2 and row.pq[0] <= row.pq[1]


def test_map_and_histogram_aggs(spark):
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    row = nat.groupBy("n_regionkey").agg(
        A.map_agg("n_nationkey", "n_name").alias("m"),
        A.histogram(F.col("n_nationkey") % 2).alias("h"),
    ).orderBy("n_regionkey").collect()[0]
    assert len(row.m) == 5 and all(v.startswith("NATION_") for v in row.m.values())
    assert sum(row.h.values()) == 5


def test_multimap_agg(spark):
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    row = nat.agg(A.multimap_agg("n_regionkey", "n_nationkey").alias("mm")).collect()[0]
    assert len(row.mm) == 5
    assert sorted(len(v) for v in row.mm.values()) == [5, 5, 5, 5, 5]


def test_numeric_histogram(spark, li):
    row = li.agg(A.numeric_histogram(5, "l_quantity", 1.0, 51.0).alias("h")).collect()[0]
    assert sum(row.h.values()) == 6000 and len(row.h) == 5


def test_information_schema(engine):
    tabs = {r.table_name for r in engine.information_schema("tables").collect()}
    assert {"lineitem", "orders", "nation"} <= tabs
    cols = engine.information_schema("columns")
    li_cols = {r.column_name for r in cols.filter("table_name = 'lineitem'").collect()}
    assert "l_orderkey" in li_cols and "l_shipdate" in li_cols


def test_information_schema_sql_path(engine):
    """information_schema.tables/columns queryable through Engine.sql
    (AbstractTestQueries.testInformationSchemaFiltering shape)."""
    rows = engine.sql(
        "SELECT table_name FROM information_schema.tables"
        " WHERE table_name = 'orders' LIMIT 1",
        dialect="presto",
    ).collect()
    assert [r.table_name for r in rows] == ["orders"]


def test_weighted_percentile(spark, li):
    # weight 1 == unweighted exact median; tripling weights preserves it
    row = li.select(
        F.lit(1).alias("w1"), F.lit(3).alias("w3"), "l_quantity"
    ).agg(
        A.approx_percentile_weighted("l_quantity", F.col("w1"), 0.5).alias("m1"),
        A.approx_percentile_weighted("l_quantity", F.col("w3"), 0.5).alias("m3"),
    ).collect()[0]
    assert row.m1 == row.m3
    exact = li.agg(F.expr("percentile(l_quantity, 0.5)").alias("m")).collect()[0].m
    assert row.m1 == exact


def test_map_agg_dedupes_by_key_not_pair(spark):
    """A key aggregated with two different values must not crash
    map_from_entries (mapKeyDedupPolicy=EXCEPTION); reference
    KeyValuePairs keeps one value per key."""
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    row = df.agg(A.map_agg("k", "v").alias("m")).collect()[0]
    assert set(row.m.keys()) == {1, 2}
    assert row.m[1] in ("a", "b") and row.m[2] == "c"


def test_set_digest_family(spark):
    """HLL+MinHash SetDigest: cardinality within HLL tolerance, jaccard
    of identical sets = 1.0, disjoint sets ~ 0, intersection estimate
    tracks the exact overlap."""
    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") + 500).alias("y")
    )
    row = df.agg(
        A.make_set_digest("x").alias("dx"),
        A.make_set_digest("y").alias("dy"),
        A.make_set_digest("x").alias("dx2"),
    ).select(
        A.set_digest_cardinality("dx").alias("card"),
        A.jaccard_index("dx", "dx2").alias("j_same"),
        A.jaccard_index("dx", "dy").alias("j_half"),
        A.intersection_cardinality("dx", "dy").alias("inter"),
    ).collect()[0]
    assert abs(row.card - 1000) <= 50
    assert row.j_same == 1.0
    # |A ∩ B| = 500, |A ∪ B| = 1500 -> J = 1/3; 64 slots -> sigma ~ 0.06
    assert abs(row.j_half - 1 / 3) < 0.25
    assert abs(row.inter - 500) <= 250


def test_merge_set_digest_matches_single_pass(spark):
    df = spark.range(2000).select(
        F.col("id").alias("x"), (F.col("id") % 2).alias("site")
    )
    merged = (
        df.groupBy("site").agg(A.make_set_digest("x").alias("d"))
        .agg(A.merge_set_digest("d").alias("dm"))
        .select(A.set_digest_cardinality("dm").alias("card"),
                F.col("dm.sig").alias("sig"))
        .collect()[0]
    )
    single = df.agg(A.make_set_digest("x").alias("d")).select(
        F.col("d.sig").alias("sig")
    ).collect()[0]
    assert abs(merged.card - 2000) <= 100
    assert merged.sig == single.sig  # slot-wise MIN merge is exact


def test_array_agg_keeps_nulls(spark):
    """Presto array_agg retains NULL elements (Spark collect_list drops
    them) — SURVEY §2.3 strictness note."""
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "i int, v string")
    row = df.agg(A.array_agg("v").alias("arr")).collect()[0]
    assert sorted(x for x in row.arr if x is not None) == ["a", "b"]
    assert None in row.arr and len(row.arr) == 3


def test_map_agg_skips_null_keys(spark):
    df = spark.createDataFrame([(None, "x"), (1, "a"), (2, "b")], "k int, v string")
    row = df.agg(A.map_agg("k", "v").alias("m")).collect()[0]
    assert row.m == {1: "a", 2: "b"}


def test_map_union(spark):
    df = spark.createDataFrame(
        [({"a": 1, "b": 2},), ({"b": 9, "c": 3},)], "m map<string,int>"
    )
    row = df.agg(A.map_union("m").alias("u")).collect()[0]
    assert row.u["a"] == 1 and row.u["c"] == 3
    assert row.u["b"] in (2, 9) and len(row.u) == 3


def test_cardinality_and_merge_dispatch(spark):
    """Presto's canonical idioms cardinality(approx_set(x)) and
    merge(approx_set(x)) must work through the name-keyed registry (r4
    advice: cardinality was pinned to F.size, merge to hll_union_agg).
    Dispatch is by expression text; array/map inputs keep F.size."""
    from pyspark.sql import functions as F

    from prestodb_presto_spark.functions import presto as P

    df = spark.range(200).select(
        F.col("id").cast("string").alias("s"), (F.col("id") % 2).alias("g")
    )
    per_group = df.groupBy("g").agg(P.cardinality(P.approx_set("s")).alias("c"))
    assert {r.c for r in per_group.collect()} == {100}

    sketches = df.groupBy("g").agg(P.approx_set("s").alias("sk"))
    merged = sketches.agg(P.cardinality(P.merge(F.col("sk"))).alias("c"))
    assert merged.collect()[0].c == 200

    # SetDigest composite: inline composition dispatches too
    total = df.agg(P.cardinality(P.make_set_digest("s")).alias("c"))
    assert total.collect()[0].c == 200

    # array input keeps the size semantics
    arr = spark.sql("SELECT array(1,2,3) AS a, map('k', 1) AS m")
    row = arr.select(
        P.cardinality("a").alias("na"), P.cardinality("m").alias("nm")
    ).collect()[0]
    assert (row.na, row.nm) == (3, 1)
