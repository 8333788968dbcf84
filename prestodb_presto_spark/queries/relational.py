"""Core relational surface — SURVEY.md §2.1/§2.6: values, limits, distinct,
sampling, unnest (+ordinality), subqueries (scalar/IN/EXISTS/quantified),
lateral, CTEs, conditional expressions, pivot.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import dec, t


@query(
    "values_inline",
    oracle="""
    SELECT x, y, x * 10 + LENGTH(y) AS z
    FROM (VALUES (1, 'a'), (2, 'bb'), (3, 'ccc')) AS t(x, y)
    ORDER BY x
    """,
    tags=("values",),
)
def values_inline(spark, sf_dir):
    """Inline literal rows (reference ValuesOperator.java:27)."""
    return spark.sql(
        """
        SELECT x, y, x * 10 + LENGTH(y) AS z
        FROM VALUES (1, 'a'), (2, 'bb'), (3, 'ccc') AS t(x, y)
        ORDER BY x
        """
    )


@query(
    "distinct_limit",
    oracle="""
    SELECT COUNT(*) AS n FROM (
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem LIMIT 4
    ) x
    """,
    tags=("distinct", "limit"),
)
def distinct_limit(spark, sf_dir):
    """DISTINCT ... LIMIT n (reference DistinctLimitOperator.java:37).

    Which 4 of the 6 combos surface is engine-dependent → emit the count.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .limit(4)
        .agg(F.count("*").alias("n"))
    )


@query(
    "orderby_limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    tags=("topn",),
)
def orderby_limit_topn(spark, sf_dir):
    """ORDER BY + LIMIT → TakeOrderedAndProject (reference TopNOperator.java:35);
    per-partition top-k then a k-row merge — no global sort at 100 TB."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


@query(
    "sample_bernoulli",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sampled
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
                                 || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS UBIGINT)
          % 10000 < 2000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("sample",),
)
def sample_bernoulli(spark, sf_dir):
    """TABLESAMPLE BERNOULLI as a deterministic per-row filter.

    Reference SampleNode + ImplementBernoulliSampleAsFilter.java lowers
    BERNOULLI(p) to `WHERE rand() < p`; the engine's differential form
    replaces rand() with a content hash (md5 of the row key mod 10k) so
    both engines select the *same* 20% of rows and the gate compares
    real sampled aggregates, not a self-asserted envelope.  The
    random-seeded df.sample path stays covered by pytest
    (tests/test_operators.py) with a 6-sigma fraction check.
    """
    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    # r14 (guide §1.2, the agg_checksum r13 finding): the hex→long parse
    # goes through Long.parseLong instead of conv()'s decimal-string
    # round-trip — identical value for 15 lowercase hex chars (< 2^60),
    # ~13% off the per-row md5+parse pipeline at 600k rows.  reflect is
    # Catalyst-nondeterministic, so it lives in a projection and the
    # filter tests the projected column (sampling filters are post-scan
    # either way — an md5 of the row key can never push to parquet).
    bucket = (
        F.expr(
            "cast(reflect('java.lang.Long', 'parseLong',"
            " substring(md5(__bk_key), 1, 15), 16) as bigint)"
        )
        % 10000
    )
    return (
        li.withColumn("__bk_key", key)
        .withColumn("__bucket", bucket)
        .filter(F.col("__bucket") < 2000)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            .alias("qty_sampled"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "unnest_explode",
    oracle="""
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 10
    """,
    tags=("unnest",),
)
def unnest_explode(spark, sf_dir):
    """UNNEST of an array (reference UnnestOperator.java:33) → explode."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    )


@query(
    "unnest_with_ordinality",
    oracle="""
    SELECT doc_id,
           UNNEST(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents WHERE doc_id < 10
    """,
    tags=("unnest",),
)
def unnest_with_ordinality(spark, sf_dir):
    """UNNEST WITH ORDINALITY (reference UnnestOperator.java:45 withOrdinality)
    → posexplode (1-based to match the reference's ordinality)."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    )


@query(
    "subquery_scalar_correlated",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
    tags=("subquery",),
)
def subquery_scalar_correlated(spark, sf_dir):
    """Correlated scalar subquery; Catalyst decorrelates to agg+join
    (reference rule TransformCorrelatedScalarAggregationToJoin)."""
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _sq_orders o
        WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                                  FROM _sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )


@query(
    "subquery_in_uncorrelated",
    oracle="""
    SELECT COUNT(*) AS n FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    """,
    tags=("subquery", "semijoin"),
)
def subquery_in_uncorrelated(spark, sf_dir):
    """IN-subquery → left-semi join."""
    li = t(spark, sf_dir, "lineitem")
    big = t(spark, sf_dir, "part").filter(F.col("p_size") > 40).select("p_partkey")
    return li.join(big, li.l_partkey == big.p_partkey, "left_semi").agg(
        F.count("*").alias("n")
    )


@query(
    "subquery_quantified_all",
    oracle="""
    SELECT COUNT(*) AS n FROM supplier
    WHERE s_acctbal > ALL (SELECT c_acctbal FROM customer WHERE c_nationkey = 0)
    """,
    tags=("subquery", "quantified"),
)
def subquery_quantified_all(spark, sf_dir):
    """Quantified comparison (> ALL) — grammar SqlBase.g4 quantified
    comparison; Spark lacks ALL/ANY syntax so the engine rewrites
    x > ALL(S) ≡ x > max(S) (the same rewrite Presto's planner does in
    TransformQuantifiedComparisonApplyToLateralJoin)."""
    supp = t(spark, sf_dir, "supplier")
    mx = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 0)
        .agg(F.max("c_acctbal").alias("mx"))
    )
    return (
        supp.join(F.broadcast(mx))
        .filter(F.col("s_acctbal") > F.col("mx"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "lateral_top1_per_group",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey AS top_orderkey, o.o_totalprice AS top_price
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
    WHERE c.c_custkey <= 100
    ORDER BY c.c_custkey
    """,
    tags=("lateral", "topn"),
)
def lateral_top1_per_group(spark, sf_dir):
    """LATERAL correlated top-1 (reference LateralJoinNode / grammar
    SqlBase.g4:241).  Spark-first: a lateral-join-with-limit is exactly a
    rank-1 window — one shuffle on the correlation key, no N subqueries."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    top = (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
    )
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return (
        cust.join(top, cust.c_custkey == top.o_custkey)
        .select(
            "c_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").alias("top_price"),
        )
        .orderBy("c_custkey")
    )


@query(
    "cte_chain",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 50000 GROUP BY o_custkey
    ),
    seg AS (
      SELECT c_mktsegment, c_custkey FROM customer
    )
    SELECT c_mktsegment, CAST(SUM(n_big) AS BIGINT) AS total_big, COUNT(*) AS n_cust
    FROM seg JOIN big_orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("cte",),
)
def cte_chain(spark, sf_dir):
    """Chained CTEs (grammar SqlBase.g4:105-107) via spark.sql WITH."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_cte_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("_cte_customer")
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM _cte_orders WHERE o_totalprice > 50000 GROUP BY o_custkey
        ),
        seg AS (
          SELECT c_mktsegment, c_custkey FROM _cte_customer
        )
        SELECT c_mktsegment, CAST(SUM(n_big) AS BIGINT) AS total_big, COUNT(*) AS n_cust
        FROM seg JOIN big_orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@query(
    "conditional_exprs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'high'
                WHEN o_totalprice > 10000  THEN 'mid'
                ELSE 'low' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           IF(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    tags=("conditional",),
)
def conditional_exprs(spark, sf_dir):
    """CASE/COALESCE/NULLIF/IF/TRY_CAST (reference TryCastFunction.java,
    grammar searched-case; try_cast returns NULL like Presto's TRY(CAST))."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "high")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_label"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
    ).orderBy("o_orderkey")


@query(
    "pivot_conditional",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_o
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("pivot",),
)
def pivot_conditional(spark, sf_dir):
    """PIVOT via df.groupBy().pivot() — no reference counterpart operator;
    Presto users write conditional aggregation, which is what the oracle does."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.col("F").alias("status_f"),
            F.col("O").alias("status_o"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "unnest_map",
    oracle="""
    SELECT n_name, k, v FROM (
      SELECT n_name, 'nationkey' AS k, n_nationkey AS v FROM nation
      UNION ALL
      SELECT n_name, 'regionkey' AS k, n_regionkey AS v FROM nation
    ) e ORDER BY n_name, k
    """,
    tags=("relational", "unnest"),
)
def unnest_map(spark, sf_dir):
    """UNNEST of a MAP → two columns (key, value) per entry.

    Reference: UnnestOperator over map blocks (operator/UnnestOperator.java:33,
    spi/block/MapBlock.java:30) → Spark explode(map) emits (key, value).
    """
    nat = t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nationkey"), F.col("n_nationkey"),
        F.lit("regionkey"), F.col("n_regionkey"),
    )
    return (
        nat.select("n_name", F.explode(m).alias("k", "v"))
        .orderBy("n_name", "k")
    )


@query(
    "assign_unique_id",
    oracle="SELECT true AS ids_unique, CAST((SELECT count(*) FROM orders) AS BIGINT) AS n",
    tags=("relational",),
)
def assign_unique_id(spark, sf_dir):
    """AssignUniqueIdOperator (operator/AssignUniqueIdOperator.java:29) →
    monotonically_increasing_id: per-row 64-bit ids, unique across
    partitions by construction (partition id in the high bits — the same
    trick the reference uses with its per-driver id blocks).  Ids are
    run-dependent, so the gate checks the invariant, not the values.
    """
    o = t(spark, sf_dir, "orders").withColumn("uid", F.monotonically_increasing_id())
    return o.agg(
        (F.countDistinct("uid") == F.count("*")).alias("ids_unique"),
        F.count("*").alias("n"),
    )


@query(
    "types_decimal_arithmetic",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS total_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS VARCHAR) AS total_discount,
           CAST(CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS min_price,
           CAST(CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS max_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("types", "decimal"),
)
def types_decimal_arithmetic(spark, sf_dir):
    """DECIMAL(p,s) arithmetic kept decimal end-to-end (§1.2 type parity).

    Reference: spi/type/DecimalType.java + UnscaledDecimal128Arithmetic
    (128-bit exact decimals).  Spark's DecimalType(38) matches the
    reference's ≤38-digit domain; sums/products here never leave the
    exact domain.  The decimal results are rendered to strings on BOTH
    engines (same scale each side), so the differential hash checks
    digit-for-digit decimal equality — stricter than a float compare,
    and immune to harness-side decimal128→float canonicalization (the
    r3 driver rendered DuckDB DECIMAL columns differently from Spark's
    collected ``Decimal`` objects, failing the hash on identical values).
    """
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("string").alias("total_price"),
            F.sum(price * disc).cast("decimal(38,4)").cast("string").alias("total_discount"),
            F.min(price).cast("decimal(18,2)").cast("string").alias("min_price"),
            F.max(price).cast("decimal(18,2)").cast("string").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "subquery_quantified_any",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM part
       WHERE p_retailprice > ANY (SELECT p_retailprice FROM part WHERE p_type = 'ECONOMY')) AS gt_any,
      (SELECT COUNT(*) FROM part
       WHERE p_size = ANY (SELECT p_size FROM part WHERE p_brand = 'Brand#1')) AS eq_any
    """,
    tags=("relational", "subquery"),
)
def subquery_quantified_any(spark, sf_dir):
    """Quantified comparison ANY/SOME (grammar SqlBase.g4; rewrite rule
    TransformQuantifiedComparisonApplyToLateralJoin).  Spark SQL has no
    ANY-subquery syntax, so the engine applies the reference's own
    rewrite: ``> ANY (q)`` → ``> (SELECT MIN ...)``, ``= ANY`` → ``IN``
    — the oracle keeps the ANY form, proving rewrite equivalence."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM part
           WHERE p_retailprice > (SELECT MIN(p_retailprice) FROM part WHERE p_type = 'ECONOMY')) AS gt_any,
          (SELECT COUNT(*) FROM part
           WHERE p_size IN (SELECT p_size FROM part WHERE p_brand = 'Brand#1')) AS eq_any
        """
    )


@query(
    "orderby_nulls_placement",
    oracle="""
    SELECT n_nationkey, NULLIF(n_regionkey, 2) AS rk
    FROM nation
    ORDER BY rk DESC NULLS FIRST, n_nationkey
    LIMIT 15
    """,
    tags=("relational", "sort", "nulls"),
)
def orderby_nulls_placement(spark, sf_dir):
    """Explicit NULLS FIRST ordering: engines disagree on defaults (Spark
    NULLS FIRST asc, DuckDB NULLS LAST), so the Presto surface always
    states placement (OrderByOperator + SortItem.NullOrdering)."""
    nat = t(spark, sf_dir, "nation")
    return (
        nat.select("n_nationkey", F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk"))
        .orderBy(F.col("rk").desc_nulls_first(), "n_nationkey")
        .limit(15)
    )


@query(
    "cte_reused_twice",
    oracle="""
    WITH filtered AS (
      SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT 'big' AS bucket, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM filtered WHERE o_totalprice > 200000
    UNION ALL
    SELECT 'small' AS bucket, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM filtered WHERE o_totalprice <= 200000
    ORDER BY bucket
    """,
    tags=("relational", "cte"),
)
def cte_reused_twice(spark, sf_dir):
    """One CTE consumed by two branches of a UNION (WITH handling,
    grammar SqlBase.g4:105-107).  Spark inlines the CTE per use and the
    scans dedupe via exchange/scan reuse — at scale, heavy shared CTEs
    get an explicit .cache() or Delta materialization instead."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH filtered AS (
          SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        )
        SELECT 'big' AS bucket, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM filtered WHERE o_totalprice > 200000
        UNION ALL
        SELECT 'small' AS bucket, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM filtered WHERE o_totalprice <= 200000
        ORDER BY bucket
        """
    )


@query(
    "agg_empty_input",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS n_global,
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       FROM orders WHERE o_totalprice < 0) AS sum_global,
      (SELECT COUNT(*) FROM (
         SELECT o_orderstatus FROM orders WHERE o_totalprice < 0 GROUP BY o_orderstatus
       ) g) AS n_groups
    """,
    tags=("aggregation", "edge-case"),
)
def agg_empty_input(spark, sf_dir):
    """Aggregation over zero rows: a GLOBAL aggregate emits exactly one
    row (count 0, sum NULL) while a grouped aggregate emits none — the
    distinction AggregationNode's Step.SINGLE vs grouped path encodes
    (plan/AggregationNode.java) and a classic engine-porting bug."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS n_global,
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           FROM orders WHERE o_totalprice < 0) AS sum_global,
          (SELECT COUNT(*) FROM (
             SELECT o_orderstatus FROM orders WHERE o_totalprice < 0 GROUP BY o_orderstatus
           ) g) AS n_groups
        """
    )


@query(
    "subquery_scalar_empty",
    oracle="""
    SELECT c_custkey,
           (SELECT MAX(o_totalprice) FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000) AS best_big_order
    FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey
    """,
    tags=("subquery", "edge-case"),
)
def subquery_scalar_empty(spark, sf_dir):
    """Scalar subquery with an empty correlated result yields NULL, not a
    dropped row (EnforceSingleRowOperator.java:29 semantics)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 400000) AS best_big_order
        FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey
        """
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (SELECT n_nationkey, NULLIF(n_regionkey, 2) AS rk FROM nation),
         b AS (SELECT n_nationkey AS bk, NULLIF(n_regionkey, 2) AS rk FROM nation),
         ns AS (SELECT a.rk AS key, COUNT(*) AS null_safe_matches
                FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk GROUP BY a.rk),
         pl AS (SELECT a.rk AS key, COUNT(*) AS plain_matches
                FROM a JOIN b ON a.rk = b.rk GROUP BY a.rk)
    SELECT ns.key,
           CAST(ns.null_safe_matches AS BIGINT) AS null_safe_matches,
           CAST(COALESCE(pl.plain_matches, 0) AS BIGINT) AS plain_matches
    FROM ns LEFT JOIN pl ON ns.key IS NOT DISTINCT FROM pl.key
    ORDER BY ns.key NULLS FIRST
    """,
    tags=("join", "nulls"),
)
def join_null_safe_eq(spark, sf_dir):
    """IS NOT DISTINCT FROM as a join condition: NULL keys match each
    other under null-safe equality but never under plain `=`
    (RowEqualOperator / IS DISTINCT FROM in the grammar; Spark's
    eqNullSafe lowers to a hash join on the null-safe key).

    Gate shape: emits the matched-key multiset under BOTH join flavors —
    the NULL key row (matches under <=> only) carries plain_matches=0, so
    any regression in null-safe semantics changes real data instead of a
    driver-side boolean.  No driver actions (round-1 version ran two
    .count() jobs)."""
    nat = t(spark, sf_dir, "nation")
    a = nat.select("n_nationkey", F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk"))
    b = nat.select(
        F.col("n_nationkey").alias("bk"),
        F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk"),
    )
    ns = (
        a.join(b, a["rk"].eqNullSafe(b["rk"]))
        .groupBy(a["rk"].alias("key"))
        .agg(F.count("*").alias("null_safe_matches"))
    )
    pl = (
        a.join(b, a["rk"] == b["rk"])
        .groupBy(a["rk"].alias("pkey"))
        .agg(F.count("*").alias("plain_matches"))
    )
    return (
        ns.join(pl, ns["key"].eqNullSafe(pl["pkey"]), "left")
        .select(
            "key",
            "null_safe_matches",
            F.coalesce(F.col("plain_matches"), F.lit(0)).alias("plain_matches"),
        )
        .orderBy(F.col("key").asc_nulls_first())
    )


@query(
    "types_time_ops",
    oracle="""
    WITH tod AS (
      SELECT event_id,
             CAST(epoch_ms(ts) % 86400000 AS BIGINT) AS t
      FROM events
    )
    SELECT event_id, t,
           CAST(t // 3600000 AS BIGINT) AS h,
           CAST((t // 60000) % 60 AS BIGINT) AS m,
           CAST((t // 1000) % 60 AS BIGINT) AS s,
           t < 43200000 AS is_am,
           CAST((t + 90 * 60000) % 86400000 AS BIGINT) AS plus_90m,
           lpad(CAST(t // 3600000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((t // 60000) % 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((t // 1000) % 60 AS VARCHAR), 2, '0') || '.' ||
           lpad(CAST(t % 1000 AS VARCHAR), 3, '0') AS t_str,
           CAST(36930123 // 3600000 AS BIGINT) AS lit_h
    FROM tod ORDER BY event_id
    """,
    tags=("types", "time"),
)
def types_time_ops(spark, sf_dir):
    """TIME type convention (§1.2 gap closure — reference
    TypeRegistry.java:123-148, spi/type/TimeType.java stores TIME as
    millis-since-midnight in a long; the engine adopts the same
    representation as a BIGINT column).  CAST(timestamp AS TIME),
    field extraction, integer-semantics comparison, wraparound
    date_add, CAST(TIME AS VARCHAR), and a literal parse
    ('10:15:30.123' = 36930123 ms) — each re-derived closed-form by
    the oracle."""
    from prestodb_presto_spark.functions import presto as P

    ev = t(spark, sf_dir, "events")
    tod = ev.select("event_id", P.to_time("ts").alias("t"))
    return tod.select(
        "event_id",
        "t",
        P.time_hour("t").alias("h"),
        P.time_minute("t").alias("m"),
        P.time_second("t").alias("s"),
        (F.col("t") < P.to_time(F.lit("12:00:00"))).alias("is_am"),
        P.time_add("minute", 90, F.col("t")).alias("plus_90m"),
        P.time_to_varchar("t").alias("t_str"),
        P.time_hour(P.to_time(F.lit("10:15:30.123"))).alias("lit_h"),
    ).orderBy("event_id")


@query(
    "ddl_view_lifecycle",
    oracle="""
    SELECT l_returnflag AS rf, l_linestatus AS ls,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY rf, ls
    """,
    tags=("ddl", "view"),
)
def ddl_view_lifecycle(spark, sf_dir):
    """View DDL end-to-end (grammar SqlBase.g4:55,71; CreateViewTask.java
    / DropViewTask.java; AbstractTestDistributedQueries.java:609
    testView): CREATE OR REPLACE VIEW over lineitem through the presto
    dialect, aggregate THROUGH the view, verify SHOW CREATE VIEW and
    information_schema.tables report it, then DROP VIEW.  The returned
    DataFrame is analyzed eagerly at sql() time, so collecting after the
    drop is safe — the oracle is the view's underlying query."""
    from prestodb_presto_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql(
        "CREATE OR REPLACE VIEW gate_view AS"
        " SELECT l_returnflag rf, l_linestatus ls, l_quantity qty"
        " FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'",
        dialect="presto",
    )
    out = eng.sql(
        "SELECT rf, ls,"
        " CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,"
        " COUNT(*) AS cnt"
        " FROM gate_view GROUP BY rf, ls ORDER BY rf, ls",
        dialect="presto",
    )
    created = eng.sql("SHOW CREATE VIEW gate_view", dialect="presto").collect()
    assert created[0].create_view.startswith("CREATE VIEW gate_view AS")
    types = {
        r.table_name: r.table_type
        for r in eng.information_schema("tables").collect()
    }
    assert types.get("gate_view") == "VIEW"
    eng.sql("DROP VIEW gate_view", dialect="presto")
    return out


@query(
    "source_text_header_footer",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           CAST(SUM(length(lang)) AS BIGINT) AS sum_lang_len
    FROM documents WHERE doc_id < 400
    """,
    tags=("sources",),
)
def source_text_header_footer(spark, sf_dir):
    """Hive TEXTFILE header/footer skipping gate
    (sources/io.read_text_table; reference presto-hive
    skip.header.line.count / skip.footer.line.count TBLPROPERTIES,
    product test tables_with_header_and_footer.sql).  Documents stage to
    3 pipe-delimited text files, each wrapped in 2 header + 2 footer
    lines whose cells would poison the aggregates if they leaked
    (doc_id cell = 9999999); the distributed read drops them per file
    and the oracle recomputes the aggregates straight from the parquet
    source.  Staging is driver-side fixture construction (a few hundred
    rows), keyed per sf_dir and written once."""
    import hashlib
    import os

    from prestodb_presto_spark.queries.util import t
    from prestodb_presto_spark.sources.io import read_text_table

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    staged = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        "spark_graft_textsrc_" + hashlib.md5(sf_dir.encode()).hexdigest()[:10],
    )
    marker = os.path.join(staged, ".complete")
    if not os.path.exists(marker):
        os.makedirs(staged, exist_ok=True)
        rows = sorted(
            (r.doc_id, r.lang) for r in docs.select("doc_id", "lang").collect()
        )
        header = ["9999999|header", "9999999|header"]
        footer = ["9999999|footer", "9999999|footer"]
        third = max(1, (len(rows) + 2) // 3)
        for k in range(3):
            chunk = rows[k * third : (k + 1) * third]
            body = [f"{i}|{lang}" for i, lang in chunk]
            with open(os.path.join(staged, f"part-{k}.txt"), "w") as f:
                f.write("\n".join(header + body + footer) + "\n")
        open(marker, "w").write("ok")
    back = read_text_table(
        spark, staged, "doc_id bigint, lang string", "|",
        skip_header=2, skip_footer=2,
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sum_id"),
        F.sum(F.length("lang")).alias("sum_lang_len"),
    )
