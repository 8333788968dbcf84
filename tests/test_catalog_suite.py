"""Reference catalog-suite statements (presto-product-tests/.../catalog):
SHOW/DESCRIBE metadata commands.  Goldens are environment-specific
(their CI's catalogs/nodes), so this asserts executability and shape:
each command runs through the engine and returns the structurally right
answer for THIS session (e.g. describe nation lists nation's columns).

system.runtime.nodes / jmx.current map onto the engine's system-catalog
analogs (reference ServerMainModule system tables; here: a single local
JVM, surfaced via the Spark session)."""

from __future__ import annotations

import pytest


def test_describe_nation(engine):
    rows = engine.spark.sql("DESCRIBE nation").collect()
    cols = {r.col_name for r in rows}
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols


def test_show_schemas_and_tables(engine):
    schemas = [r[0] for r in engine.spark.sql("SHOW SCHEMAS").collect()]
    assert "default" in schemas
    from prestodb_presto_spark import ddl

    tables = ddl.show_tables(engine.spark)
    assert "nation" in tables and "lineitem" in tables


def test_show_functions_registry(engine):
    df = engine.show_functions()
    names = {r[0] for r in df.collect()}
    assert {"approx_distinct", "date_add", "st_contains", "strpos"} <= names
    assert len(names) >= 360


def test_show_columns_runtime_nodes(engine):
    """system.runtime.nodes analog: one row per executor JVM — local
    mode surfaces the driver itself (reference presto-main
    SystemTablesModule nodes table)."""
    sc = engine.spark.sparkContext
    assert sc.defaultParallelism >= 1
    # the catalog command itself must parse and run
    rows = engine.spark.sql("SHOW TABLES").collect()
    assert rows is not None


def test_information_schema_columns_shape(engine):
    """system suite analog (selectInformationSchemaColumns.sql): the
    reference's golden is environment-specific, so assert the synthesized
    information_schema.columns view carries the spec's core columns for
    this session's tables."""
    df = engine.information_schema("columns")
    assert {"table_name", "column_name", "data_type", "is_nullable"} <= set(df.columns)
    rows = [r for r in df.collect() if r.table_name == "nation"]
    assert {r.column_name for r in rows} >= {"n_nationkey", "n_name", "n_regionkey"}


def test_orc_varchar_dictionary_roundtrip(engine, tmp_path):
    """orc suite (select_varchar_orc_dictionary): low-cardinality varchar
    column written as ORC (dictionary-encodable) reads back exactly."""
    spark = engine.spark
    df = spark.range(500).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'column_value_a' WHEN id % 3 = 1 THEN"
        " 'column_value_b' ELSE NULL END AS c_varchar"
    )
    path = str(tmp_path / "orc_varchar_dictionary")
    df.write.orc(path)
    got = spark.read.orc(path)
    row = got.filter("c_varchar IS NOT NULL").limit(1).collect()
    assert row and row[0].c_varchar.startswith("column_value")
    assert got.count() == 500 and got.filter("c_varchar IS NULL").count() == 166


def test_describe_input_output(engine):
    """DESCRIBE INPUT/OUTPUT over a prepared statement (reference
    tree/DescribeInput.java, DescribeOutput.java; DescribeXxxRewrite):
    output columns+types come from analysis without execution; input
    lists one row per `?` position."""
    engine.prepare(
        "q_desc", "SELECT n_name, n_regionkey + 1 AS rk1 FROM nation WHERE n_nationkey = ?"
    )
    try:
        out = {r.column_name: r.type for r in engine.describe_output("q_desc").collect()}
        assert out["n_name"] == "string" and out["rk1"] in ("int", "bigint")
        inp = engine.describe_input("q_desc").collect()
        assert [r.position for r in inp] == [0]
    finally:
        engine.deallocate("q_desc")


def test_describe_input_ignores_question_marks_in_literals(engine):
    """A '?' inside a string literal is text, not a parameter (r4
    advice: text.count('?') over-counted and bound wrong arity)."""
    engine.prepare(
        "q_lit", "SELECT '?' AS lit, n_name FROM nation WHERE n_nationkey = ?"
    )
    try:
        inp = engine.describe_input("q_lit").collect()
        assert [r.position for r in inp] == [0]
        out = {r.column_name: r.type for r in engine.describe_output("q_lit").collect()}
        assert out["lit"] == "string" and out["n_name"] == "string"
    finally:
        engine.deallocate("q_lit")


def test_information_schema_rewrite_respects_literals_and_catalogs(engine):
    """ADVICE r5 (low): the information_schema rewrite must skip string
    literals and accept a single catalog qualifier, never mangling
    deeper-qualified names."""
    # literal containing the name survives; FROM reference rewrites
    df = engine.sql(
        "SELECT 'information_schema.tables' AS lit, count(*) AS n "
        "FROM information_schema.tables",
        dialect="presto",
    )
    row = df.collect()[0]
    assert row.lit == "information_schema.tables"
    assert row.n >= 1
    # catalog-qualified form routes to the same synthesized view
    df2 = engine.sql(
        "SELECT count(*) AS n FROM hive.information_schema.tables",
        dialect="presto",
    )
    # the first call registers the __information_schema_tables temp view,
    # which itself appears in the second listing — allow for it
    assert row.n <= df2.collect()[0].n <= row.n + 1


def test_sys_example_system_table(engine):
    """AbstractTestIndexedQueries.testExampleSystemTable: the example
    connector's demo system table (ExampleSystemTable.java:33) — one
    VARCHAR row 'test', routable through the presto dialect path."""
    rows = engine.sql("SELECT name FROM sys.example", dialect="presto").collect()
    assert [r.name for r in rows] == ["test"]


def test_system_catalog_surface(engine):
    """Round-12 SYSTEM/JMX catalogs (sources/system_tables.py): live
    runtime tables from Spark's status stores, metadata catalogs, MXBean
    tables — shapes pinned to the reference's published column
    signatures (connector/system/*.java, presto-jmx JmxMetadata)."""
    spark = engine.spark
    cats = [r.Catalog for r in engine.sql("SHOW CATALOGS", dialect="presto").collect()]
    assert {"system", "jmx"} <= set(cats)
    nodes = engine.sql(
        "SELECT node_id, coordinator, state FROM system.runtime.nodes",
        dialect="presto",
    ).collect()
    assert len(nodes) >= 1 and nodes[0].state == "active" and nodes[0].coordinator
    spark.sql("SELECT count(*) FROM range(10)").collect()
    q = engine.sql(
        "SELECT query_id, state, query FROM system.runtime.queries", dialect="presto"
    )
    assert q.count() >= 1
    t = engine.sql(
        "SELECT stage_id, state, splits FROM system.runtime.tasks", dialect="presto"
    )
    assert t.count() >= 1
    assert (
        engine.sql("SELECT * FROM system.runtime.transactions", dialect="presto").count()
        == 0
    )
    cat_rows = {
        r.catalog_name
        for r in engine.sql(
            "SELECT catalog_name FROM system.metadata.catalogs", dialect="presto"
        ).collect()
    }
    assert {"system", "jmx", "hive"} <= cat_rows


def test_jmx_current_and_history(engine):
    """jmx.current MXBean tables + the history schema's leading
    timestamp column (JmxMetadata.java:73,76)."""
    mem = engine.sql(
        'SELECT heapmemoryusage_used FROM jmx.current."java.lang:type=memory"',
        dialect="presto",
    ).collect()
    assert mem[0].heapmemoryusage_used > 0
    hist = engine.sql(
        'SELECT * FROM jmx.history."java.lang:type=runtime"', dialect="presto"
    )
    assert hist.columns[0] == "timestamp" and hist.count() == 1
    cols = engine.sql(
        'SHOW COLUMNS FROM jmx.history."java.lang:type=memory"', dialect="presto"
    ).collect()
    assert cols[0].Column == "timestamp"
    tabs = [
        r.Table
        for r in engine.sql("SHOW TABLES FROM jmx.history", dialect="presto").collect()
    ]
    assert "java.lang:type=memory" in tabs
