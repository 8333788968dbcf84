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
