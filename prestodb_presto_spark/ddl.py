"""DDL / DML surface (SURVEY.md §3 EP3).

The reference dispatches non-query statements to per-statement tasks
(presto-main/.../execution/CreateTableTask.java, DropTableTask.java,
SetSessionTask.java, ... ~25 *Task.java files); INSERT/CTAS/DELETE plan
through TableWriterNode/TableFinishNode/DeleteNode (§2.1).  Spark-first
these are catalog calls and writes; DELETE without a transactional
format (Delta/Iceberg, absent in this container) is a partition-scoped
rewrite — the same strategy as the reference's MetadataDeleteOperator
whole-partition fast path (operator/MetadataDeleteOperator.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prestodb_presto_spark.sources.io import write_table


def create_table_as(
    spark: SparkSession,
    name: str,
    query_or_df: str | DataFrame,
    path: str | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """CTAS (grammar SqlBase.g4:37-40; CreateTableAsOperator path).

    With ``path``: materialize as parquet and register a view over the
    files (survives the session's cache).  Without: register a temp view
    (presto-memory-style).
    """
    df = spark.sql(query_or_df) if isinstance(query_or_df, str) else query_or_df
    if path is not None:
        write_table(df, path=path, partition_by=partition_by)
        out = spark.read.parquet(path)
        out.createOrReplaceTempView(name)
        return out
    df.createOrReplaceTempView(name)
    return df


def insert_into(spark: SparkSession, path: str, rows: DataFrame) -> None:
    """INSERT INTO a parquet-backed table (TableWriterOperator.java:51)."""
    write_table(rows, path=path, mode="append")


def delete_where(spark: SparkSession, path: str, condition: str) -> int:
    """DELETE FROM <path-backed table> WHERE <condition>.

    Rewrite strategy (no transactional format available): read, keep the
    complement, overwrite.  Returns rows deleted.  At 100 TB on Delta or
    Iceberg this becomes a native `DELETE FROM` (file-level skipping +
    transaction log); on raw parquet restrict the rewrite to affected
    partitions via `replaceWhere`-style partition predicates.
    """
    df = spark.read.parquet(path)
    # one aggregation job computes the deleted count (count of matching
    # rows) — not two full-table .count() scans
    deleted = df.select(
        F.count(F.when(F.expr(condition), True)).alias("d")
    ).collect()[0].d
    remaining = df.filter(f"NOT ({condition})")
    # overwrite must not read lazily from the files being replaced
    staged = remaining.cache()
    staged.count()
    write_table(staged, path=path, mode="overwrite")
    staged.unpersist()
    return int(deleted)


def describe(spark: SparkSession, name: str) -> list[tuple[str, str]]:
    """DESCRIBE <table> → [(col, type)] (information_schema synthesis,
    presto-main/.../connector/informationSchema/)."""
    return [(f.name, f.dataType.simpleString()) for f in spark.table(name).schema.fields]


def show_tables(spark: SparkSession) -> list[str]:
    """SHOW TABLES → session-catalog listing."""
    return sorted(t.name for t in spark.catalog.listTables())


def explain(df: DataFrame, mode: str = "formatted") -> str:
    """EXPLAIN (grammar SqlBase.g4:68); mode="cost" adds Catalyst
    statistics.  For runtime metrics use ``explain_analyze``."""
    jdf = df._jdf
    spark = df.sparkSession
    return jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def explain_analyze(df: DataFrame) -> str:
    """EXPLAIN ANALYZE (ExplainAnalyzeOperator.java): execute the query,
    then report the final physical plan with each operator's runtime
    SQL metrics (rows, spill, build/probe times) inline — the reference
    prints per-operator stats the same way."""
    qe = df._jdf.queryExecution()
    # run THROUGH this QueryExecution (a sink write would build its own
    # and leave these metrics untouched); toRdd().count() streams
    # executor-side, nothing materializes on the driver
    qe.toRdd().count()
    plan = qe.executedPlan()
    lines: list[str] = []

    def walk(node, depth: int) -> None:
        mets = node.metrics()
        it = mets.iterator()
        parts = []
        while it.hasNext():
            kv = it.next()
            metric = kv._2()
            parts.append(f"{kv._1()}={metric.value()}")
        lines.append("  " * depth + node.nodeName() + (f"  [{', '.join(parts)}]" if parts else ""))
        # AQE roots and query-stage wrappers hide the executed subtree
        # behind accessor methods rather than children()
        for accessor in ("executedPlan", "plan"):
            try:
                walk(getattr(node, accessor)(), depth + 1)
                return
            except Exception:
                pass
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i), depth + 1)

    walk(plan, 0)
    return "\n".join(lines)


def set_session(spark: SparkSession, key: str, value: str) -> None:
    """SET SESSION k=v (SetSessionTask.java) → runtime-mutable Spark conf."""
    spark.conf.set(key, value)


def show_stats(spark: SparkSession, table: str) -> DataFrame:
    """SHOW STATS FOR <table> (grammar SqlBase.g4 showStats;
    metadata/MetadataManager.getTableStatistics): per-column
    distinct-count / null-fraction / min / max plus the row count, all
    from ONE aggregation pass (approx_count_distinct per column — the
    same NDV sketch the reference's stats calculator uses).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType, StringType

    df = spark.table(table)
    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    numeric_or_str = []
    for f in df.schema.fields:
        aggs.append(F.approx_count_distinct(f.name).alias(f"__ndv_{f.name}"))
        aggs.append(
            F.avg(F.col(f.name).isNull().cast("double")).alias(f"__nullfrac_{f.name}")
        )
        if isinstance(f.dataType, (NumericType, StringType)):
            numeric_or_str.append(f.name)
            aggs.append(F.min(f.name).cast("string").alias(f"__lo_{f.name}"))
            aggs.append(F.max(f.name).cast("string").alias(f"__hi_{f.name}"))
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            f.name,
            int(row[f"__ndv_{f.name}"]),
            float(row[f"__nullfrac_{f.name}"]),
            row[f"__lo_{f.name}"] if f.name in numeric_or_str else None,
            row[f"__hi_{f.name}"] if f.name in numeric_or_str else None,
            int(row["__rows"]),
        )
        for f in df.schema.fields
    ]
    return spark.createDataFrame(
        out,
        "column_name string, distinct_values_count bigint, nulls_fraction double, "
        "low_value string, high_value string, row_count bigint",
    )
