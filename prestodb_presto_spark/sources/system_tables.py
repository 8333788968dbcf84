"""The reference's SYSTEM and JMX catalogs, Spark-side.

Reference: presto-main/.../connector/system/ (SystemConnectorModule.java
registers NodeSystemTable, QuerySystemTable, TaskSystemTable,
TransactionsSystemTable, CatalogSystemTable, schema/table property
tables) and presto-jmx/.../JmxMetadata.java (each MBean is a one-row
table under jmx.current).

Two layers:

- a STATIC metadata model (``SYSTEM_MODEL``) — the catalog's schemas,
  tables, and column signatures, reproduced exactly from the system
  tables' ConnectorTableMetadata builders, so the product-test system
  suite's information_schema goldens
  (presto-product-tests/.../testcases/system/*.result) compare 1:1;
- LIVE row sources — each runtime table reads the equivalent Spark
  facts (block-manager peers for nodes, the SQL status store for
  queries, the app status store's stages for tasks, JVM MXBeans for
  jmx.current).  A Spark app has no Presto coordinator, so values map
  onto the closest native concept; shapes are the reference's.

Scale note: every one of these is coordinator/driver-side metadata —
tiny by construction — materialized with createDataFrame.  Nothing here
touches executors or data paths.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- static metadata model (column name -> presto type), in declared
# order; reproduced from the tableMetadataBuilder calls cited above ----

_IS_COLUMNS = [
    ("table_catalog", "varchar"), ("table_schema", "varchar"),
    ("table_name", "varchar"), ("column_name", "varchar"),
    ("ordinal_position", "bigint"), ("column_default", "varchar"),
    ("is_nullable", "varchar"), ("data_type", "varchar"),
    ("comment", "varchar"), ("extra_info", "varchar"),
]

SYSTEM_MODEL: dict[str, dict[str, list[tuple[str, str]]]] = {
    "information_schema": {
        "columns": _IS_COLUMNS,
        "schemata": [("catalog_name", "varchar"), ("schema_name", "varchar")],
        "table_privileges": [
            ("grantor", "varchar"), ("grantee", "varchar"),
            ("table_catalog", "varchar"), ("table_schema", "varchar"),
            ("table_name", "varchar"), ("privilege_type", "varchar"),
            ("is_grantable", "boolean"), ("with_hierarchy", "boolean"),
        ],
        "tables": [
            ("table_catalog", "varchar"), ("table_schema", "varchar"),
            ("table_name", "varchar"), ("table_type", "varchar"),
        ],
        "views": [
            ("table_catalog", "varchar"), ("table_schema", "varchar"),
            ("table_name", "varchar"), ("view_definition", "varchar"),
        ],
    },
    "metadata": {
        "catalogs": [("catalog_name", "varchar"), ("connector_id", "varchar")],
        "schema_properties": [
            ("catalog_name", "varchar"), ("property_name", "varchar"),
            ("default_value", "varchar"), ("type", "varchar"),
            ("description", "varchar"),
        ],
        "table_properties": [
            ("catalog_name", "varchar"), ("property_name", "varchar"),
            ("default_value", "varchar"), ("type", "varchar"),
            ("description", "varchar"),
        ],
    },
    "runtime": {
        "nodes": [
            ("node_id", "varchar"), ("http_uri", "varchar"),
            ("node_version", "varchar"), ("coordinator", "boolean"),
            ("state", "varchar"),
        ],
        "queries": [
            ("node_id", "varchar"), ("query_id", "varchar"),
            ("state", "varchar"), ("user", "varchar"),
            ("source", "varchar"), ("query", "varchar"),
            ("resource_group_id", "array(varchar)"),
            ("queued_time_ms", "bigint"), ("analysis_time_ms", "bigint"),
            ("distributed_planning_time_ms", "bigint"),
            ("created", "timestamp"), ("started", "timestamp"),
            ("last_heartbeat", "timestamp"), ("end", "timestamp"),
        ],
        "tasks": [
            ("node_id", "varchar"), ("task_id", "varchar"),
            ("stage_id", "varchar"), ("query_id", "varchar"),
            ("state", "varchar"), ("splits", "bigint"),
            ("queued_splits", "bigint"), ("running_splits", "bigint"),
            ("completed_splits", "bigint"),
            ("split_scheduled_time_ms", "bigint"),
            ("split_cpu_time_ms", "bigint"), ("split_user_time_ms", "bigint"),
            ("split_blocked_time_ms", "bigint"), ("raw_input_bytes", "bigint"),
            ("raw_input_rows", "bigint"), ("processed_input_bytes", "bigint"),
            ("processed_input_rows", "bigint"), ("output_bytes", "bigint"),
            ("output_rows", "bigint"), ("physical_written_bytes", "bigint"),
            ("created", "timestamp"), ("start", "timestamp"),
            ("last_heartbeat", "timestamp"), ("end", "timestamp"),
        ],
        "transactions": [
            ("transaction_id", "varchar"), ("isolation_level", "varchar"),
            ("read_only", "boolean"), ("auto_commit_context", "boolean"),
            ("create_time", "timestamp"), ("idle_time_secs", "bigint"),
            ("written_catalog", "varchar"), ("catalogs", "array(varchar)"),
        ],
    },
    # system.jdbc exists in the reference (driver metadata shims); its
    # tables are not modeled — the suite's own query filters it out
    # (where table_schema <> 'jdbc') and SHOW SCHEMAS only needs the name
    "jdbc": {},
}

SYSTEM_SCHEMAS = list(SYSTEM_MODEL)

# jmx.current MBean tables the catalog suite's golden enumerates
# (JmxMetadata lists every platform MBean; these six are the JVM's
# always-present java.lang set)
JMX_TABLES = [
    "java.lang:type=classloading",
    "java.lang:type=compilation",
    "java.lang:type=memory",
    "java.lang:type=operatingsystem",
    "java.lang:type=runtime",
    "java.lang:type=threading",
]

_SPARK_TYPES = {"varchar": "string", "bigint": "long", "boolean": "boolean",
                "timestamp": "timestamp", "array(varchar)": "array<string>"}


def _schema_str(cols: list[tuple[str, str]]) -> str:
    return ", ".join(f"`{n}` {_SPARK_TYPES[t]}" for n, t in cols)


def system_information_schema(spark: SparkSession, view: str) -> DataFrame:
    """system.information_schema.{schemata,tables,columns,...} — the
    static model rendered as rows (InformationSchemaMetadata over the
    system connector)."""
    if view == "schemata":
        rows = [("system", s) for s in SYSTEM_SCHEMAS]
    elif view == "tables":
        rows = [
            ("system", s, t, "BASE TABLE")
            for s, tabs in SYSTEM_MODEL.items()
            for t in tabs
        ]
    elif view == "columns":
        rows = [
            ("system", s, t, cname, i + 1, None, "YES", ctype, None, None)
            for s, tabs in SYSTEM_MODEL.items()
            for t, cols in tabs.items()
            for i, (cname, ctype) in enumerate(cols)
        ]
    elif view == "views":
        rows = []
    elif view == "table_privileges":
        rows = []
    else:
        raise ValueError(f"unknown system.information_schema view: {view}")
    cols = SYSTEM_MODEL["information_schema"][view]
    return spark.createDataFrame(rows, _schema_str(cols))


def runtime_nodes(spark: SparkSession) -> DataFrame:
    """system.runtime.nodes (NodeSystemTable.java:51): one row per live
    JVM — block-manager peers on a cluster, the driver itself in local
    mode; the driver is the coordinator analog."""
    sc = spark.sparkContext
    mem = sc._jsc.sc().getExecutorMemoryStatus()
    it = mem.iterator()
    hosts = []
    while it.hasNext():
        hosts.append(str(it.next()._1()))
    rows = [
        (h, f"http://{h}", spark.version, i == 0 or h.startswith("driver"), "active")
        for i, h in enumerate(sorted(hosts))
    ]
    return spark.createDataFrame(rows, _schema_str(SYSTEM_MODEL["runtime"]["nodes"]))


def _ms_to_ts(millis) -> _dt.datetime | None:
    if millis is None:
        return None
    return _dt.datetime.utcfromtimestamp(millis / 1000.0)


def runtime_queries(spark: SparkSession) -> DataFrame:
    """system.runtime.queries (QuerySystemTable.java:51): Spark's SQL
    status store holds every SQL execution of this app — id, text,
    submission/completion — the app-local equivalent of the reference's
    QueryManager history."""
    node = spark.sparkContext.getConf().get("spark.driver.host", "driver")
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    rows = []
    for i in range(execs.size()):
        e = execs.apply(i)
        comp = e.completionTime()
        done = comp.isDefined()
        err = e.errorMessage()
        failed = err.isDefined() and len(str(err.get())) > 0
        rows.append(
            (
                node,
                str(e.executionId()),
                "FAILED" if failed else ("FINISHED" if done else "RUNNING"),
                spark.sparkContext.sparkUser(),
                "spark-sql",
                str(e.description()),
                None,
                None,
                None,
                None,
                _ms_to_ts(e.submissionTime()),
                _ms_to_ts(e.submissionTime()),
                None,
                _ms_to_ts(comp.get().getTime()) if done else None,
            )
        )
    return spark.createDataFrame(rows, _schema_str(SYSTEM_MODEL["runtime"]["queries"]))


def runtime_tasks(spark: SparkSession) -> DataFrame:
    """system.runtime.tasks (TaskSystemTable.java:48): Spark stages are
    the task-set analog — the app status store's stage list maps onto
    the reference's per-task split/io counters."""
    node = spark.sparkContext.getConf().get("spark.driver.host", "driver")
    store = spark.sparkContext._jsc.sc().statusStore()
    # stageList(statuses, details, withSummaries, unsortedQuantiles,
    # taskStatus) — nulls mean "no filter"; the empty double[] skips
    # quantile summaries
    gateway = spark.sparkContext._gateway
    no_quantiles = gateway.new_array(gateway.jvm.double, 0)
    stages = store.stageList(None, False, False, no_quantiles, None)
    rows = []
    for i in range(stages.size()):
        s = stages.apply(i)
        sub = s.submissionTime()
        first = s.firstTaskLaunchedTime()
        comp = s.completionTime()
        queued = max(
            int(s.numTasks())
            - int(s.numActiveTasks())
            - int(s.numCompleteTasks())
            - int(s.numFailedTasks()),
            0,
        )
        rows.append(
            (
                node,
                f"{s.stageId()}.{s.attemptId()}",
                str(s.stageId()),
                None,
                str(s.status()),
                int(s.numTasks()),
                queued,
                int(s.numActiveTasks()),
                int(s.numCompleteTasks()),
                None,
                int(s.executorCpuTime()) // 1_000_000,
                None,
                None,
                int(s.inputBytes()),
                int(s.inputRecords()),
                None,
                None,
                int(s.outputBytes()),
                int(s.outputRecords()),
                None,
                _ms_to_ts(sub.get().getTime()) if sub.isDefined() else None,
                _ms_to_ts(first.get().getTime()) if first.isDefined() else None,
                None,
                _ms_to_ts(comp.get().getTime()) if comp.isDefined() else None,
            )
        )
    return spark.createDataFrame(rows, _schema_str(SYSTEM_MODEL["runtime"]["tasks"]))


def runtime_transactions(spark: SparkSession) -> DataFrame:
    """system.runtime.transactions (TransactionsSystemTable.java:61):
    correct shape, zero rows — COMMIT/ROLLBACK are a documented
    by-design skip (no transactional storage in scope, COVERAGE.md)."""
    return spark.createDataFrame(
        [], _schema_str(SYSTEM_MODEL["runtime"]["transactions"])
    )


def metadata_catalogs(spark: SparkSession) -> DataFrame:
    """system.metadata.catalogs (CatalogSystemTable.java:47)."""
    rows = [("system", "system"), ("jmx", "jmx")]
    for c in spark.catalog.listCatalogs():
        rows.append((("hive" if c.name == "spark_catalog" else c.name), c.name))
    return spark.createDataFrame(
        sorted(set(rows)), _schema_str(SYSTEM_MODEL["metadata"]["catalogs"])
    )


def _metadata_properties(spark: SparkSession, which: str) -> DataFrame:
    """schema/table property registries — the session catalog's
    (parquet lake) property surface."""
    if which == "schema_properties":
        rows = [("hive", "location", None, "varchar", "Base file system location URI")]
    else:
        rows = [
            ("hive", "format", "PARQUET", "varchar", "Table storage format"),
            ("hive", "partitioned_by", "[]", "array(varchar)", "Partition columns"),
            ("hive", "bucketed_by", "[]", "array(varchar)", "Bucketing columns"),
            ("hive", "bucket_count", "0", "integer", "Number of buckets"),
        ]
    cols = SYSTEM_MODEL["metadata"][which]
    # description table uses varchar types only except noted; normalize
    return spark.createDataFrame(rows, _schema_str(cols))


def jmx_current(spark: SparkSession, bean: str) -> DataFrame:
    """jmx.current."java.lang:type=X" (presto-jmx JmxMetadata: one row
    per MBean, one column per attribute) over the live JVM's platform
    MXBeans through the Spark gateway."""
    mf = spark._jvm.java.lang.management.ManagementFactory
    b = bean.lower()
    if b.endswith("type=runtime"):
        rt = mf.getRuntimeMXBean()
        rows = [(str(rt.getName()), str(rt.getVmName()), str(rt.getVmVersion()),
                 int(rt.getUptime()), int(rt.getStartTime()))]
        schema = ("name string, vmname string, vmversion string,"
                  " uptime long, starttime long")
    elif b.endswith("type=memory"):
        mu = mf.getMemoryMXBean().getHeapMemoryUsage()
        nh = mf.getMemoryMXBean().getNonHeapMemoryUsage()
        rows = [(int(mu.getInit()), int(mu.getUsed()), int(mu.getCommitted()),
                 int(mu.getMax()), int(nh.getUsed()), int(nh.getCommitted()))]
        schema = ("heapmemoryusage_init long, heapmemoryusage_used long,"
                  " heapmemoryusage_committed long, heapmemoryusage_max long,"
                  " nonheapmemoryusage_used long, nonheapmemoryusage_committed long")
    elif b.endswith("type=threading"):
        th = mf.getThreadMXBean()
        rows = [(int(th.getThreadCount()), int(th.getPeakThreadCount()),
                 int(th.getTotalStartedThreadCount()), int(th.getDaemonThreadCount()))]
        schema = ("threadcount long, peakthreadcount long,"
                  " totalstartedthreadcount long, daemonthreadcount long")
    elif b.endswith("type=classloading"):
        cl = mf.getClassLoadingMXBean()
        rows = [(int(cl.getLoadedClassCount()), int(cl.getTotalLoadedClassCount()),
                 int(cl.getUnloadedClassCount()))]
        schema = ("loadedclasscount long, totalloadedclasscount long,"
                  " unloadedclasscount long")
    elif b.endswith("type=operatingsystem"):
        osb = mf.getOperatingSystemMXBean()
        rows = [(str(osb.getName()), str(osb.getArch()), str(osb.getVersion()),
                 int(osb.getAvailableProcessors()), float(osb.getSystemLoadAverage()))]
        schema = ("name string, arch string, version string,"
                  " availableprocessors long, systemloadaverage double")
    elif b.endswith("type=compilation"):
        cb = mf.getCompilationMXBean()
        rows = [(str(cb.getName()), int(cb.getTotalCompilationTime()))]
        schema = "name string, totalcompilationtime long"
    else:
        raise ValueError(f"jmx table not found: {bean}")
    return spark.createDataFrame(rows, schema)


def jmx_history(spark: SparkSession, bean: str) -> DataFrame:
    """jmx.history."java.lang:type=X" (JmxMetadata.java:73: the history
    schema serves the same tables with a leading ``timestamp`` column of
    periodic dumps).  This app keeps no background dumper, so history =
    the current snapshot stamped now — one row, correct shape."""
    return jmx_current(spark, bean).select(
        F.current_timestamp().alias("timestamp"), "*"
    )


def system_table(spark: SparkSession, schema: str, table: str) -> DataFrame:
    """Dispatch system.<schema>.<table> to its live source."""
    if schema == "information_schema":
        return system_information_schema(spark, table)
    if schema == "runtime":
        fn = {
            "nodes": runtime_nodes,
            "queries": runtime_queries,
            "tasks": runtime_tasks,
            "transactions": runtime_transactions,
        }.get(table)
        if fn:
            return fn(spark)
    if schema == "metadata":
        if table == "catalogs":
            return metadata_catalogs(spark)
        if table in ("schema_properties", "table_properties"):
            return _metadata_properties(spark, table)
    raise ValueError(f"system table not found: system.{schema}.{table}")
