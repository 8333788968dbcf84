"""File / external-system readers and writers.

Scale posture baked into the defaults:
  - columnar formats (parquet/orc) get predicate pushdown + column
    pruning from the vectorized readers — the reference's
    TupleDomain-pushdown path (presto-spi/.../predicate/TupleDomain.java)
    is Catalyst's PushedFilters, asserted in tests/test_plans.py;
  - writes default to snappy parquet with optional hive-style
    partitioning (`partition_by`) — the partition-pruning fast path the
    reference implements in PickTableLayout
    (sql/planner/iterative/rule/PickTableLayout.java);
  - bucketed writes (`bucket_by`) pre-shuffle once at write time so
    later equi-joins/aggregations on the bucket key are exchange-free —
    the reference's grouped execution (execution/Lifespan.java,
    PlanFragmenter.analyzeGroupedExecution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READ_FORMATS = ("parquet", "orc", "csv", "json", "text", "avro", "binaryFile")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read a table from files.

    CSV/JSON default to schema inference only when no schema is given —
    at 100 TB always pass ``schema`` (inference is an extra full scan);
    the reference never infers (connector-provided schemas only,
    presto-spi/.../ConnectorTableMetadata.java).
    """
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported read format {fmt!r}; one of {READ_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_text_table(
    spark: SparkSession,
    path: str,
    schema: str,
    delimiter: str = "|",
    skip_header: int = 0,
    skip_footer: int = 0,
) -> DataFrame:
    """Hive TEXTFILE table with ``skip.header.line.count`` /
    ``skip.footer.line.count`` TBLPROPERTIES (reference presto-hive
    HiveTableProperties / product test tables_with_header_and_footer.sql).

    Header/footer lines are skipped PER FILE, matching Hive.  Footer
    skipping (and multi-line headers) requires knowing where each file
    ends, so those paths read whole files per task — the same trade Hive
    makes (it disables input splitting for footer-skipped tables).  Line
    extraction happens in an Arrow-batched pass; field split + casts
    stay JVM-side codegen.  At 100 TB the parallel unit is the file,
    which is how such tables are laid out anyway."""
    if skip_footer == 0 and skip_header <= 1:
        # splittable fast path — Spark's native csv reader
        return (
            spark.read.schema(schema)
            .option("sep", delimiter)
            .option("header", "true" if skip_header == 1 else "false")
            .csv(path)
        )
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(schema) if isinstance(schema, str) else schema

    def lines_gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                lines = bytes(content).decode("utf-8").splitlines()
                end = len(lines) - skip_footer
                out.extend(lines[skip_header:end])
            yield pd.DataFrame({"value": out})

    lines = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(lines_gen, "value string")
    )
    import re as _re

    parts = F.split(F.col("value"), _re.escape(delimiter))
    return lines.select(
        *[
            parts.getItem(i).cast(f.dataType).alias(f.name)
            for i, f in enumerate(target.fields)
        ]
    )


def write_table(
    df: DataFrame,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
    **options,
) -> None:
    """Write a DataFrame as a table (TableWriterOperator/TableFinishOperator,
    operator/TableWriterOperator.java:51 — Spark handles the
    write-then-commit protocol natively).

    ``bucket_by=(n, cols)`` requires ``table_name`` (buckets live in the
    session catalog so the reader can exploit them).
    """
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    if bucket_by is not None:
        if table_name is None:
            raise ValueError("bucketed writes need table_name (catalog-managed)")
        n, cols = bucket_by
        writer.bucketBy(n, *cols).sortBy(*cols).saveAsTable(table_name)
    elif table_name is not None:
        writer.saveAsTable(table_name)
    else:
        if path is None:
            raise ValueError("need path or table_name")
        writer.save(path)


def drop_table(spark: SparkSession, table_name: str) -> None:
    """DROP TABLE IF EXISTS — including a stale warehouse location left
    by a PREVIOUS session (a managed table's directory survives the
    in-memory catalog, and saveAsTable then fails with
    LOCATION_ALREADY_EXISTS).  Mirrors the reference's DROP TABLE
    metadata-delete semantics (MetadataDeleteOperator).

    If the table is registered, its real location and MANAGED/EXTERNAL
    type come from the catalog: DROP TABLE removes managed data itself,
    and EXTERNAL data is never touched.  Only when the catalog has no
    entry (the stale-directory case this function exists for) is the
    default warehouse location considered — resolved per Spark's layout
    (qualified ``db.tbl`` lives under ``<wh>/<db>.db/<tbl>``) and
    deleted only when its contents look like table output (part files /
    commit markers / partition dirs), never an arbitrary same-named
    directory."""
    import os
    import shutil
    from urllib.parse import urlparse

    parts = [p.strip("`") for p in table_name.split(".")]
    exists = spark.catalog.tableExists(table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if exists:
        # catalog-managed drop already removed managed data; external
        # locations are intentionally preserved (reference Hive
        # semantics: DropTableTask only deletes managed tables' data)
        return
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if not wh:
        return
    if len(parts) == 1:
        loc = f"{wh.rstrip('/')}/{parts[0].lower()}"
    elif len(parts) == 2:
        loc = f"{wh.rstrip('/')}/{parts[0].lower()}.db/{parts[1].lower()}"
    else:
        return
    if not os.path.isdir(loc):
        return

    def _is_table_artifact(entry: str) -> bool:
        return (
            entry.startswith("part-")
            or entry.startswith("_SUCCESS")
            or entry.startswith("_committed")
            or entry.startswith("_started")
            or entry == "_temporary"
            or entry.endswith(".crc")
            or "=" in entry  # partition directory key=value
        )

    if all(_is_table_artifact(e) for e in os.listdir(loc)):
        shutil.rmtree(loc, ignore_errors=True)


def blackhole(df: DataFrame) -> None:
    """presto-blackhole: materialize every row, write nothing (noop sink)."""
    df.write.format("noop").mode("overwrite").save()


def jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """presto-base-jdbc / presto-mysql / presto-postgresql → spark.read.jdbc.

    Parallel reads need (partition_column, bounds) — the analog of the
    reference's JDBC splits (presto-base-jdbc/.../JdbcSplit.java); Spark
    pushes filters/projection into the remote SQL the same way the
    reference's JdbcRecordCursor builds its SELECT.  External servers
    (mysql/postgres/sqlserver/redshift) need their driver jar on the
    classpath; the embedded Derby driver ships with Spark and exercises
    the full path end-to-end (tests/test_sources_ddl.py).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("numPartitions", str(num_partitions))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned jdbc read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    **options,
) -> None:
    """JDBC sink (reference JdbcPageSink: presto-base-jdbc/.../
    JdbcPageSink.java builds batched INSERTs; Spark's JDBC writer does
    the same with executor-side batches, one connection per partition)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """presto-kafka (topics as batch-scannable tables,
    presto-kafka/.../KafkaSplit.java:34) → spark.read.format("kafka").

    Value decoding (the reference's presto-record-decoder csv/json/raw
    decoders) is `from_json` / `from_csv` / raw binary on the returned
    `value` column.  Gated: needs the spark-sql-kafka package at runtime.
    """
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )


def read_binary_files(
    spark: SparkSession, path: str, path_glob: str | None = None
) -> DataFrame:
    """Opaque-media ingestion: files as (path, modificationTime, length,
    content binary) rows — the landing reader for the multimodal column
    convention (multimodal/columns.py).  Pair with attach_media_meta to
    stamp kind/format.  pathGlobFilter prunes by extension at listing
    time (no content read for filtered files)."""
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)
