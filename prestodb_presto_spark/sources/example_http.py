"""example-http connector — a REAL DataSource V2 implementation in pure
Python (Spark 4's Python DataSource API), re-expressing the reference's
presto-example-http plugin:

  - catalog: a JSON document mapping schema → tables, each table naming
    typed columns and a list of source URIs
    (presto-example-http/.../ExampleClient.java:95 lookupSchemas;
    test fixture example-metadata.json);
  - splits: ONE per source URI — each fetches independently on an
    executor (ExampleSplitManager.java / ExampleSplit.java);
  - rows: comma-split, trimmed CSV lines typed per the catalog column
    types (ExampleRecordCursor.java:42 LINE_SPLITTER + per-type
    getLong/getDouble/getBoolean/getSlice).

This is the engine's template for "remote service as a table"
connectors (the cassandra/mongodb/accumulo pattern when their Spark
packages are absent): metadata fetch on the driver, split-per-shard,
executor-side fetch+decode — all without a JVM jar.

Usage:
    spark.dataSource.register(ExampleHttpDataSource)
    df = (spark.read.format("example_http")
          .option("metadata", "http://host/example-metadata.json")
          .option("schema", "example").option("table", "numbers").load())
"""

from __future__ import annotations

import json
from urllib.parse import urljoin
from urllib.request import urlopen

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# presto type spellings used by the example catalog
# (ExampleColumnHandle types; spi BIGINT/INTEGER/DOUBLE/BOOLEAN/VARCHAR)
_TYPES = {
    "BIGINT": LongType(),
    "INTEGER": IntegerType(),
    "DOUBLE": DoubleType(),
    "BOOLEAN": BooleanType(),
    "VARCHAR": StringType(),
}


def _fetch(uri: str) -> str:
    if "://" not in uri:
        uri = "file://" + uri
    with urlopen(uri) as resp:  # noqa: S310 (file/http catalog URIs by design)
        return resp.read().decode("utf-8")


def _load_table(metadata_uri: str, schema: str, table: str):
    """(columns: [(name, presto_type)], sources: [absolute uri]) —
    source URIs resolve against the metadata URI like the reference's
    tableUriResolver (ExampleClient.java:113)."""
    catalog = json.loads(_fetch(metadata_uri))
    tables = catalog.get(schema)
    if tables is None:
        raise ValueError(f"unknown schema {schema!r} (have {sorted(catalog)})")
    for t in tables:
        if t["name"] == table:
            cols = [(c["name"], c["type"].upper()) for c in t["columns"]]
            base = metadata_uri if "://" in metadata_uri else "file://" + metadata_uri
            srcs = [urljoin(base, s) for s in t["sources"]]
            return cols, srcs
    raise ValueError(f"unknown table {schema}.{table}")


class _SourceSplit(InputPartition):
    def __init__(self, uri: str):
        self.uri = uri


class ExampleHttpReader(DataSourceReader):
    def __init__(self, columns, sources):
        self._columns = columns
        self._sources = sources

    def partitions(self):
        # one split per source URI — the reference's ExampleSplitManager
        # emits exactly this (one ExampleSplit per table source)
        return [_SourceSplit(u) for u in self._sources]

    def read(self, partition):
        # executor-side fetch + decode (ExampleRecordCursor):
        # comma-split, trimmed, typed per catalog column
        text = _fetch(partition.uri)
        casts = []
        for _name, ptype in self._columns:
            if ptype == "BIGINT":
                casts.append(int)
            elif ptype == "INTEGER":
                casts.append(int)
            elif ptype == "DOUBLE":
                casts.append(float)
            elif ptype == "BOOLEAN":
                casts.append(lambda v: v.lower() == "true")
            else:
                casts.append(str)
        n = len(casts)
        for line in text.splitlines():
            if not line.strip():
                continue
            cells = [c.strip() for c in line.split(",")]
            yield tuple(
                None if i >= len(cells) or cells[i] == "" else casts[i](cells[i])
                for i in range(n)
            )


class ExampleHttpDataSource(DataSource):
    """format("example_http") with options metadata/schema/table."""

    @classmethod
    def name(cls) -> str:
        return "example_http"

    def _table(self):
        meta = self.options.get("metadata")
        if not meta:
            raise ValueError("example_http requires option 'metadata' (catalog URI)")
        return _load_table(
            meta,
            self.options.get("schema", "example"),
            self.options.get("table", "numbers"),
        )

    def schema(self) -> StructType:
        cols, _ = self._table()
        return StructType(
            [StructField(n, _TYPES.get(t, StringType()), True) for n, t in cols]
        )

    def reader(self, schema: StructType) -> ExampleHttpReader:
        cols, srcs = self._table()
        return ExampleHttpReader(cols, srcs)


def register_example_http(spark) -> None:
    """Idempotent registration of the example_http format."""
    spark.dataSource.register(ExampleHttpDataSource)
