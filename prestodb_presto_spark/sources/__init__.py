"""Sources & sinks — the engine's "connector" surface (SURVEY.md §2.2).

The reference exposes each source through the SPI
(presto-spi/.../ConnectorPageSource.java, ConnectorPageSink.java,
ConnectorSplit.java); every connector is a Maven module.  Spark-first,
each maps to a DataSource (v2) format, so this package is a thin,
audited dispatch layer rather than a protocol implementation:

| reference module                  | here                                |
|-----------------------------------|-------------------------------------|
| presto-hive (parquet/orc/text)    | read_table/write_table format=...   |
| presto-orc / presto-rcfile        | format="orc" (vectorized reader)    |
| presto-local-file                 | format="csv"/"json"/"text"          |
| presto-base-jdbc + dialects       | jdbc()/jdbc_write() (Derby e2e)     |
| presto-kafka / presto-redis       | kafka() batch/stream (gated)        |
| presto-memory                     | memory.MemoryTable (cached view)    |
| presto-example-http               | example_http.py (pure-Python DSv2)  |
| presto-blackhole                  | blackhole() noop sink               |
| presto-tpch / presto-tpcds        | fixtures.load_fixture (testdata)    |
"""

from prestodb_presto_spark.sources.io import (
    blackhole,
    jdbc,
    jdbc_write,
    kafka_batch,
    read_table,
    read_text_table,
    write_table,
)
from prestodb_presto_spark.sources.example_http import (
    ExampleHttpDataSource,
    register_example_http,
)
from prestodb_presto_spark.sources.kafka_source import KafkaPyDataSource, register_kafka_py
from prestodb_presto_spark.sources.memory import MemoryTable
from prestodb_presto_spark.sources.cassandra_source import (
    CassandraDataSource,
    register_cassandra,
)
from prestodb_presto_spark.sources.mongo_source import MongoDataSource, register_mongo
from prestodb_presto_spark.sources.redis_source import RedisDataSource, register_redis
from prestodb_presto_spark.sources.thrift_source import ThriftDataSource, register_thrift

__all__ = [
    "read_table",
    "read_text_table",
    "write_table",
    "blackhole",
    "jdbc",
    "jdbc_write",
    "kafka_batch",
    "MemoryTable",
    "ExampleHttpDataSource",
    "register_example_http",
    "RedisDataSource",
    "register_redis",
    "MongoDataSource",
    "register_mongo",
    "CassandraDataSource",
    "register_cassandra",
    "KafkaPyDataSource",
    "register_kafka_py",
    "ThriftDataSource",
    "register_thrift",
]
