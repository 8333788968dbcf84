"""presto-memory analog: named in-memory tables.

The reference's memory connector stores inserted pages on the workers
(presto-memory module); Spark-first that's a cached DataFrame published
as a temp view — same contract (fast re-scan, session lifetime, DML via
re-registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class MemoryTable:
    """A session-scoped, cached, named table supporting append/truncate.

    >>> mt = MemoryTable(spark, "scratch", df.schema)
    >>> mt.insert(df)          # INSERT INTO scratch SELECT ...
    >>> spark.table("scratch") # query it by name
    >>> mt.truncate()
    """

    def __init__(self, spark: SparkSession, name: str, schema):
        self.spark = spark
        self.name = name
        self.schema = schema
        self._df: DataFrame = spark.createDataFrame([], schema)
        self._publish()

    def _publish(self) -> None:
        self._df.cache()
        self._df.createOrReplaceTempView(self.name)

    def insert(self, rows: DataFrame) -> None:
        if rows.schema != self.schema:
            raise ValueError(
                f"schema mismatch inserting into {self.name}: "
                f"{rows.schema.simpleString()} != {self.schema.simpleString()}"
            )
        old = self._df
        self._df = old.unionAll(rows)
        self._publish()
        old.unpersist()

    def truncate(self) -> None:
        old = self._df
        self._df = self.spark.createDataFrame([], self.schema)
        self._publish()
        old.unpersist()

    def drop(self) -> None:
        self.spark.catalog.dropTempView(self.name)
        self._df.unpersist()
