"""prestodb_presto_spark — a PySpark-native analytics engine with the query
surface of the reference engine (Presto 0.206 fork; see SURVEY.md).

Architecture (Spark-first, not a port):
  - ``session``   — tuned SparkSession factory (AQE, UTC, shuffle sizing).
  - ``engine``    — Engine: catalog bootstrap + SQL entry point.
  - ``functions`` — Presto-dialect function registry mapped onto native
                    pyspark.sql.functions (JVM-side; pandas UDF last resort).
  - ``operators`` — relational operator helpers (joins, aggs, windows, ...).
  - ``queries``   — the query catalog exported through __spark_entry__.py
                    (each with a DuckDB oracle where SQL-expressible).
  - ``text``      — dedup / language-ID / quality / tokenization for
                    large-scale training-data pipelines.
  - ``similarity``— embedding similarity search (brute force + LSH).
  - ``streaming`` — Structured Streaming module over the events table.
  - ``multimodal``— binary-column conventions + decode plumbing (stubbed IO).
"""

from prestodb_presto_spark.engine import Engine, TABLES
from prestodb_presto_spark.session import get_spark

__all__ = ["Engine", "TABLES", "get_spark"]
__version__ = "0.1.0"
