"""Query catalog: every operator claimed in SURVEY.md §2 has an entry here.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an ANSI-SQL oracle string DuckDB can run on the same parquet tables.
The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json) — so
column names/ordering must match exactly, and floating results must be
made deterministic (see queries.determinism notes).

Modules self-register via the @query decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver falls back to rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation in the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from prestodb_presto_spark.queries import (  # noqa: F401
        aggregates,
        functions_q,
        joins,
        relational,
        setops,
        similarity_q,
        streaming_batch,
        textops,
        tpch,
        windows_q,
    )

    return REGISTRY
