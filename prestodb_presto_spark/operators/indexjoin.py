"""Index-lookup join — IndexJoinOperator.java, Spark-first.

The reference's IndexJoin probes a CONNECTOR INDEX instead of scanning
the build side: for each probe batch it collects the join keys, asks
the connector for exactly those rows (IndexSourceOperator /
PageBufferOperator), and joins locally.  It exists for index-capable
stores (cassandra, accumulo) where a full scan of the build table would
dwarf the probe.

Spark has no planner rule for this (broadcast join covers the
small-build case), but the OPERATOR maps cleanly: an Arrow-batched
``mapInPandas`` over the probe side where each task

  1. collects its partition's distinct keys (the probe batch),
  2. fetches ONLY those keys from the remote store (batched lookups —
     redis MGET here, a CQL ``IN`` or accumulo batch-scanner in the
     same shape),
  3. joins locally and emits.

Scale posture: the remote store is never scanned — per task the
traffic is O(distinct probe keys in that partition), the exact property
IndexJoinOperator exists for.  Repartition the probe by key first if
duplicate keys spread across partitions (same dedup the reference's
index snapshot cache performs per driver).

The generic core takes any ``lookup(keys) -> {key: value}`` callable;
``index_join_redis`` binds it to the engine's redis connector
(sources/redis_source.RespClient), the natural index store.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def index_lookup_join(
    probe: DataFrame,
    key_col: str,
    lookup_factory: Callable[[], Callable[[list], dict]],
    value_field: str = "value",
    value_type: str = "string",
    how: str = "inner",
    batch_size: int = 500,
) -> DataFrame:
    """Join ``probe`` against a remote index: per partition, fetch only
    that partition's distinct keys via ``lookup_factory()`` (called once
    per task — it may open a connection) and attach the values.

    ``how`` is inner or left (IndexJoinOperator supports exactly these:
    LookupJoinOperators.probe inner/outer)."""
    if how not in ("inner", "left"):
        raise ValueError("index_lookup_join supports inner/left")
    from pyspark.sql.types import StructField, _parse_datatype_string

    schema = StructType(
        list(probe.schema.fields)
        + [StructField(value_field, _parse_datatype_string(value_type))]
    )
    cols = [f.name for f in probe.schema.fields]
    inner = how == "inner"

    def gen(batches) -> Iterator:
        import pandas as pd

        lookup = lookup_factory()
        for pdf in batches:
            keys = pdf[key_col].dropna().unique().tolist()
            found: dict = {}
            for i in range(0, len(keys), batch_size):
                found.update(lookup(keys[i : i + batch_size]))
            vals = pdf[key_col].map(lambda k: found.get(k))
            out = pdf[cols].copy()
            out[value_field] = vals
            if inner:
                out = out[out[value_field].notna()]
            yield out

    return probe.mapInPandas(gen, schema=schema)


def index_join_redis(
    probe: DataFrame,
    key_col: str,
    nodes: str,
    value_field: str = "value",
    how: str = "inner",
    batch_size: int = 500,
) -> DataFrame:
    """IndexJoin against redis: per-task MGET of the probe keys — the
    KV store plays the reference's IndexSourceOperator."""
    host, _, port = nodes.rpartition(":")
    h, p = host or "localhost", int(port)

    def factory():
        from prestodb_presto_spark.sources.redis_source import RespClient

        client = RespClient(h, p)

        def lookup(keys: list) -> dict:
            values = client.command("MGET", *[str(k) for k in keys])
            return {k: v for k, v in zip(keys, values) if v is not None}

        return lookup

    return index_lookup_join(
        probe, key_col, factory, value_field, "string", how, batch_size
    )
