"""Streaming sinks: checkpointed writeStream conventions.

The reference has no streaming execution (SURVEY §2.8); this is the
additive module's output side.  Conventions baked in:

  - every sink is checkpointed (exactly-once bookkeeping lives with the
    sink, never ad hoc);
  - availableNow for batch-drain runs (replaces the deprecated
    Trigger.Once) — process everything pending, then stop;
  - parquet sinks partition by a time-derived column so downstream batch
    reads partition-prune (the hypertable-rollup layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str | None = "event_date",
    ts_col: str = "ts",
    available_now: bool = True,
    mode: str = "append",
) -> StreamingQuery:
    """Checkpointed parquet sink, hive-partitioned by event date."""
    out = sdf
    if partition_col and partition_col not in sdf.columns:
        out = sdf.withColumn(partition_col, F.to_date(F.col(ts_col)))
    writer = (
        out.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_col:
        writer = writer.partitionBy(partition_col)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_foreach_batch(
    sdf: DataFrame,
    checkpoint: str,
    batch_fn,
    available_now: bool = True,
    mode: str = "update",
) -> StreamingQuery:
    """foreachBatch sink: batch_fn(df, epoch_id) runs the full batch
    DataFrame API (merge/upsert/custom writers) per micro-batch —
    idempotent via epoch_id + the checkpoint."""
    writer = (
        sdf.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(batch_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
