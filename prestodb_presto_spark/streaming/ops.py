"""Streaming operators: windowed aggregation, sessionization, dedup.

Every transformation here is sink-agnostic and works on both a batch
DataFrame and a streaming one — the watermark is a no-op in batch, so
tests can assert stream(availableNow) == batch on the same input.

Scale posture: state size is bounded by (watermark horizon × key
cardinality); keys are (window, event_type) or user_id — the shuffle
partitioning of stateful operators follows those keys automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# long-nanos events schema — used by tests that stage their own parquet
# micro-batches with raw int64 ts values (the fixture's own schema is probed
# at runtime in read_events_stream; Spark ≥4.1 reads its TIMESTAMP(NANOS)
# column as timestamp_ntz, older Sparks as long via the legacy conf)
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


_STREAM_DIRS: dict[str, str] = {}


def _stream_dir(sf_dir: str) -> str:
    """File-stream sources need a *directory*; stage one with a symlink to
    the fixture file (read-only testdata cannot be reorganized)."""
    if sf_dir not in _STREAM_DIRS:
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        _STREAM_DIRS[sf_dir] = d
    return _STREAM_DIRS[sf_dir]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (ts truncated to micros).

    The fixture stores ts as TIMESTAMP(NANOS).  Older Sparks only read it
    via the nanosAsLong legacy conf (as raw long nanos); Spark ≥4.1
    ignores that conf and reads timestamp_ntz.  File streams need an
    explicit schema, so probe the footer with a batch read and normalize
    either shape to a micros TIMESTAMP.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_stream_dir(sf_dir))
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, duration: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts (each event lands in duration/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based), the stateful session operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark horizon
    (streaming dropDuplicatesWithinWatermark; plain dropDuplicates in batch)."""
    with_wm = events.withWatermark("ts", watermark)
    if events.isStreaming:
        return with_wm.dropDuplicatesWithinWatermark(["event_id"])
    return with_wm.dropDuplicates(["event_id"])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before: str = "30 minutes",
    after: str = "0 seconds",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream (or batch) interval join: right rows with the same
    key whose timestamp falls in [left_ts - before, left_ts + after].

    In streaming both sides carry watermarks and the time-range join
    condition bounds state retention (Spark drops buffered rows older
    than watermark + interval) — the standard stream-stream equi+range
    join; in batch the watermark is a no-op and the same plan is a
    range-condition hash join.  Columns are prefixed l_/r_ to keep the
    output unambiguous.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l = lw.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c2).alias(f"l_{c2}") for c2 in left.columns if c2 not in (key, left_ts)],
    )
    r = rw.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c2).alias(f"r_{c2}") for c2 in right.columns if c2 not in (key, right_ts)],
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {before}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {after}"))
    )
    return l.join(r, cond)


def enrich_with_dim(events: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Stream-static dimension enrichment: join a (possibly streaming)
    events frame against a static dimension table.

    Spark executes stream-static joins without state — the static side
    is (re)broadcast per micro-batch, so at 100 TB-of-stream scale the
    cost is the dim broadcast, never a shuffle of the stream.  This is
    the streaming twin of the reference's LookupJoin against a
    dimension scan; the batch twin is gated as `events_enrich_dim`.
    """
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, how)
