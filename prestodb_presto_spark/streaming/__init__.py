"""Structured Streaming module over the `events` table (north star).

The reference has NO streaming execution (SURVEY.md §2.8 — its Kafka
connector reads topics as batch splits: presto-kafka/.../KafkaSplit.java:34).
This module is additive and Spark-first: the same declarative window
operators run in batch and under `readStream`, with watermarks bounding
state — the property the batch/stream equivalence tests pin down.
"""

from prestodb_presto_spark.streaming.ops import (
    dedup_within_watermark,
    read_events_stream,
    session_agg,
    sliding_counts,
    tumbling_counts,
)
from prestodb_presto_spark.streaming.stateful import running_totals_stateful

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "dedup_within_watermark",
    "running_totals_stateful",
]
