"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-state API the reference has no counterpart
for: a per-user running total + event count that survives across
micro-batches, with watermark-driven timeout eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Per-user running totals with arbitrary state (streaming only).

    Shuffle key = user_id; state store is partitioned the same way, so
    at scale each task owns a user-range shard of the state.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
