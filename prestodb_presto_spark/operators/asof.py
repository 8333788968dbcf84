"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row with the same key whose
timestamp is <= the left timestamp.  The naive formulation is an
inequality join (quadratic per key); the scalable plan is union-merge:

  1. tag both sides and union them (no join!);
  2. one window over (key ORDER BY ts, side-tag) carries the most recent
     right-side attributes forward via last_value(ignorenulls);
  3. keep the left rows.

Cost: ONE shuffle of left+right on the key — the same price as a plain
equi-join — independent of how many right rows precede each left row.
This is the standard large-scale point-in-time-correctness pattern for
feature stores / trade-quote matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    right_cols: right-side payload columns to attach (null when no right
    row precedes the left row, or when outside ``tolerance_seconds``).
    """
    # The whole right payload rides in ONE struct carried by a single
    # last(ignorenulls=True): per-column carries would mix columns from
    # different right rows whenever the latest right row holds a
    # legitimate NULL in one payload column (it would be skipped for that
    # column only, surfacing a stale non-null from an older row).
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
        ).alias("__r"),
    )
    lhs = lhs.withColumn("__r", F.lit(None).cast(rhs.schema["__r"].dataType))
    merged = lhs.select(*rhs.columns, *[c for c in lhs.columns if c not in rhs.columns]).unionByName(
        rhs, allowMissingColumns=True
    )
    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        stale = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__r.__rts").cast("timestamp").cast("double")
        ) > tolerance_seconds
        out = out.withColumn("__r", F.when(stale, F.lit(None)).otherwise(F.col("__r")))
    keep = [c for c in left.columns] + [F.col(f"__r.{c}").alias(c) for c in right_cols]
    return out.select(*keep)
