"""Bucket-grouped pair expansion for capped LSH candidate generation.

The naive candidate step self-equi-joins the (id, bucket) band rows on
the bucket key — TWO shuffles of the band relation (one per join side).
When a hot-bucket cap has already bounded every bucket (operators/skew.
drop_hot_buckets), the same pairs come from ONE shuffle: groupBy the
bucket key, collect the (≤ cap) member ids, and expand each bucket's
sorted id set to its i<j pairs in-task.  Per-bucket cost is bounded by
cap ids collected and cap²/2 pairs exploded — both memory-safe ONLY
because over-cap buckets were dropped first, which is why the callers
(text/minhash.py, text/simhash.py, similarity/lsh.py) fall back to the
self-join on the uncapped path.

Reference parity note: the reference has no LSH operator; this is the
engine's own 100 TB dedup machinery (SURVEY §2 north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_pair_expand(
    df: DataFrame,
    bucket_cols: str | list[str],
    id_col: str,
    payload: list[str] | tuple[str, ...] = (),
    distinct: bool = True,
) -> DataFrame:
    """(id, bucket[, payload...]) rows → (id_a < id_b[, payload_a/_b])
    pairs sharing a bucket.

    ``payload`` columns ride along per side as ``<name>_a`` /
    ``<name>_b`` (e.g. the simhash fingerprints the verify step needs —
    carrying them through the expansion avoids a join-back).
    ``distinct=False`` skips the final dedup for callers whose buckets
    are disjoint per pair (single-bucket AND-amplified LSH); payload
    values must be functionally determined by the id for ``distinct``
    to stay a pure pair dedup."""
    keys = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    pay = list(payload)
    if pay:
        elem = F.struct(F.col(id_col).alias("_id"), *[F.col(c) for c in pay])
        # array_sort on structs orders by field position: _id leads, so
        # pairs come out id_a < id_b
        outs = ", ".join(
            ["x._id AS id_a", "y._id AS id_b"]
            + [f"x.{c} AS {c}_a" for c in pay]
            + [f"y.{c} AS {c}_b" for c in pay]
        )
        cols = ["p.id_a", "p.id_b"] + [f"p.{c}_a" for c in pay] + [f"p.{c}_b" for c in pay]
    else:
        elem = F.col(id_col)
        outs = "x AS id_a, y AS id_b"
        cols = ["p.id_a", "p.id_b"]
    out = (
        df.groupBy(*keys)
        .agg(F.collect_set(elem).alias("es0"))
        .filter(F.size("es0") >= 2)
        # r13: sort ONCE per bucket — Catalyst does not CSE inside HOF
        # lambdas, so the old single-expression form re-sorted the set
        # for every outer element
        .select(F.array_sort("es0").alias("es"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(es, (x, i) ->"
                    " transform(slice(es, i + 2, size(es)),"
                    f" y -> struct({outs}))))"
                )
            ).alias("p")
        )
        .select(*cols)
    )
    return out.distinct() if distinct else out
