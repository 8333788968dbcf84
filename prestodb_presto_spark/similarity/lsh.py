"""Random-hyperplane LSH for approximate NN — the 100 TB scale path.

Plan shape (why it scales): the vector column explodes once to
(vec_id, dim, value) rows, and each of the 16 plane projections is a
SUM of value × an *inline hash expression* of the dimension index —
no coefficient table, no broadcast join, no driver-side dims probe.
One groupBy(vec_id) with 16 SUM accumulators yields all projections;
the shuffle payload is 16 longs per vector.  Bucketing and the
candidate join then touch only (bucket, id) pairs, with a hot-bucket
cap bounding the bucket-local self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16
DEFAULT_BUCKET_CAP = 200


def _coeff(p: int) -> Column:
    """Deterministic pseudo-random hyperplane coefficient for (plane p,
    current `dim` row): hash-derived int in [-8, 8).  Pure expression —
    computed where the data lives, never materialized as a table.  The
    hash is the engine's md5-prefix convention (not xxhash64) so DuckDB
    derives identical coefficients and similarity_lsh_ann hash-matches
    its differential oracle."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"plane-{p}-"), F.col("dim"))), 1, 15), 16, 10
    ).cast("bigint")
    return h % 16 - 8


def hyperplane_buckets(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket): 16-bit signature of hyperplane projection signs."""
    flat = emb.select(id_col, F.posexplode(quant(vec_col)).alias("dim", "x"))
    proj = flat.groupBy(id_col).agg(
        *[F.sum(F.col("x") * _coeff(p)).alias(f"s{p}") for p in range(N_PLANES)]
    )
    bucket = sum(
        (F.when(F.col(f"s{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0)) for p in range(N_PLANES)),
        F.lit(0),
    )
    return proj.select(id_col, bucket.cast("bigint").alias("bucket"))


def quant(vec_col):
    return F.transform(F.col(vec_col), lambda x: F.round(x * 1000).cast("bigint"))


def lsh_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Pairs sharing an LSH bucket (bucket-local self-join).

    ``bucket_cap`` drops buckets holding more than that many vectors
    before the self-join, bounding candidates at O(cap · n) — one
    degenerate bucket (e.g. a spike of near-zero embeddings) would
    otherwise go quadratic.  Recall impact: only pairs whose single
    shared bucket is hot are lost; ``bucket_cap=None`` disables.
    """
    sig = hyperplane_buckets(emb, id_col, vec_col)
    if bucket_cap is not None:
        sig = (
            sig.withColumn("__bsz", F.count("*").over(Window.partitionBy("bucket")))
            .filter(F.col("__bsz") <= bucket_cap)
            .drop("__bsz")
        )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
