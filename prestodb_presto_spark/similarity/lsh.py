"""Random-hyperplane LSH for approximate NN — the 100 TB scale path.

Plan shape (why it scales): the vector column explodes once to
(vec_id, dim, value) rows, joins a broadcast 64×16 coefficient table,
and one groupBy(vec_id) with 16 SUM accumulators yields all plane
projections — a single shuffle whose payload is 16 doubles per vector.
Bucketing and the candidate join then touch only (bucket, id) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PLANES = 16


def _coeff_table(spark: SparkSession, dims: int) -> DataFrame:
    """Deterministic pseudo-random hyperplane coefficients: hash-derived
    ints in [-8, 8), one row per dim with N_PLANES coefficient columns."""
    rows = spark.range(dims).select(F.col("id").alias("dim"))
    coeffs = [
        (F.xxhash64(F.concat(F.lit(f"plane-{p}-"), F.col("dim"))) % 16 - 8)
        .cast("bigint")
        .alias(f"c{p}")
        for p in range(N_PLANES)
    ]
    return rows.select("dim", *coeffs)


def hyperplane_buckets(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket): 16-bit signature of hyperplane projection signs."""
    spark = emb.sparkSession
    dims = len(emb.select(vec_col).first()[0])
    coeff = _coeff_table(spark, dims)
    flat = emb.select(
        id_col, F.posexplode(quant(vec_col)).alias("dim", "x")
    )
    proj = (
        flat.join(F.broadcast(coeff), "dim")
        .groupBy(id_col)
        .agg(*[F.sum(F.col("x") * F.col(f"c{p}")).alias(f"s{p}") for p in range(N_PLANES)])
    )
    bucket = sum(
        (F.when(F.col(f"s{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0)) for p in range(N_PLANES)),
        F.lit(0),
    )
    return proj.select(id_col, bucket.cast("bigint").alias("bucket"))


def quant(vec_col):
    return F.transform(F.col(vec_col), lambda x: F.round(x * 1000).cast("bigint"))


def lsh_candidate_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Pairs sharing an LSH bucket (bucket-local self-join)."""
    sig = hyperplane_buckets(emb, id_col, vec_col)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
