"""Brute-force cosine k-NN — the exact baseline for similarity search.

Scale shape: queries broadcast, corpus streams map-side (no shuffle of
corpus vectors); per-query top-k via window rank over the scored stream.
Vectors quantized to integers so scores are bit-deterministic (exact
int dot products; see queries/similarity_q.py for the oracle contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantized_embedding(col="embedding", scale: int = 1000):
    """array<float> → array<bigint>, round(x*scale)."""
    return F.transform(F.col(col), lambda x: F.round(x * scale).cast("bigint"))


def dot_col(a, b):
    """Integer dot product as one JVM expression (exact for |v|<2^26)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def cosine_col(qa, qb, na, nb):
    """cosine from quantized vectors + precomputed squared norms."""
    return dot_col(qa, qb).cast("double") / F.sqrt(na) / F.sqrt(nb)


def top_k_neighbors(corpus: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    corpus/queries: DataFrames with (id_col, vec_col).  Returns
    (query_id, neighbor_id, rank, cosine) with deterministic tiebreak.
    """
    def prep(df, prefix):
        q = df.select(
            F.col(id_col).alias(f"{prefix}_id"), quantized_embedding(vec_col).alias(f"{prefix}_q")
        )
        return q.withColumn(f"{prefix}_n", dot_col(F.col(f"{prefix}_q"), F.col(f"{prefix}_q")).cast("double"))

    c = prep(corpus, "c")
    q = prep(queries, "q")
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id")).withColumn(
        "cosine", cosine_col(F.col("q_q"), F.col("c_q"), F.col("q_n"), F.col("c_n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return (
        scored.select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cosine",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
