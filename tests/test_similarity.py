"""Similarity-search library tests: exact kNN vs numpy, LSH recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from prestodb_presto_spark.similarity import top_k_neighbors
from prestodb_presto_spark.similarity.lsh import lsh_candidate_pairs
from tests.conftest import SF_TINY


def _emb(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet")


def test_top_k_matches_numpy(spark):
    emb = _emb(spark)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    # same quantization as the Spark path so argmax ties agree
    mat = np.round(np.array([r.embedding for r in rows], dtype=np.float64) * 1000)
    norms = np.sqrt((mat * mat).sum(axis=1))
    queries = emb.filter(F.col("vec_id") < 5)
    got = top_k_neighbors(emb, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    for qid, lst in by_q.items():
        lst.sort()
        qi = np.where(ids == qid)[0][0]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        cos[qi] = -2  # exclude self
        order = np.lexsort((ids, -cos))[:3]
        assert [n for _, n, _ in lst] == [int(ids[i]) for i in order]
        for (_, _, c), i in zip(lst, order):
            assert abs(c - cos[i]) < 1e-9


def test_lsh_buckets_nontrivial_and_recall(spark):
    emb = _emb(spark)
    cands = lsh_candidate_pairs(emb)
    n_pairs = cands.count()
    n = emb.count()
    # buckets must actually partition the space (not all-in-one, not empty)
    assert 0 < n_pairs < n * (n - 1) / 4


def test_similarity_lsh_hot_bucket_cap(spark):
    """All-identical embeddings collapse into one bucket; the cap bounds
    the bucket-local self-join at O(cap*n) (here: drops it entirely)."""
    from prestodb_presto_spark.similarity.lsh import lsh_candidate_pairs as pairs

    n = 300
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> cast(0.5 as double))").alias("embedding"),
    )
    assert pairs(emb, bucket_cap=50).count() == 0
    assert pairs(emb, bucket_cap=None).count() == n * (n - 1) // 2
