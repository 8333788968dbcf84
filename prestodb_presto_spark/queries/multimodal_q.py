"""Multimodal-column gate queries — hard driver signal for the
mapInPandas media pipelines (multimodal/columns.py).

The fixture text is ASCII word soup, so the byte-level features the
Arrow-batched decoder computes (length / mean byte / entropy / frame
windows) are all independently derivable by DuckDB from the same text
with per-character SQL — a real differential check of the mapInPandas
flow (schema, Arrow batching, fan-out), not a rows-only count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prestodb_presto_spark.queries import query
from prestodb_presto_spark.queries.util import t


@query(
    "multimodal_decode_features",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
         ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM d),
         cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
         tot AS (SELECT doc_id, CAST(SUM(k) AS DOUBLE) AS n,
                        SUM(k * ord(c)) AS byte_sum,
                        SUM(k * log2(k)) AS klogk
                 FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           byte_sum / n AS mean_byte,
           ROUND(log2(n) - klogk / n, 6) AS byte_entropy
    FROM tot ORDER BY doc_id
    """,
    tags=("multimodal", "pipeline"),
)
def multimodal_decode_features(spark, sf_dir):
    """Arrow-batched byte-feature extraction over binary media columns
    (multimodal/columns.py::decode_features, mapInPandas narrow
    transform).  The oracle recomputes length / mean byte / Shannon
    entropy per document from the characters in SQL (ASCII fixture ⇒
    codepoint = byte; −Σp·log2 p = log2 n − Σk·log2 k / n)."""
    from prestodb_presto_spark.multimodal.columns import (
        decode_features,
        pack_text_as_media,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    feats = decode_features(pack_text_as_media(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.col("mean_byte"),
        F.round("byte_entropy", 6).alias("byte_entropy"),
    ).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n
               FROM documents WHERE doc_id < 50 AND octet_length(encode(text)) > 0),
         f AS (SELECT doc_id, n, unnest(generate_series(0, 3)) AS frame_idx,
                      GREATEST((n - 64) // 3, 1) AS step
               FROM d)
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(LEAST(64, n - LEAST(frame_idx * step, GREATEST(n - 64, 0))) AS BIGINT)
             AS frame_bytes
    FROM f ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "pipeline"),
)
def multimodal_frame_sample(spark, sf_dir):
    """Deterministic frame sampling (1→N fan-out mapInPandas,
    multimodal/columns.py::frame_sample): 4 fixed 64-byte windows per
    media row; the oracle reproduces the window offsets/lengths in
    closed form."""
    from prestodb_presto_spark.multimodal.columns import (
        frame_sample,
        pack_text_as_media,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    frames = frame_sample(pack_text_as_media(docs))
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.octet_length("frame").cast("bigint").alias("frame_bytes"),
    ).orderBy("doc_id", "frame_idx")
