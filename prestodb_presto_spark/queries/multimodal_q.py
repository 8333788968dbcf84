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


@query(
    "multimodal_wav_decode",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
         ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM d),
         s AS (SELECT doc_id,
                      LEAST(GREATEST((ord(c) - 100) * 256, -32768), 32767) AS v
               FROM ch),
         agg AS (SELECT doc_id, COUNT(*) AS n, SUM(ABS(v)) AS sa,
                        SUM(v * v) AS sq, MIN(v) AS mn, MAX(v) AS mx
                 FROM s GROUP BY doc_id)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(sa AS BIGINT) AS sum_abs,
           CAST(sq AS BIGINT) AS sum_sq,
           CAST(mn AS INT) AS min_sample,
           CAST(mx AS INT) AS max_sample
    FROM agg ORDER BY doc_id
    """,
    tags=("multimodal", "pipeline"),
)
def multimodal_wav_decode(spark, sf_dir):
    """REAL audio-codec decode gate: each document synthesizes an actual
    16-bit PCM RIFF/WAVE stream (sample i = clip((codepoint i − 100)·256,
    int16) at 8 kHz — clipped identically by the oracle's LEAST/GREATEST,
    so non-ASCII text stays coherent), and the pipeline decodes those
    bytes with the stdlib wave
    codec (multimodal/codecs.decode_wav) inside an Arrow-batched
    mapInPandas stage — header parse, frame extraction, int16
    little-endian decode all exercised on real binary media.  The
    oracle re-derives every statistic from the text characters in
    closed form; all-integer outputs make the comparison bit-exact.

    At 100 TB: decode is a narrow transform (no shuffle); the heavy
    binary column reaches only this stage thanks to column pruning."""
    from prestodb_presto_spark.multimodal.columns import (
        pack_text_as_wav,
        wav_features,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return wav_features(pack_text_as_wav(docs)).orderBy("doc_id")


@query(
    "multimodal_bmp_decode",
    oracle="""
    WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
               FROM documents WHERE doc_id < 60),
         px AS (SELECT doc_id, w, h, x.x AS x, y.y AS y
                FROM d,
                     LATERAL (SELECT unnest(range(0, w)) AS x) x,
                     LATERAL (SELECT unnest(range(0, h)) AS y) y),
         v AS (SELECT doc_id, w, h,
                      (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
                      (doc_id * 11 + x * 2 + y * 13) % 256 AS g,
                      (doc_id * 17 + x * 5 + y * 7) % 256 AS b
               FROM px)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b
    FROM v GROUP BY doc_id, w, h ORDER BY doc_id
    """,
    tags=("multimodal", "pipeline"),
)
def multimodal_bmp_decode(spark, sf_dir):
    """REAL image-codec decode gate: each document synthesizes an actual
    24-bit uncompressed BMP (V3 54-byte header, bottom-up 4-byte-padded
    BGR rows) with closed-form pixels, and the pipeline decodes those
    bytes with the hand-rolled struct parser
    (multimodal/codecs.decode_bmp) in an Arrow-batched mapInPandas
    stage — header unpack, row padding, BGR→RGB flip all exercised on
    real binary media.  The oracle recomputes the per-channel pixel sums
    from the same closed form; integer outputs, bit-exact."""
    from prestodb_presto_spark.multimodal.columns import (
        bmp_features,
        pack_ids_as_bmp,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return bmp_features(pack_ids_as_bmp(docs)).orderBy("doc_id")


@query(
    "multimodal_dedup_phash",
    oracle="""
    WITH ids AS (SELECT doc_id, (doc_id // 2) * 2 AS i, doc_id % 2 AS odd
                 FROM documents WHERE doc_id < 200),
         dims AS (SELECT doc_id, i, odd, 4 + i % 7 AS w, 4 + i % 5 AS h FROM ids),
         grid AS (SELECT d.*, yi.range AS yi, xj.range AS xj
                  FROM dims d, range(8) yi, range(9) xj),
         sampled AS (SELECT doc_id, i, odd, yi, xj,
                            (yi * h) // 8 AS y, (xj * w) // 9 AS x
                     FROM grid),
         gray AS (SELECT doc_id, yi, xj,
            ( (i*7  + x*37 + y*59 + x*y*(1 + i % 13)
               + CASE WHEN odd = 1 AND x = 0 AND y = 0 THEN 8 ELSE 0 END) % 256
            + (i*11 + x*23 + y*41 + x*y*(2 + i % 11)) % 256
            + (i*17 + x*29 + y*31 + x*y*(3 + i % 7)) % 256 ) // 3 AS g
                  FROM sampled),
         bits AS (SELECT a.doc_id, a.yi, a.xj AS j,
                         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
                  FROM gray a JOIN gray b
                    ON b.doc_id = a.doc_id AND b.yi = a.yi AND b.xj = a.xj + 1
                  WHERE a.xj < 8),
         halves AS (SELECT doc_id,
             CAST(SUM(CASE WHEN yi < 4
                  THEN bit * (1::BIGINT << ((yi % 4) * 8 + j)) ELSE 0 END) AS BIGINT) AS h_hi,
             CAST(SUM(CASE WHEN yi >= 4
                  THEN bit * (1::BIGINT << ((yi % 4) * 8 + j)) ELSE 0 END) AS BIGINT) AS h_lo
                    FROM bits GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          bit_count(xor(a.h_hi, b.h_hi))
                        + bit_count(xor(a.h_lo, b.h_lo)) AS hamming
                   FROM halves a JOIN halves b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b
    """,
    tags=("multimodal", "dedup", "pipeline"),
)
def multimodal_dedup_phash(spark, sf_dir):
    """Perceptual-hash image dedup gate (multimodal/phash.py): synthesize
    REAL near-dup BMP pairs (pack_near_dup_bmps — docs 2k/2k+1 share a
    base image, odd copy perturbed by one pixel channel), decode + dHash
    them in one Arrow-batched pass, then find all pairs within Hamming 3
    via 16-bit band LSH (capped hot buckets + single-shuffle pair
    expansion — the standard LSH posture of every dedup path here).
    Banding is EXACT for d=3 over 4 bands (pigeonhole), so the DuckDB
    oracle brute-forces the same answer: it re-derives the 9x8-grid
    dHash from the closed-form pixel functions entirely in SQL and
    compares all pairs.  Reference analog: dedup/similarity are the
    engine-extension tier (SURVEY §2 'training-data pipeline ops');
    image hashing itself is UDF-tier work in the reference too."""
    from prestodb_presto_spark.multimodal.columns import pack_near_dup_bmps
    from prestodb_presto_spark.multimodal.phash import phash_images, phash_near_pairs

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    hashes = phash_images(pack_near_dup_bmps(docs))
    return phash_near_pairs(hashes, d=3).orderBy("id_a", "id_b")
