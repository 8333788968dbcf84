"""Binary media columns: schema conventions and mapInPandas pipelines.

Layout convention (what a 100 TB multimodal dataset looks like here):

    content: binary                  -- the encoded bytes (opaque)
    media:   struct<kind string,     -- 'image' | 'audio' | 'video' | 'text'
                    format string,   -- codec/container ('png', 'wav', ...)
                    width int, height int,
                    duration_ms bigint,
                    size_bytes bigint>

Rows stay self-describing, so partition pruning on media.kind/format and
size-based file splitting keep working at scale; the heavy bytes live in
ONE column that column pruning drops unless a stage truly decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("size_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def pack_text_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: utf-8 text bytes as a media row (kind='text').

    Real pipelines land here straight from `spark.read.format('binaryFile')`.
    """
    content = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("utf-8").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.octet_length(content).cast("bigint").alias("size_bytes"),
        ).alias("media"),
    )


def attach_media_meta(df: DataFrame, kind: str, fmt: str, content_col: str = "content") -> DataFrame:
    """Stamp the metadata struct onto an existing binary column."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.octet_length(F.col(content_col)).cast("bigint").alias("size_bytes"),
        ),
    )


WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sum_abs", LongType()),
        StructField("sum_sq", LongType()),
        StructField("min_sample", IntegerType()),
        StructField("max_sample", IntegerType()),
    ]
)

BMP_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def pack_text_as_wav(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: synthesize a REAL 16-bit PCM WAV per document —
    sample i = clip((codepoint i − 100) · 256, int16 range) at 8 kHz —
    so the decode gate exercises the actual RIFF byte format while a SQL
    oracle re-derives every feature from the text in closed form
    (LEAST/GREATEST mirror the clip).  Arithmetic runs in int64 per
    CODE POINT, not UTF-8 byte: the old int16-byte form wrapped negative
    for bytes ≥ 228 while the oracle used unwrapped code points, so any
    non-ASCII document silently diverged."""
    def gen(batches):
        import numpy as np
        import pandas as pd

        from prestodb_presto_spark.multimodal.codecs import encode_wav_pcm16

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                cps = np.fromiter((ord(c) for c in text), dtype=np.int64)
                samples = (
                    np.clip((cps - 100) * 256, -32768, 32767).astype(np.int16)
                )
                content = encode_wav_pcm16(samples, 8000)
                rows.append({"doc_id": doc_id, "content": content})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    packed = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )
    return attach_media_meta(packed, "audio", "wav")


def _wav_feature_batch(batches) -> Iterator:
    """mapInPandas worker: REAL WAV decode (multimodal/codecs.decode_wav,
    stdlib wave) → integer audio statistics.  All-integer outputs keep
    the differential oracle bit-exact."""
    import pandas as pd

    from prestodb_presto_spark.multimodal.codecs import decode_wav

    for pdf in batches:
        rows = []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            d = decode_wav(bytes(content))
            s = d["samples"].astype("int64")
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_samples": d["n_samples"],
                    "sample_rate": d["sample_rate"],
                    "duration_ms": d["duration_ms"],
                    "sum_abs": int(abs(s).sum()),
                    "sum_sq": int((s * s).sum()),
                    "min_sample": int(s.min()),
                    "max_sample": int(s.max()),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in WAV_FEATURE_SCHEMA.fields])


def wav_features(media_df: DataFrame) -> DataFrame:
    """Decode WAV media rows and emit integer audio features — narrow
    (input partitioning preserved), Arrow-batched, codec-real."""
    return media_df.select("doc_id", "content").mapInPandas(
        _wav_feature_batch, schema=WAV_FEATURE_SCHEMA
    )


def pack_ids_as_bmp(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: synthesize a REAL 24-bit BMP per document —
    w = 1 + id%7, h = 1 + id%5, RGB(x,y) = ((id·7+x·3+y·5)%256,
    (id·11+x·2+y·13)%256, (id·17+x·5+y·7)%256) — closed-form pixels a
    SQL oracle reproduces exactly."""
    def gen(batches):
        import numpy as np
        import pandas as pd

        from prestodb_presto_spark.multimodal.codecs import encode_bmp24

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 1 + i % 7, 1 + i % 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                px = np.stack(
                    [
                        (i * 7 + x * 3 + y * 5) % 256,
                        (i * 11 + x * 2 + y * 13) % 256,
                        (i * 17 + x * 5 + y * 7) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append({"doc_id": doc_id, "content": encode_bmp24(px)})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    packed = docs.select(F.col(id_col)).mapInPandas(
        gen,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )
    return attach_media_meta(packed, "image", "bmp")


def pack_near_dup_bmps(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter for the perceptual-hash dedup gate: REAL 24-bit
    BMPs in NEAR-DUP PAIRS — docs 2k and 2k+1 render the same base image
    (i = (id//2)*2), the odd member perturbed by +8 on R(0,0), so dHash
    places pair members within a small Hamming distance while the
    x·y·(1+i%13)-style cross terms disperse unrelated ids' gradients.
    Dims start at 4 so no image degenerates below the 9x8 dHash grid's
    resolution into an all-zero hash.  Pixels stay closed-form (integer
    arithmetic on id, x, y) so a SQL oracle re-derives the hash exactly:
      w = 4 + i%7, h = 4 + i%5
      R = (i·7  + x·37 + y·59 + x·y·(1+i%13) + 8·[odd ∧ x=0 ∧ y=0]) % 256
      G = (i·11 + x·23 + y·41 + x·y·(2+i%11)) % 256
      B = (i·17 + x·29 + y·31 + x·y·(3+i%7)) % 256
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        from prestodb_presto_spark.multimodal.codecs import encode_bmp24

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                i, odd = (d // 2) * 2, d % 2
                w, h = 4 + i % 7, 4 + i % 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                perturb = 8 * odd * ((x == 0) & (y == 0))
                px = np.stack(
                    [
                        (i * 7 + x * 37 + y * 59 + x * y * (1 + i % 13) + perturb) % 256,
                        (i * 11 + x * 23 + y * 41 + x * y * (2 + i % 11)) % 256,
                        (i * 17 + x * 29 + y * 31 + x * y * (3 + i % 7)) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append({"doc_id": doc_id, "content": encode_bmp24(px)})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    packed = docs.select(F.col(id_col)).mapInPandas(
        gen,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("content", BinaryType())]
        ),
    )
    return attach_media_meta(packed, "image", "bmp")


def _bmp_feature_batch(batches) -> Iterator:
    """mapInPandas worker: REAL BMP decode (fixed V3 header, bottom-up
    padded BGR rows) → per-channel integer sums."""
    import pandas as pd

    from prestodb_presto_spark.multimodal.codecs import decode_bmp

    for pdf in batches:
        rows = []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            px = decode_bmp(bytes(content)).astype("int64")
            h, w, _ = px.shape
            rows.append(
                {
                    "doc_id": doc_id,
                    "width": w,
                    "height": h,
                    "sum_r": int(px[:, :, 0].sum()),
                    "sum_g": int(px[:, :, 1].sum()),
                    "sum_b": int(px[:, :, 2].sum()),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in BMP_FEATURE_SCHEMA.fields])


def bmp_features(media_df: DataFrame) -> DataFrame:
    """Decode BMP media rows and emit image features — narrow,
    Arrow-batched, codec-real."""
    return media_df.select("doc_id", "content").mapInPandas(
        _bmp_feature_batch, schema=BMP_FEATURE_SCHEMA
    )


def _decode_batch(batches) -> Iterator:
    """mapInPandas worker: byte-level features per media row.

    Kind routing: 'text' computes byte stats directly; 'audio'/'wav'
    and 'image'/'bmp' have REAL decoders (multimodal/codecs.py,
    wav_features/bmp_features below).  Other kinds ('video', non-BMP
    images) raise NotImplementedError — their codec libs (PIL/libav)
    are absent from this container; the Arrow batch flow, schema, and
    partitioning are production-shaped regardless.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for doc_id, content, kind in zip(pdf["doc_id"], pdf["content"], pdf["kind"]):
            if kind != "text":
                raise NotImplementedError(
                    f"codec for kind={kind!r} not available in this container"
                )
            arr = np.frombuffer(content, dtype=np.uint8)
            counts = np.bincount(arr, minlength=256).astype(np.float64)
            p = counts[counts > 0] / len(arr)
            out.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(arr),
                    "mean_byte": float(arr.mean()),
                    "byte_entropy": float(-(p * np.log2(p)).sum()),
                }
            )
        yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])


def decode_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Input partitioning is preserved (mapInPandas is a narrow transform) —
    no shuffle; at scale, batches stream decoder-side memory-bounded.
    """
    slim = media_df.select("doc_id", "content", F.col("media.kind").alias("kind"))
    return slim.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


def _frame_batch(batches) -> Iterator:
    """Deterministic 'frame sampling': fixed-size byte windows stand in
    for decoded video frames (same stub caveat as _decode_batch)."""
    import pandas as pd

    FRAME_BYTES = 64
    N_FRAMES = 4
    for pdf in batches:
        rows = []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            n = len(content)
            if n == 0:
                continue
            step = max((n - FRAME_BYTES) // max(N_FRAMES - 1, 1), 1)
            for i in range(N_FRAMES):
                off = min(i * step, max(n - FRAME_BYTES, 0))
                rows.append(
                    {"doc_id": doc_id, "frame_idx": i, "frame": content[off : off + FRAME_BYTES]}
                )
        yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])


def frame_sample(media_df: DataFrame) -> DataFrame:
    """Sample N deterministic 'frames' per media row (1→N fan-out)."""
    return media_df.select("doc_id", "content").mapInPandas(_frame_batch, schema=FRAME_SCHEMA)
