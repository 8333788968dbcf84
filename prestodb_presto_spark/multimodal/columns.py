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


def _decode_batch(batches) -> Iterator:
    """mapInPandas worker: byte-level features per media row.

    STUB NOTE: for kind='image'/'audio'/'video' a real deployment calls
    the codec (PIL/libav) here; those libs are absent in this container,
    so non-text kinds raise NotImplementedError — the Arrow batch flow,
    schema, and partitioning are the real thing.
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
