"""Multimodal column conventions + decode/feature plumbing (north star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / resize / frame-sample run as Arrow-batched pandas
functions over mapInPandas.  The media codec libraries are not in this
container, so the codec step is a deterministic fake (or raises
NotImplementedError for real formats) — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested.
"""

from prestodb_presto_spark.multimodal.columns import (
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_features,
    frame_sample,
    pack_text_as_media,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "pack_text_as_media",
    "attach_media_meta",
    "decode_features",
    "frame_sample",
]
