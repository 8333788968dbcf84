"""Multimodal plumbing: binary columns, metadata struct, mapInPandas flows."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prestodb_presto_spark.multimodal import (
    attach_media_meta,
    decode_features,
    frame_sample,
    pack_text_as_media,
)
from tests.conftest import SF_TINY


def _docs(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(50)


def test_pack_schema_and_sizes(spark):
    media = pack_text_as_media(_docs(spark))
    assert dict(media.dtypes)["content"] == "binary"
    row = media.first()
    assert row["media"]["kind"] == "text"
    assert row["media"]["size_bytes"] == len(row["content"])


def test_decode_features_matches_python(spark):
    media = pack_text_as_media(_docs(spark))
    feats = {r.doc_id: r for r in decode_features(media).collect()}
    for r in _docs(spark).collect():
        raw = r.text.encode()
        f = feats[r.doc_id]
        assert f.n_bytes == len(raw)
        assert math.isclose(f.mean_byte, sum(raw) / len(raw), rel_tol=1e-12)
        assert 0 < f.byte_entropy < 8


def test_frame_sample_shape(spark):
    media = pack_text_as_media(_docs(spark))
    frames = frame_sample(media)
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 4 for r in counts)
    row = frames.first()
    assert isinstance(row.frame, bytearray | bytes) and len(row.frame) <= 64


def test_non_text_kind_raises(spark):
    media = attach_media_meta(
        pack_text_as_media(_docs(spark)).select("doc_id", "content"), "image", "png"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_features(media).collect()
