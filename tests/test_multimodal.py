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


def test_binary_file_source(spark, tmp_path):
    """binaryFile landing reader -> media convention round trip."""
    from prestodb_presto_spark.multimodal.columns import attach_media_meta, decode_features
    from prestodb_presto_spark.sources.io import read_binary_files

    for i in range(3):
        (tmp_path / f"doc{i}.txt").write_text(f"document number {i} body text")
    (tmp_path / "skip.bin").write_bytes(b"\x00\x01")

    import pyspark.sql.functions as F

    raw = read_binary_files(spark, str(tmp_path), path_glob="*.txt")
    assert raw.count() == 3
    media = attach_media_meta(
        raw.select(F.monotonically_increasing_id().alias("doc_id"), "content"),
        kind="text", fmt="utf-8",
    )
    feats = decode_features(media)
    rows = feats.collect()
    assert len(rows) == 3 and all(r.n_bytes > 0 for r in rows)
