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


def test_wav_codec_roundtrip():
    """decode(encode(x)) == x for the stdlib-wave PCM16 codec, across
    shapes including empty and single-sample streams."""
    import numpy as np

    from prestodb_presto_spark.multimodal.codecs import decode_wav, encode_wav_pcm16

    rng = np.random.RandomState(7)
    for n in (0, 1, 17, 4096):
        s = rng.randint(-32768, 32768, size=n).astype(np.int16)
        d = decode_wav(encode_wav_pcm16(s, 8000))
        assert d["sample_rate"] == 8000 and d["n_samples"] == n
        assert d["duration_ms"] == n * 1000 // 8000
        assert np.array_equal(d["samples"], s)


def test_wav_decoder_rejects_garbage():
    import wave

    import pytest as _pytest

    from prestodb_presto_spark.multimodal.codecs import decode_wav

    with _pytest.raises((wave.Error, EOFError)):
        decode_wav(b"not a riff stream at all")


def test_bmp_codec_roundtrip_all_paddings():
    """decode(encode(x)) == x for widths hitting every 4-byte row-padding
    residue (w*3 % 4 in {0,1,2,3}) and h=1..4."""
    import numpy as np

    from prestodb_presto_spark.multimodal.codecs import decode_bmp, encode_bmp24

    rng = np.random.RandomState(11)
    for w in (1, 2, 3, 4, 5, 8):
        for h in (1, 2, 4):
            px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            back = decode_bmp(encode_bmp24(px))
            assert back.shape == (h, w, 3)
            assert np.array_equal(back, px), (w, h)


def test_bmp_decoder_fail_loud():
    import numpy as np
    import pytest as _pytest

    from prestodb_presto_spark.multimodal.codecs import decode_bmp, encode_bmp24

    with _pytest.raises(ValueError):
        decode_bmp(b"PNG\x00" + b"\x00" * 60)
    # compressed / non-24bpp headers refuse rather than mis-decode
    good = bytearray(encode_bmp24(np.zeros((1, 1, 3), dtype=np.uint8)))
    good[28] = 8  # bpp -> 8
    with _pytest.raises(NotImplementedError):
        decode_bmp(bytes(good))


def test_wav_bmp_feature_pipelines(spark):
    """End-to-end mapInPandas: synthesize real media bytes, decode with
    the real codecs, check a hand-computed document."""
    import numpy as np

    from prestodb_presto_spark.multimodal.columns import (
        bmp_features,
        pack_ids_as_bmp,
        pack_text_as_wav,
        wav_features,
    )

    docs = _docs(spark).filter(F.col("doc_id") < 10)
    wf = {r.doc_id: r for r in wav_features(pack_text_as_wav(docs)).collect()}
    one = docs.filter("doc_id = 3").collect()[0]
    b = np.frombuffer(one.text.encode(), dtype=np.uint8).astype(np.int64)
    v = (b - 100) * 256
    r = wf[3]
    assert r.n_samples == len(v) and r.sum_abs == int(abs(v).sum())
    assert r.sum_sq == int((v * v).sum())
    assert (r.min_sample, r.max_sample) == (int(v.min()), int(v.max()))

    bf = {r.doc_id: r for r in bmp_features(pack_ids_as_bmp(docs)).collect()}
    i = 3
    w, h = 1 + i % 7, 1 + i % 5
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert bf[3].width == w and bf[3].height == h
    assert bf[3].sum_r == int(((i * 7 + x * 3 + y * 5) % 256).sum())
    assert bf[3].sum_g == int(((i * 11 + x * 2 + y * 13) % 256).sum())
    assert bf[3].sum_b == int(((i * 17 + x * 5 + y * 7) % 256).sum())


def test_wav_pack_non_ascii_coherent(spark):
    """Round 11 (ADVICE r10): non-ASCII text must produce the same
    features the oracle model computes — per CODE POINT, clipped to the
    int16 range (the old UTF-8-byte int16 form wrapped negative for
    bytes ≥ 228 and double-counted multibyte characters)."""
    import numpy as np

    from prestodb_presto_spark.multimodal.columns import (
        pack_text_as_wav,
        wav_features,
    )

    texts = [
        (0, "héllo wörld"),          # 2-byte UTF-8 chars
        (1, "日本語テキスト"),          # 3-byte chars, codepoints >> 228
        (2, "mixed ascii + é + 字"),
        (3, "äèñ"),   # all bytes >= 228 in latin portion
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r for r in wav_features(pack_text_as_wav(docs)).collect()}
    for doc_id, text in texts:
        cps = np.array([ord(c) for c in text], dtype=np.int64)
        v = np.clip((cps - 100) * 256, -32768, 32767)
        r = got[doc_id]
        assert r.n_samples == len(cps), (doc_id, r.n_samples, len(cps))
        assert r.sum_abs == int(abs(v).sum())
        assert r.sum_sq == int((v * v).sum())
        assert (r.min_sample, r.max_sample) == (int(v.min()), int(v.max()))


def test_dhash_properties():
    """dHash invariants: identical images → distance 0; a one-pixel
    perturbation moves few bits; an unrelated image moves many."""
    import numpy as np

    from prestodb_presto_spark.multimodal.phash import dhash_halves

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(16, 20, 3)).astype(np.uint8)
    near = base.copy()
    near[0, 0, 0] = (int(near[0, 0, 0]) + 8) % 256
    far = rng.integers(0, 256, size=(16, 20, 3)).astype(np.uint8)

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    hb, hn, hf = dhash_halves(base), dhash_halves(near), dhash_halves(far)
    assert ham(hb, hb) == 0
    assert ham(hb, hn) <= 3          # local perturbation: few gradient flips
    assert ham(hb, hf) > 10          # unrelated image: hash far away
    for hi, lo in (hb, hn, hf):      # halves stay in unsigned-32 territory
        assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32


def test_phash_near_pairs_banded_equals_bruteforce(spark):
    """The 16-bit-band LSH path (capped, single-shuffle pair expansion)
    must return exactly the brute-force pair set for d <= 3 — the
    pigeonhole guarantee the gate's DuckDB oracle relies on."""
    from prestodb_presto_spark.multimodal.columns import pack_near_dup_bmps
    from prestodb_presto_spark.multimodal.phash import phash_images, phash_near_pairs

    docs = spark.range(0, 80).withColumnRenamed("id", "doc_id")
    hashes = phash_images(pack_near_dup_bmps(docs)).cache()
    banded = sorted(
        (r.id_a, r.id_b, r.hamming) for r in phash_near_pairs(hashes, d=3).collect()
    )
    brute = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_pairs(hashes, d=3, bucket_cap=None).collect()
    )
    assert banded == brute
    # every designed pair group (2k, 2k+1) within threshold is present
    same_group = [(a, b) for a, b, _ in banded if a // 2 == b // 2]
    assert len(same_group) >= 35  # most of the 40 groups stay within d=3
    hashes.unpersist()


def test_phash_plan_no_cartesian(spark):
    """The banded path must never plan a cartesian/nested-loop join —
    candidates come from the (band_idx, bv) bucket grouping."""
    from prestodb_presto_spark.multimodal.columns import pack_near_dup_bmps
    from prestodb_presto_spark.multimodal.phash import phash_images, phash_near_pairs

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    pairs = phash_near_pairs(phash_images(pack_near_dup_bmps(docs)), d=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
