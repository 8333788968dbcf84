"""Real, dependency-free media codecs for the multimodal tier.

The container ships no PIL/libav, but two formats parse with zero
dependencies, so the decode step of the multimodal pipeline is REAL for
them rather than a fail-loud stub:

- **WAV** (RIFF PCM): stdlib ``wave`` handles the chunk layout; samples
  decode with numpy.  Reference analog: the binary/varbinary media
  columns a Presto Hive pipeline scans (SURVEY §2.2) — Presto itself has
  no codecs either; decoding is the UDF tier's job, which is exactly
  where these run (Arrow-batched mapInPandas, multimodal/columns.py).
- **BMP** (Windows V3, 24-bit uncompressed): a fixed 54-byte header
  (BITMAPFILEHEADER + BITMAPINFOHEADER, public layout), bottom-up pixel
  rows padded to 4 bytes, BGR channel order.

Both encoders exist so tests and fixtures can synthesize deterministic
media bytes; the decoders are the production path.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# WAV — 16-bit PCM via the stdlib wave module
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 samples -> RIFF/WAVE bytes (PCM, little-endian)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm16 wants int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> dict:
    """RIFF/WAVE bytes -> {samples: int16 ndarray, sample_rate,
    n_channels, n_samples, duration_ms}.  Raises wave.Error on malformed
    input (fail-loud, not fail-empty)."""
    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM supported")
        n = w.getnframes()
        rate = w.getframerate()
        ch = w.getnchannels()
        samples = np.frombuffer(w.readframes(n), dtype="<i2")
    return {
        "samples": samples,
        "sample_rate": rate,
        "n_channels": ch,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
    }


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed Windows V3 (public fixed header layout)
# ---------------------------------------------------------------------------

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, reserved x2, pixel offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # header size, w, h, planes, bpp, compression,
#                                 image size, x/y ppm, colors used/important
_BMP_HDR_BYTES = 54


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> 24-bit BMP bytes (bottom-up rows,
    BGR order, rows padded to 4 bytes — the canonical V3 layout)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp24 wants (h, w, 3) uint8 RGB")
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    out = bytearray()
    out += struct.pack(_BMP_FILE_HDR, b"BM", _BMP_HDR_BYTES + img_size, 0, 0, _BMP_HDR_BYTES)
    out += struct.pack(_BMP_INFO_HDR, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        out += pixels[y, :, ::-1].tobytes() + pad  # RGB -> BGR
    return bytes(out)


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit BMP bytes -> (h, w, 3) uint8 RGB array.  Supports the
    uncompressed V3 form this module writes; anything else raises
    (fail-loud contract, same policy as the geo slivers)."""
    magic, _fsize, _r1, _r2, offset = struct.unpack_from(_BMP_FILE_HDR, content, 0)
    if magic != b"BM":
        raise ValueError("not a BMP stream")
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp}, comp={comp})")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for i in range(h):
        start = offset + i * row_bytes
        row = np.frombuffer(content, dtype=np.uint8, count=w * 3, offset=start)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    arr = np.stack(rows)
    return arr[::-1] if flipped else arr
