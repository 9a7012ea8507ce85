"""Multimodal decode: the probed real-codec branch (header parser always,
PIL when importable) and the deterministic stand-in fallback."""

import hashlib
import os
import struct
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.extensions.multimodal import (
    _fake_decode_dims,
    _PILImage,
    decode_image,
    extract_media_features,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _bmp(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 10


def _jpeg(w: int, h: int) -> bytes:
    # SOI + APP0 (JFIF) + SOF0 with the dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_header_parser_reads_real_dimensions():
    assert decode_image(_png(640, 480)) == (640, 480)
    assert decode_image(_gif(320, 200)) == (320, 200)
    assert decode_image(_bmp(800, 600)) == (800, 600)
    assert decode_image(_bmp(800, -600)) == (800, 600)  # top-down DIB
    assert decode_image(_jpeg(1920, 1080)) == (1920, 1080)


def test_header_parser_rejects_garbage():
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")
    with pytest.raises(ValueError):
        decode_image(b"")


@pytest.mark.skipif(_PILImage is None, reason="PIL not installed")
def test_pil_branch_decodes_when_available():
    import io

    img = _PILImage.new("RGB", (12, 7))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    assert decode_image(buf.getvalue()) == (12, 7)


def test_extract_features_real_vs_fallback(spark):
    """image/* payloads with parseable headers get REAL dimensions and
    n_frames=1; garbage image payloads and non-image media types get the
    deterministic hash-derived stand-in."""
    rows = [
        (1, "image/png", _png(64, 32)),
        (2, "image/gif", _gif(10, 20)),
        (3, "image/jpeg", b"corrupted bytes"),
        (4, "text/plain", b"hello world"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {
        r["asset_id"]: (r["width"], r["height"], r["n_frames"], r["byte_len"])
        for r in extract_media_features(df).collect()
    }
    assert got[1][:3] == (64, 32, 1)
    assert got[2][:3] == (10, 20, 1)
    for aid, payload in ((3, b"corrupted bytes"), (4, b"hello world")):
        digest = hashlib.sha256(payload).digest()
        assert got[aid][:3] == _fake_decode_dims(digest)
    assert got[4][3] == len(b"hello world")
