"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode strategy (probed at runtime, executor-side):

1. **PIL**, when importable — full decode, any format PIL supports.
2. **Header parse** (always available, no dependencies) — real dimensions
   read from PNG IHDR / GIF screen descriptor / BMP info header / JPEG SOF
   markers, straight from the public format specs.
3. **Deterministic stand-in** — payloads that neither path can read (or
   non-image media types) get stable pseudo-dimensions derived from the
   content hash, so tests and oracles are reproducible everywhere.

Scale design: mapInPandas streams Arrow record batches — constant memory per
task regardless of corpus size; binary payloads never pass through the driver.
Partitioning by source file/asset id keeps decode locality.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Output contract of the feature-extraction stage.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


try:  # optional full decoder — not bundled in this container
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - depends on environment
    _PILImage = None


def _parse_image_header(payload: bytes) -> tuple[int, int]:
    """Read (width, height) from the format header — no libraries needed.

    Covers PNG (IHDR chunk), GIF87a/89a (logical screen descriptor), BMP
    (BITMAPINFOHEADER), and JPEG (first SOFn marker). Raises ValueError for
    anything else; callers fall back to the deterministic stand-in.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return w, abs(h)  # negative height = top-down DIB
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to the first SOFn
        pos = 2
        while pos + 9 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return w, h
            seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            pos += 2 + seg_len
    raise ValueError("unrecognized image format")


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode real image dimensions: PIL when available (full decode), else
    the dependency-free header parser. Raises ValueError when the payload is
    not a recognizable image."""
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                return img.width, img.height
        except Exception:
            pass  # fall through to the header parser
    return _parse_image_header(payload)


def _fake_decode_dims(digest: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (width, height, n_frames)
    from the content hash so tests are stable and the full pipeline shape
    (including downstream groupBys on dimensions) is exercised."""
    w = 64 + digest[0] % 192  # 64..255
    h = 64 + digest[1] % 192
    frames = 1 + digest[2] % 30
    return w, h, frames


def extract_media_features(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """binary payload → typed features via mapInPandas (Arrow batches).

    Python is unavoidable here (codec work); mapInPandas keeps it batch-at-a-
    time with zero-copy Arrow transfer — the pattern a real decoder would use.
    """
    in_cols = [id_col, type_col, payload_col]

    def dims_for(payload, media_type, digest) -> tuple[int, int, int]:
        if media_type is not None and media_type.startswith("image/"):
            try:
                w, h = decode_image(bytes(payload) if payload is not None else b"")
                return w, h, 1  # still image
            except ValueError:
                pass  # unreadable payload — deterministic stand-in below
        return _fake_decode_dims(digest)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[payload_col].map(
                lambda b: hashlib.sha256(bytes(b) if b is not None else b"").digest()
            )
            dims = [
                dims_for(p, t, d)
                for p, t, d in zip(pdf[payload_col], pdf[type_col], digests)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "media_type": pdf[type_col],
                    "byte_len": pdf[payload_col].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "sha256": digests.map(lambda d: d.hex()),
                    "width": [t[0] for t in dims],
                    "height": [t[1] for t in dims],
                    "n_frames": [t[2] for t in dims],
                }
            )

    return assets.select(*in_cols).mapInPandas(process, MEDIA_FEATURES_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter for the driver testdata: treat document text bytes as opaque
    media payloads so the binary plumbing runs against real files."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
    )


def frame_sample(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plumbing: explode pseudo-frames (from n_frames metadata)
    and keep every Nth — the plan shape of real video frame extraction
    (explode → filter → per-frame decode), with the decode stubbed."""
    feats = extract_media_features(assets)
    return (
        feats.select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )
