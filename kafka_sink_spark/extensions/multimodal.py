"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step (actual image/audio libraries) is STUBBED — the container has
no codecs — but the Spark-side plumbing is real and tested: schema contracts,
binary column handling, batch iteration shape, and deterministic feature
extraction (byte length, sha256, a fake "decode" that derives stable
pseudo-dimensions from the hash). Swapping in a real decoder is a one-function
change with the same signature.

Scale design: mapInPandas streams Arrow record batches — constant memory per
task regardless of corpus size; binary payloads never pass through the driver.
Partitioning by source file/asset id keeps decode locality.
"""

from __future__ import annotations

import hashlib
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


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — image libs are not in this container.

    Replace with PIL/opencv in production. The pipeline never calls this
    directly; see ``_fake_decode_dims``.
    """
    raise NotImplementedError("image codecs not available in this environment")


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

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[payload_col].map(
                lambda b: hashlib.sha256(bytes(b) if b is not None else b"").digest()
            )
            dims = digests.map(_fake_decode_dims)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "media_type": pdf[type_col],
                    "byte_len": pdf[payload_col].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "sha256": digests.map(lambda d: d.hex()),
                    "width": dims.map(lambda t: t[0]),
                    "height": dims.map(lambda t: t[1]),
                    "n_frames": dims.map(lambda t: t[2]),
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
