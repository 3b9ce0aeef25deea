"""Multimodal (image/audio/video) column operators.

Media travel as opaque ``binary`` columns plus a typed metadata
struct; compute-heavy decode/feature steps run as Arrow-batched
``mapInPandas`` stages so each Python worker sees columnar batches,
not rows. The Spark-side plumbing here — schemas, batch iteration,
partition-preserving transforms — is real and tested; the actual
codec calls are STUBBED (this environment ships no image/audio
libraries): ``decode_stub="fake"`` produces a deterministic fake
decode derived from the payload bytes, ``decode_stub="raise"``
raises NotImplementedError where a real libjpeg/ffmpeg call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.plans.partitioning import ensure_parallelism
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-asset schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("format", StringType()),  # jpeg | png | wav | mp4 ...
        StructField("source_uri", StringType()),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from any corpus table (test
    fixture: payload bytes = UTF-8 of the text)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("fake").alias("format"),
        F.concat(F.lit("synthetic://"), F.col(id_col)).alias("source_uri"),
    )


def _fake_decode(payload: bytes, n_features: int) -> tuple[int, int, int, list[float]]:
    """Deterministic fake 'decode': dimensions and features derived
    from payload bytes. Stands in for libjpeg/PIL — REPLACE with a
    real decoder where available."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feats = [float((payload[i % max(n, 1)] if n else 0) + i) / 255.0 for i in range(n_features)]
    return width, height, 3, feats


def decode_images(
    media: DataFrame,
    n_features: int = 8,
    decode_stub: Literal["fake", "raise"] = "fake",
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode + feature-extract image assets via mapInPandas.

    Partition-preserving (no shuffle): each input partition maps to
    Arrow batches processed by one Python worker. At 100 TB the
    parallelism is the upstream file-split count — size
    spark.sql.files.maxPartitionBytes so a batch of payloads fits in
    worker memory.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image decode requires an image library (PIL/cv2); "
                    "install one and replace _fake_decode"
                )
            rows = [_fake_decode(p if p is not None else b"", n_features) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_channels": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    return ensure_parallelism(media.filter(F.col("media_type") == "image")).mapInPandas(
        decode_batches, DECODED_IMAGE_SCHEMA
    )


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("source_uri", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    decode_stub: Literal["fake", "raise"] = "fake",
) -> DataFrame:
    """Resize image payloads to a target geometry via mapInPandas —
    the standard normalize-before-training step. Output keeps the
    MEDIA_SCHEMA columns (payload replaced) plus the new dimensions,
    so resized tables re-enter any media pipeline unchanged.

    Partition-preserving like decode_images. The stub 'resize'
    deterministically derives a payload of size width*height//64 from
    the input bytes (so downstream size-based checks see the new
    geometry); a real implementation swaps _fake_resize for
    PIL/cv2.resize on the decoded array and re-encode.
    """

    def _fake_resize(payload: bytes) -> bytes:
        n = max(len(payload), 1)
        out_len = max(width * height // 64, 1)
        return bytes((payload[i % n] if payload else 0) for i in range(out_len))

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image resize requires an image library (PIL/cv2); "
                    "install one and replace _fake_resize"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": [_fake_resize(p if p is not None else b"") for p in pdf["payload"]],
                    "format": pdf["format"],
                    "source_uri": pdf["source_uri"],
                    "width": width,
                    "height": height,
                }
            )

    return ensure_parallelism(media.filter(F.col("media_type") == "image")).mapInPandas(
        resize_batches, RESIZED_IMAGE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("duration_s", FloatType()),
        StructField("sample_rate", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_audio_features(
    media: DataFrame,
    n_features: int = 8,
    decode_stub: Literal["fake", "raise"] = "fake",
) -> DataFrame:
    """Audio feature extraction (MFCC-shaped) via mapInPandas: same
    Arrow-batched, partition-preserving contract as decode_images;
    the codec/DSP call is the stubbed seam (librosa/torchaudio in a
    real deployment)."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real audio decode requires an audio library "
                    "(librosa/torchaudio); install one and replace the stub"
                )
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "duration_s": [float(len(p)) / 16000.0 for p in payloads],
                    "sample_rate": 16000,
                    "feature": [
                        [float(p[i % max(len(p), 1)] if p else 0) / 255.0 for i in range(n_features)]
                        for p in payloads
                    ],
                }
            )

    return ensure_parallelism(media.filter(F.col("media_type") == "audio")).mapInPandas(
        feature_batches, AUDIO_FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: which (asset, offset) pairs to
    decode. The expansion is pure SQL (explode over a sequence); the
    actual frame grab would be a decode_images-style mapInPandas."""
    dur = (F.length("payload") % 120 + 1).alias("fake_duration_s")  # stub duration probe
    plan = media.filter(F.col("media_type") == "video").select("asset_id", dur)
    return plan.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("fake_duration_s"), F.lit(every_n_seconds))
        ).alias("offset_s"),
    )
