"""Multimodal column handling: image/audio/video as opaque binary.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake behind ``fake=True``, ``NotImplementedError``
otherwise) — but everything Spark-side is real and tested: the typed
schema, Arrow batch shape, ``mapInPandas`` plumbing, partition sizing.

Pattern (the scale-path for 100 TB of media):
- media rows: (id, modality, payload binary, meta struct)
- decode/feature-extract as ``mapInPandas`` — batch iterator in,
  batch iterator out, so one Python process handles a whole Arrow
  batch and memory stays bounded by batch size, not partition size.
- frame-sample for video = explode of per-frame offsets, then decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    mods = ["image", "audio", "video"]
    for i in range(n):
        m = mods[i % 3]
        payload = bytes(rng.randint(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8))
        rows.append(
            (
                i,
                m,
                payload,
                224 if m == "image" else None,
                224 if m == "image" else None,
                16000 if m == "audio" else None,
                30 if m == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: digest -> unit vector."""
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32).astype(np.float32)
    v = v / np.float32(2**32)
    return v / np.linalg.norm(v)


def _real_decode_features(modality: str, payload: bytes) -> np.ndarray:
    """REAL decode for the stdlib-expressible formats
    (operators/codecs.py: uncompressed 24-bit BMP, 8-bit PNG via
    stdlib zlib, mono PCM-16 WAV — pure numpy, no external libs).
    Image format dispatches on magic bytes. Formats needing codec
    libraries (jpeg/mp3/mp4) raise — honestly unsupported in this
    environment."""
    from .codecs import audio_features, decode_bmp, decode_png, decode_wav, image_features

    if modality == "image":
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(payload)
            if img.shape[2] in (1, 2):  # gray / gray+alpha -> replicate luma to RGB
                img = np.repeat(img[:, :, :1], 3, axis=2)
            elif img.shape[2] == 4:  # drop alpha
                img = img[:, :, :3]
            return image_features(img)
        return image_features(decode_bmp(payload))
    if modality == "audio":
        return audio_features(*decode_wav(payload))
    raise NotImplementedError(
        f"real decode for modality={modality!r} needs a container codec (av/ffmpeg), "
        "not present in this environment"
    )


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batch iterator in/out,
    memory bounded by batch size).

    ``fake=True``: deterministic digest-vector stand-in (any payload).
    ``fake=False``: REAL decode — uncompressed BMP / PCM WAV via the
    pure-numpy codecs; other formats raise NotImplementedError (no
    jpeg/mp3/mp4 codec exists in this container)."""
    decode = (lambda m, b: _fake_decode_features(b, dim)) if fake else _real_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_sha256": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": [
                        decode(m, bytes(b)).tolist()
                        for m, b in zip(pdf["modality"], pdf["payload"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode frame indices 0..n_frames step
    every_n; the per-frame decode hangs off the same mapInPandas stub."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize = decode->scale->encode on a real cluster; here only the
    metadata transform is applied (payload passthrough, marked)."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height)).withColumn(
        "resized", F.lit(True)
    )
