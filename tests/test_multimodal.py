"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fec_cn_support_etl_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, n=30, seed=7).cache()


def test_feature_extraction_schema_and_determinism(spark, media):
    feats = M.extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 16 for r in rows)
    # sha matches driver-side hashlib over the same payload
    payloads = {r["media_id"]: r["payload"] for r in media.collect()}
    for r in rows[:5]:
        assert r["payload_sha256"] == hashlib.sha256(payloads[r["media_id"]]).hexdigest()
        assert r["payload_bytes"] == len(payloads[r["media_id"]])
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in M.extract_features(media, dim=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_real_decode_rejects_unsupported_payloads(media):
    """fake=False now really decodes BMP/WAV (see
    test_real_decode_features_through_spark); the synth fixture's
    random bytes are NOT a supported format, so the decode raises at
    execution instead of silently faking."""
    with pytest.raises(Exception, match="BMP|WAV|NotImplementedError|container codec|not a"):
        M.extract_features(media, fake=False).collect()


def test_video_frame_sampling(spark, media):
    frames = M.sample_video_frames(media, every_n=10)
    per_vid = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per_vid)  # 30 frames step 10 -> 0,10,20


def test_resize_stub_metadata(media):
    out = M.resize_stub(media, 64, 64)
    r = out.filter(F.col("modality") == "image").first()
    assert (r["width"], r["height"], r["resized"]) == (64, 64, True)


def test_bmp_wav_codecs_roundtrip():
    """Pure-numpy codecs: encode->decode is byte-exact for uncompressed
    BMP (incl. non-multiple-of-4 widths: stride padding) and PCM WAV."""
    import numpy as np

    from fec_cn_support_etl_spark.operators.codecs import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    for h, w in [(5, 5), (3, 7), (16, 9)]:  # odd widths exercise row padding
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
    samples = (rng.randn(1600) * 8000).astype(np.int16)
    back, sr = decode_wav(encode_wav(samples, 16000))
    assert sr == 16000 and (back == samples).all()


def test_real_decode_features_through_spark(spark):
    """fake=False is a REAL decode path now for BMP/WAV payloads: the
    mapInPandas job decodes and featurizes; video (needs a container
    codec) still raises — honestly unsupported."""
    import numpy as np
    import pytest

    from fec_cn_support_etl_spark.operators.codecs import encode_bmp, encode_wav
    from fec_cn_support_etl_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    wav = (rng.randn(800) * 5000).astype(np.int16)
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(encode_bmp(img)), 6, 8, None, None),
            (1, "audio", bytearray(encode_wav(wav, 16000)), None, None, 16000, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert len(rows[0].feature) == 10  # 3 mean + 3 std + 4 grid cells
    assert len(rows[1].feature) == 10  # rms + zcr + 8 bands
    # deterministic: same payload -> same features
    rows2 = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert rows[0].feature == rows2[0].feature and rows[1].feature == rows2[1].feature
    # image means match the raw pixels
    assert abs(rows[0].feature[0] - img[:, :, 0].mean() / 255.0) < 1e-6
    vid = spark.createDataFrame([(2, "video", bytearray(b"\x00" * 64), None, None, None, 30)], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|container codec"):
        extract_features(vid, fake=False).collect()
