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


def test_png_codec_roundtrip_and_filters():
    """encode_png -> decode_png is exact for gray/RGB/RGBA; the decoder
    reconstructs ALL five scanline filter types (our encoder emits
    filter 0 only, so filters 1-4 are exercised via a hand-built
    forward-filtered PNG), and unsupported variants raise honestly."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from fec_cn_support_etl_spark.operators.codecs import (
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for shape in [(5, 7), (6, 4, 3), (3, 5, 4)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        want = img[:, :, None] if img.ndim == 2 else img
        assert (back == want).all(), shape

    # forward-filter a known RGB image with filters 1..4 (+0) per row
    img = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        filt = np.zeros(w * ch, np.int32)
        for x in range(w * ch):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == img).all()

    # honest boundaries: 16-bit depth rejected
    bad_ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", bad_ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (h * (w * 6 + 1))))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(bad)


def test_png_real_decode_through_spark(spark):
    """PNG payloads flow through the SAME fake=False mapInPandas path
    as BMP (magic-byte dispatch), with identical features for identical
    pixels — the codec changes the container, not the features."""
    import numpy as np

    from fec_cn_support_etl_spark.operators.codecs import encode_bmp, encode_png
    from fec_cn_support_etl_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(encode_png(img)), 6, 8, None, None),
            (1, "image", bytearray(encode_bmp(img)), 6, 8, None, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert rows[0].feature == rows[1].feature  # same pixels, same features
    assert rows[0].payload_sha256 != rows[1].payload_sha256  # different containers


def test_png_gray_alpha_features_match_gray(spark):
    """color_type 4 (gray+alpha) must featurize like its luma — a
    2-channel array leaking into image_features would silently emit
    8-dim vectors next to everyone else's 16... i.e., 10-dim ones."""
    import numpy as np

    from fec_cn_support_etl_spark.operators.multimodal import _real_decode_features
    from fec_cn_support_etl_spark.operators.codecs import _png_chunk
    import struct, zlib

    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, (6, 5), dtype=np.uint8)
    alpha = np.full((6, 5), 255, dtype=np.uint8)
    ga = np.stack([gray, alpha], axis=2)
    h, w, ch = ga.shape
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    from fec_cn_support_etl_spark.operators.codecs import encode_png

    got = _real_decode_features("image", payload)
    want = _real_decode_features("image", encode_png(gray))
    assert len(got) == len(want) == 10
    assert (got == want).all()


def test_png_corrupt_length_and_crc_rejected():
    """ADVICE r4: hostile chunk lengths must raise a clean ValueError
    (not silently truncate or surface a struct.error), and CRC damage
    must be detected."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from fec_cn_support_etl_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(5)
    good = encode_png(rng.integers(0, 256, (4, 5, 3), dtype=np.uint8))

    # 1) oversized declared length on the first chunk (IHDR)
    bad_len = bytearray(good)
    struct.pack_into(">I", bad_len, 8, 10_000_000)
    with pytest.raises(ValueError, match="truncated or corrupt length"):
        decode_png(bytes(bad_len))

    # 2) flipped data byte -> CRC mismatch
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # inside IHDR data
    with pytest.raises(ValueError, match="CRC32"):
        decode_png(bytes(bad_crc))

    # 3) payload truncated mid-IDAT: declared size runs past the buffer
    idat_pos = 8 + 12 + 13  # magic + IHDR chunk (12 overhead + 13 data)
    assert good[idat_pos + 4 : idat_pos + 8] == b"IDAT"
    with pytest.raises(ValueError, match="truncated or corrupt length"):
        decode_png(bytes(good[: idat_pos + 11]))

    # 4) wrong-size IHDR is rejected before unpack
    ihdr = struct.pack(">IIBBBB", 4, 5, 8, 2, 0, 0)  # 12 bytes, not 13
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="13 bytes"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
