"""Pure-numpy codecs for container-less media formats.

The sandbox has no PIL/librosa/av, but two real formats need none:
uncompressed 24-bit BMP (BITMAPINFOHEADER + raw BGR rows) and PCM
16-bit WAV (RIFF header + raw samples). Implementing them makes the
multimodal decode path REAL for those formats — header parse, stride
handling, channel order, row flip — while compressed formats (jpeg,
mp3, mp4) stay honestly NotImplementedError (operators/multimodal.py).

Everything is deterministic byte math, so encode->decode roundtrips
are exact and feature outputs are engine-stable.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = 14
_DIB_V3 = 40


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = _BMP_HEADER + _DIB_V3
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", _DIB_V3, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 PCM samples -> mono 16-bit WAV bytes."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects 1-D int16")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Mono 16-bit PCM WAV bytes -> (samples int16, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", payload, pos + 8)
            if audio_fmt != 1:
                raise NotImplementedError(f"only PCM WAV supported (fmt={audio_fmt})")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise NotImplementedError(f"only mono 16-bit supported (bits={bits}, ch={channels})")
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=pos + 8)
            return samples.copy(), sample_rate
        pos += 8 + size + (size & 1)
    raise ValueError("WAV data chunk not found")


def image_features(rgb: np.ndarray, grid: int = 2) -> np.ndarray:
    """Deterministic image features: per-channel mean/std + grid-cell
    means, all float32 in [0, 1]-ish range (16 dims at grid=2)."""
    x = rgb.astype(np.float32) / 255.0
    feats = [x.mean(axis=(0, 1)), x.std(axis=(0, 1))]
    h, w, _ = x.shape
    for gy in range(grid):
        for gx in range(grid):
            cell = x[gy * h // grid : (gy + 1) * h // grid, gx * w // grid : (gx + 1) * w // grid]
            feats.append(np.array([cell.mean()], dtype=np.float32))
    return np.concatenate([np.asarray(f, dtype=np.float32).ravel() for f in feats])


def audio_features(samples: np.ndarray, sample_rate: int, n_bands: int = 8) -> np.ndarray:
    """Deterministic audio features: RMS, zero-crossing rate, and
    n_bands log-magnitude spectrum bands (numpy rfft)."""
    x = samples.astype(np.float32) / 32768.0
    rms = np.sqrt(np.mean(x * x)) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, n_bands)
    band_e = np.array([np.log1p(b.mean()) if len(b) else 0.0 for b in bands], dtype=np.float32)
    return np.concatenate([np.array([rms, zcr], dtype=np.float32), band_e])
