"""Pure-numpy codecs for formats the stdlib can fully express.

The sandbox has no PIL/librosa/av, but three real formats need none:
uncompressed 24-bit BMP (BITMAPINFOHEADER + raw BGR rows), PCM 16-bit
WAV (RIFF header + raw samples), and 8-bit PNG — stdlib zlib IS a
complete DEFLATE codec, so PNG (zlib-compressed filtered scanlines +
CRC chunks) decodes for real, including all five scanline filters.
Implementing them makes the multimodal decode path REAL for those
formats — header parse, stride handling, channel order, row flip,
filter reconstruction — while formats needing codec libraries (jpeg,
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 image -> PNG bytes. (h, w) gray, (h, w, 3) RGB, or
    (h, w, 4) RGBA; 8-bit, non-interlaced, filter 0 scanlines, one
    zlib-deflated IDAT. stdlib zlib is a full DEFLATE implementation,
    so this is a REAL spec-conformant PNG, not a stub."""
    import zlib

    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_png expects uint8 (h,w)[,channels]")
    if img.ndim == 2:
        img = img[:, :, None]
    channels = img.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w * channels)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline PNG filters (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth). Sub/Average/Paeth recur on the left neighbor, so the
    inner loop is sequential per row — fine for the fixture sizes this
    runs at; a production decoder would JIT or C this."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prev) & 0xFF
        else:
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                elif f == 4:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                else:
                    raise NotImplementedError(f"PNG filter type {f}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, channels) array. Supports 8-bit
    grayscale / RGB / RGBA, non-interlaced, all five scanline filters,
    multi-IDAT streams; palette, 16-bit, and interlaced variants raise
    honestly."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        # a corrupt/hostile length must become a clean decode error, not
        # a silently truncated slice or a struct.error from IHDR unpack
        # downstream (ADVICE r4): bounds-check against the remaining
        # payload (12 = 4 length + 4 type + 4 CRC)
        if pos + 12 + size > len(payload):
            raise ValueError(
                f"PNG chunk at offset {pos} declares {size} bytes but only "
                f"{len(payload) - pos - 12} remain (truncated or corrupt length)"
            )
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} at offset {pos} fails CRC32")
        if ctype == b"IHDR":
            if size != 13:
                raise ValueError(f"PNG IHDR must be 13 bytes, got {size}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if depth != 8 or channels is None or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit gray/RGB(A) non-interlaced PNG supported "
            f"(depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    img = _png_unfilter(raw.reshape(h, stride + 1), h, stride, channels)
    return img.reshape(h, w, channels).copy()


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
