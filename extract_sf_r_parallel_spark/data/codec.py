"""From-scratch image codec + perceptual hash (no Pillow/OpenCV in the
sandbox — FIXTURES.md §1). Pure NumPy + stdlib zlib.

Two codecs:
- ``png``: minimal-but-real PNG (8-bit RGB truecolor, zlib DEFLATE,
  per-row filter; encoder emits filter 0, decoder handles filters 0-4)
  → lossless, so the pipeline invariant "decoded pixels PSNR ≥ 40 dB"
  holds with PSNR = ∞;
- ``raw``: width·height·3 bytes, row-major RGB.

``phash64`` is a standard 64-bit DCT perceptual hash (resize → 32×32
grayscale → DCT-II → top-left 8×8 AC coefficients vs median).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["png_encode", "png_decode", "raw_encode", "raw_decode",
           "encode_image", "decode_image", "phash64", "psnr", "resize_block",
           "cpnv_encode", "cpnv_decode", "cpnv_frame_count",
           "cpnv_iter_frames"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real PNG byte string."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    )  # filter byte 0 per row
    idat = zlib.compress(rows.tobytes(), 6)
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor PNG (filters 0-4, single IDAT stream)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        f = raw[i * (stride + 1)]
        row = np.frombuffer(raw[i * (stride + 1) + 1:(i + 1) * (stride + 1)], np.uint8).copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f in (1, 3, 4):  # Sub / Average / Paeth need sequential bytes
            row = row.astype(np.int32)
            pr = prev.astype(np.int32)
            for j in range(stride):
                a = row[j - 3] if j >= 3 else 0
                b = pr[j]
                cc = pr[j - 3] if j >= 3 else 0
                if f == 1:
                    row[j] = (row[j] + a) & 0xFF
                elif f == 3:
                    row[j] = (row[j] + (a + b) // 2) & 0xFF
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    row[j] = (row[j] + pred) & 0xFF
            row = row.astype(np.uint8)
        else:
            raise ValueError(f"unsupported filter {f}")
        out[i] = row
        prev = out[i]
    return out.reshape(h, w, 3)


def raw_encode(img: np.ndarray) -> bytes:
    return np.asarray(img, dtype=np.uint8).tobytes()


def raw_decode(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "raw":
        return raw_encode(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt == "raw":
        return raw_decode(bytes(data), w, h)
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------------------------------------------------------------------------
# CPNV: a trivial from-scratch video container (VERDICT r03 next-#4).
# No video codec ships in this sandbox, so "video" = concatenated PNG
# frames behind a length-prefixed header:
#   b"CPNV" | uint32 n_frames | n × (uint32 frame_len | PNG bytes)
# (big-endian, matching the PNG chunk convention above). Intra-only —
# every frame is independently decodable, so frame SAMPLING never has
# to decode the frames it skips, exactly the property a distributed
# frame sampler wants.
# ---------------------------------------------------------------------------

_CPNV_SIG = b"CPNV"


def cpnv_encode(frames: list[np.ndarray]) -> bytes:
    """Encode a list of (h, w, 3) uint8 frames as one CPNV byte string."""
    parts = [_CPNV_SIG, struct.pack(">I", len(frames))]
    for f in frames:
        png = png_encode(f)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def _cpnv_offsets(data: bytes) -> list[tuple[int, int]]:
    assert data[:4] == _CPNV_SIG, "not a CPNV container"
    (n,) = struct.unpack(">I", data[4:8])
    pos, out = 8, []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        out.append((pos + 4, ln))
        pos += 4 + ln
    return out


def cpnv_frame_count(data: bytes) -> int:
    assert data[:4] == _CPNV_SIG, "not a CPNV container"
    return struct.unpack(">I", data[4:8])[0]


def cpnv_iter_frames(data: bytes, every_n: int = 1):
    """Yield (frame_idx, png_bytes) for frames with idx % every_n == 0
    — skipped frames are never decompressed (header walk only)."""
    for idx, (off, ln) in enumerate(_cpnv_offsets(data)):
        if idx % every_n == 0:
            yield idx, data[off:off + ln]


def cpnv_decode(data: bytes) -> list[np.ndarray]:
    return [png_decode(png) for _, png in cpnv_iter_frames(data)]


# ---------------------------------------------------------------------------
# perceptual hash
# ---------------------------------------------------------------------------

def resize_block(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-style resize via index mapping (nearest-mean
    over source blocks; exact for integer downscale factors)."""
    h, w = gray.shape
    yi = (np.arange(out_h) * h) // out_h
    y2 = np.maximum(((np.arange(out_h) + 1) * h) // out_h, yi + 1)
    xi = (np.arange(out_w) * w) // out_w
    x2 = np.maximum(((np.arange(out_w) + 1) * w) // out_w, xi + 1)
    cs = np.zeros((h + 1, w + 1), dtype=np.float64)
    cs[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    top, bot = yi[:, None], y2[:, None]
    left, right = xi[None, :], x2[None, :]
    total = cs[bot, right] - cs[top, right] - cs[bot, left] + cs[top, left]
    area = (bot - top) * (right - left)
    return total / area


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 image."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = resize_block(gray, 32, 32)
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].ravel()[1:]  # drop DC
    med = np.median(block)
    bits = np.concatenate([[d[0, 0] > 0], block > med]).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | np.uint64(b)
    # store as signed int64 (Spark/parquet LongType)
    return int(np.int64(val.astype(np.int64)))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))
