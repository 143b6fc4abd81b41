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
           "cjpg_encode", "cjpg_decode",
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
    if fmt == "cjpg":
        return cjpg_encode(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt == "raw":
        return raw_decode(bytes(data), w, h)
    if fmt == "cjpg":
        return cjpg_decode(bytes(data))
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------------------------------------------------------------------------
# CJPG: a from-scratch LOSSY codec (BASELINE.json input_hint names the
# lossy invariant "decoded pixels PSNR ≥ 40 dB"; png/raw are lossless,
# so until r04 that bound was only met trivially). 8×8 orthonormal
# block DCT per channel, uniform quantization with step `step`,
# zlib-compressed int16 coefficients. Because the DCT basis is
# orthonormal, pixel-domain MSE == coefficient-domain quantization MSE
# ≤ step²/12, so PSNR ≥ 10·log10(255²·12/step²) — ≥ 43.9 dB at the
# default step=6 for ANY input, clipping aside. Not entropy-optimal
# (no zigzag/Huffman) — the lossy *path* and its provable quality
# bound are the point, not rate.
# ---------------------------------------------------------------------------

_CJPG_SIG = b"CJPG"


def _pad_to8(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    return np.pad(ch, ((0, ph), (0, pw)), mode="edge")


def _blocks(ch: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8, W//8, 8, 8) block view (H, W multiples of 8)."""
    H, W = ch.shape
    return ch.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _unblocks(b: np.ndarray) -> np.ndarray:
    nby, nbx = b.shape[:2]
    return b.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def cjpg_encode(img: np.ndarray, step: int = 6) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3 and 1 <= step <= 255
    m = _dct_matrix(8)
    chans = []
    for ci in range(3):
        ch = _pad_to8(img[..., ci].astype(np.float64) - 128.0)
        d = np.einsum("ij,nmjk,lk->nmil", m, _blocks(ch), m)
        chans.append(np.rint(d / step).astype(np.int16))
    payload = zlib.compress(np.stack(chans).tobytes(), 6)
    return (_CJPG_SIG + struct.pack(">HHB", w, h, step) + payload)


def cjpg_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _CJPG_SIG, "not a CJPG stream"
    w, h, step = struct.unpack(">HHB", data[4:9])
    ph, pw = h + ((-h) % 8), w + ((-w) % 8)
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.int16) \
        .reshape(3, ph // 8, pw // 8, 8, 8).astype(np.float64) * step
    m = _dct_matrix(8)
    out = np.empty((ph, pw, 3), dtype=np.float64)
    for ci in range(3):
        blk = np.einsum("ji,nmjk,kl->nmil", m, q[ci], m)
        out[..., ci] = _unblocks(blk)
    return np.clip(np.rint(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)


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


_DCT_CACHE: dict[int, np.ndarray] = {}


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (size-keyed cache): M @ M.T = I, so
    quantization MSE in coefficient space equals pixel-space MSE —
    the property the cjpg PSNR bound rests on."""
    if n not in _DCT_CACHE:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT_CACHE[n] = m
    return _DCT_CACHE[n]


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


def decode_audio(data: bytes, fmt: str, n_samples: int) -> np.ndarray:
    """Audio decode: raw s16le PCM → int16[n_samples]. Compressed
    codecs (opus/mp3/aac) are a decode STUB — entropy-coded psycho-
    acoustic codecs cannot be reimplemented from scratch in an offline
    sandbox (same stance as the inter-frame video codecs above); the
    Spark-side plumbing (binary column, batch shape, schema) is
    exercised through the s16le path."""
    if fmt == "s16le":
        out = np.frombuffer(data, dtype="<i2", count=n_samples)
        return out.astype(np.int16)
    raise NotImplementedError(
        f"audio codec {fmt!r}: compressed-audio decode is stubbed "
        "offline; only raw s16le PCM decodes")
