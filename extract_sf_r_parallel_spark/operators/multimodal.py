"""Multimodal (image) column operators over the opaque-binary model
(BASELINE.json input_hint: bytes + typed metadata).

All real Spark plumbing — schemas, mapInPandas batching, partitioning —
with the from-scratch codec (data/codec.py) doing decode. Operators:

- decode_stats:   decode → per-channel mean/std + recomputed phash
                  (verifies the lossless invariant end-to-end);
- resize_images:  decode → block resize → re-encode (PNG);
- pixel_embed:    deterministic 64-dim "embedding" from resized
                  grayscale (a stand-in for a vision encoder — the
                  container has no image/NN libs; the Spark-side
                  shape, batching and schema are the real thing);
- frame_sample:   video frame sampling over the from-scratch CPNV
                  container (data/codec.py: length-prefixed
                  concatenated PNG frames — intra-only, so skipped
                  frames are never decompressed). Unknown/compressed
                  video formats (mp4/webm…) still raise
                  NotImplementedError: no inter-frame codec ships in
                  this sandbox, and the CPNV path already exercises
                  the real plan (row-exploding mapInPandas, per-frame
                  schema, every_n selection).

mapInPandas (not a scalar UDF) so each Arrow batch amortizes codec
setup and output rows can differ in count (frame explosion)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..data import codec

__all__ = ["decode_stats", "resize_images", "pixel_embed", "frame_sample",
           "ahash_bits", "image_dup_groups", "sobel_stats", "blob_stats",
           "hist_equalize_stats", "crop_stats", "morph_stats", "sat_stats",
           "median_stats", "orient_hist", "glcm_stats", "motion_stats",
           "band_class", "otsu_stats", "harris_stats", "ycbcr_stats",
           "waveform_stats", "audio_pitch", "run_length_stats",
           "image_moments", "hough_lines", "audio_fingerprint",
           "lbp_stats", "ordered_dither", "template_match",
           "audio_resample", "mediancut_split", "noise_estimate",
           "letterbox_detect", "symmetry_score"]

_STATS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("phash_ok", T.BooleanType()),
])


def decode_stats(images: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = codec.decode_image(r.bytes, r.fmt, r.w, r.h)
                gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                rows.append((
                    r.image_id,
                    float(img[..., 0].mean()), float(img[..., 1].mean()),
                    float(img[..., 2].mean()), float(gray.std()),
                    codec.phash64(img) == r.phash,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in _STATS_SCHEMA.fields])
    return images.mapInPandas(gen, _STATS_SCHEMA)


_SOBEL_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("edge_energy", T.LongType()),
    T.StructField("max_grad", T.LongType()),
])


def sobel_stats(images: DataFrame) -> DataFrame:
    """Edge-detection feature extraction: the 3×3 Sobel operator on
    channel 0, exact int64 — per image the L1 gradient energy
    Σ(|gx|+|gy|) and peak |gx|+|gy| over interior pixels. The standard
    "is this image blurry / blank / busy" quality score for vision
    training-data filtering, and a convolution whose integer kernel a
    SQL oracle can replay term-for-term (gx weight dc·(2−|dr|), gy
    weight dr·(2−|dc|) over the 9 neighbor offsets).

    Scale: embarrassingly parallel mapInPandas — no shuffle at all;
    Arrow batches amortize decode, NumPy slicing does the convolution
    (no per-pixel Python)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                # gx = Σ v[r+dr][c+dc]·dc·(2−|dr|); gy mirrored
                gx = ((v[:-2, 2:] + 2 * v[1:-1, 2:] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[1:-1, :-2] + v[2:, :-2]))
                gy = ((v[2:, :-2] + 2 * v[2:, 1:-1] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[:-2, 1:-1] + v[:-2, 2:]))
                g = np.abs(gx) + np.abs(gy)
                rows.append((r.image_id, int(g.sum()), int(g.max())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SOBEL_SCHEMA.fields])
    return images.mapInPandas(gen, _SOBEL_SCHEMA)


_BLOB_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_fg", T.LongType()),
    T.StructField("n_blobs", T.LongType()),
    T.StructField("max_blob", T.LongType()),
])


def _blob_sizes(mask: np.ndarray) -> dict[int, int]:
    """4-connected component sizes over a boolean mask — union-find on
    flat pixel indices, labels = each component's MINIMUM flat index
    (the same label rule as the CC oracle's closure, so the two paths
    are comparable)."""
    h, w = mask.shape
    idx = np.arange(h * w).reshape(h, w)
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        r = a
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[a] != r:
            parent[a], a = r, parent[a]
        return r

    right = mask[:, :-1] & mask[:, 1:]
    down = mask[:-1, :] & mask[1:, :]
    for aa, bb in ((idx[:, :-1][right], idx[:, 1:][right]),
                   (idx[:-1, :][down], idx[1:, :][down])):
        for a, b in zip(aa.tolist(), bb.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    sizes: dict[int, int] = {}
    for f in np.flatnonzero(mask.ravel()).tolist():
        r = find(f)
        sizes[r] = sizes.get(r, 0) + 1
    return sizes


def blob_stats(images: DataFrame, thresh: int = 192) -> DataFrame:
    """Blob detection: threshold channel 0 at `thresh`, label the
    4-connected foreground components per image, report the foreground
    pixel count, the blob count and the largest blob's size — the
    standard object/speckle screen for vision training data (blank
    frames, salt noise, one-giant-blob scans all separate on these
    three numbers). Images with no foreground emit (0, 0, 0).

    Scale: embarrassingly parallel mapInPandas (one image never spans
    partitions); the union-find runs on the image's edge list, so cost
    is O(pixels) per image, no shuffle anywhere."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                sizes = _blob_sizes(v >= thresh)
                rows.append((r.image_id, sum(sizes.values()), len(sizes),
                             max(sizes.values()) if sizes else 0))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _BLOB_SCHEMA.fields])
    return images.mapInPandas(gen, _BLOB_SCHEMA)


_CROP_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("chip_sum", T.LongType()),
    T.StructField("chip_max", T.LongType()),
])


def crop_stats(images: DataFrame, x0: str, y0: str,
               size: int = 16) -> DataFrame:
    """Training-chip extraction: crop the size×size window whose
    top-left corner is at per-row columns (`x0`, `y0`) out of channel
    0 and report the chip's pixel sum and max — the decode→crop step
    every vision-training pipeline runs when cutting chips around
    labeled points. Offsets are data (columns), not parameters, so a
    geotagged table can aim each crop at its own target. Rows whose
    window falls outside the image fail loudly (a silent clamp would
    train on the wrong pixels).

    Scale: mapInPandas, decode + one NumPy slice per image; no
    shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                ox, oy = int(getattr(r, x0)), int(getattr(r, y0))
                if not (0 <= ox <= r.w - size and 0 <= oy <= r.h - size):
                    raise ValueError(
                        f"crop_stats: window ({ox},{oy})+{size} outside "
                        f"image {r.image_id} ({r.w}x{r.h})")
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                chip = v[oy:oy + size, ox:ox + size].astype(np.int64)
                rows.append((r.image_id, int(chip.sum()), int(chip.max())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _CROP_SCHEMA.fields])
    return images.mapInPandas(gen, _CROP_SCHEMA)


_HISTEQ_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("eq_sum", T.LongType()),
    T.StructField("eq_distinct", T.LongType()),
    T.StructField("eq_max", T.LongType()),
])


def hist_equalize_stats(images: DataFrame) -> DataFrame:
    """Histogram equalization on channel 0, all-integer: the classic
    contrast-normalization step of an image-preprocessing pipeline,
    with the remap eq(v) = ((cdf(v) − cdf_min)·255) // (n − cdf_min)
    kept in exact integer arithmetic so a second engine reproduces it
    bit-for-bit (no float CDF an oracle could round differently).
    Per image: the equalized pixel sum, the count of distinct
    equalized values (contrast span after remap), and the max (255
    for any non-constant image). Constant images map to 0.

    Scale: mapInPandas, one 256-bin bincount + cumsum per image — no
    shuffle, no dense intermediate beyond the histogram."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                hist = np.bincount(v.ravel(), minlength=256).astype(np.int64)
                cdf = np.cumsum(hist)
                present = hist > 0
                n = int(v.size)
                cdfmin = int(cdf[present].min())
                den = n - cdfmin
                if den > 0:
                    eq = ((cdf - cdfmin) * 255) // den
                else:           # constant image
                    eq = np.zeros(256, dtype=np.int64)
                pe = eq[present]
                rows.append((r.image_id,
                             int((pe * hist[present]).sum()),
                             int(np.unique(pe).size), int(pe.max())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _HISTEQ_SCHEMA.fields])
    return images.mapInPandas(gen, _HISTEQ_SCHEMA)


_AHASH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("ahash", T.StringType()),
])


def ahash_bits(images: DataFrame) -> DataFrame:
    """Integer-exact 64-bit average hash (aHash) per image: channel-0
    plane → 8×8 grid of block sums → bit b = 1 iff block mean > image
    mean, compared as block_sum·64 > total_sum (equal-size blocks, so
    the cross-multiplication stays in exact int64 — no float compare a
    second engine could round differently). Emitted as the 64-char bit
    string in (by, bx) row-major order: a near-duplicate with a few
    perturbed pixels keeps its hash, so groupBy(ahash) is the
    perceptual-dedup blocking key. Unlike codec.phash64 (float DCT +
    median), every step here is integer arithmetic, so the driver's
    DuckDB oracle re-derives the hash bit-for-bit from the synthetic
    pixel closed form. Requires w and h divisible by 8."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = codec.decode_image(r.bytes, r.fmt, r.w, r.h)
                gray = img[..., 0].astype(np.int64)
                h, w = gray.shape
                bs = gray.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
                bits = (bs * 64 > gray.sum()).ravel()
                rows.append((r.image_id,
                             "".join("1" if b else "0" for b in bits)))
            yield pd.DataFrame(rows, columns=["image_id", "ahash"])
    return images.mapInPandas(gen, _AHASH_SCHEMA)


def image_dup_groups(images: DataFrame) -> DataFrame:
    """Perceptual exact-dedup over the aHash key: every image labeled
    with its duplicate group's canonical id (min image_id sharing the
    hash) and the group size — the image twin of the text exact-dedup
    operator (operators/dedup.py). One hash pass + one shuffle on the
    64-bit key; at 100 TB the hash is 8 bytes/image and the groupBy
    skew-bounded (near-identical frames collapse to one key, which is
    precisely the point — the hot key IS the duplicate cluster)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hashes = ahash_bits(images)
    win = Window.partitionBy("ahash")
    return hashes.select(
        "image_id", "ahash",
        F.min("image_id").over(win).alias("canonical_id"),
        F.count(F.lit(1)).over(win).alias("group_size"),
    )


_RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def resize_images(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = codec.decode_image(r.bytes, r.fmt, r.w, r.h)
                small = np.stack([
                    codec.resize_block(img[..., c].astype(np.float64), out_h, out_w)
                    for c in range(3)
                ], axis=-1)
                small = np.clip(np.rint(small), 0, 255).astype(np.uint8)
                rows.append((r.image_id, codec.png_encode(small), out_w, out_h, "png"))
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])
    return images.mapInPandas(gen, _RESIZE_SCHEMA)


_EMBED_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def pixel_embed(images: DataFrame, dim: int = 64) -> DataFrame:
    """8×8 grayscale DCT block, L2-normalized → 64-dim embedding.
    Deterministic stand-in for a vision encoder (see module docstring);
    feeds the similarity operators with a real array<float> column."""
    side = int(np.sqrt(dim))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = codec.decode_image(r.bytes, r.fmt, r.w, r.h)
                gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                vec = codec.resize_block(gray, side, side).ravel()
                n = np.linalg.norm(vec)
                vec = vec / n if n > 0 else vec
                rows.append((r.image_id, vec.astype(np.float32).tolist()))
            yield pd.DataFrame(rows, columns=["image_id", "embedding"])
    return images.mapInPandas(gen, _EMBED_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every `every_n`-th frame of each video row into its own
    output row (frame explosion — mapInPandas, not a scalar UDF,
    because output row counts differ from input). CPNV videos walk the
    length-prefix header and slice only the selected frames (skipped
    frames stay compressed); still images pass through as frame 0;
    inter-frame-compressed formats raise NotImplementedError (no such
    codec ships in this sandbox — plug one into data/codec.py).
    Emitted frames are PNG rows decodable by decode_stats/pixel_embed,
    so sampling composes with the rest of the multimodal family."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.fmt == "cpnv":
                    for idx, png in codec.cpnv_iter_frames(
                            bytes(r.bytes), every_n):
                        rows.append((r.image_id, idx, png, r.w, r.h, "png"))
                elif r.fmt in ("png", "raw", "cjpg"):
                    rows.append((r.image_id, 0, r.bytes, r.w, r.h, r.fmt))
                else:
                    raise NotImplementedError(
                        f"video codec for fmt={r.fmt!r} not available in this "
                        "container; plug a decoder into data/codec.py")
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])
    return media.mapInPandas(gen, _FRAME_SCHEMA)


_MORPH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_fg", T.LongType()),
    T.StructField("n_eroded", T.LongType()),
    T.StructField("n_dilated", T.LongType()),
    T.StructField("n_opened", T.LongType()),
])


def _erode4(m: np.ndarray) -> np.ndarray:
    """Binary erosion with the 3×3 cross, zero-padded: a pixel
    survives iff it and its 4 edge-neighbours are foreground (border
    pixels never survive — their out-of-bounds neighbour is bg)."""
    out = np.zeros_like(m)
    if m.shape[0] >= 3 and m.shape[1] >= 3:
        out[1:-1, 1:-1] = (m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1]
                           & m[1:-1, :-2] & m[1:-1, 2:])
    return out


def _dilate4(m: np.ndarray) -> np.ndarray:
    """Binary dilation with the 3×3 cross (clipped at the border)."""
    out = m.copy()
    out[:-1, :] |= m[1:, :]
    out[1:, :] |= m[:-1, :]
    out[:, :-1] |= m[:, 1:]
    out[:, 1:] |= m[:, :-1]
    return out


def morph_stats(images: DataFrame, thresh: int = 192) -> DataFrame:
    """Mathematical morphology screen: threshold channel 0 at
    `thresh`, then report the foreground size after erosion, dilation
    and opening (erode→dilate) with the 3×3 cross — the standard
    despeckle/denoise diagnostics for vision training data (opening
    deletes salt noise but preserves solid shapes, so n_fg vs
    n_opened separates speckle images from structured ones).

    Scale: embarrassingly parallel mapInPandas; each morphology pass
    is four whole-array NumPy shifts (no per-pixel Python), and one
    image never spans partitions — zero shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                m = v >= thresh
                er = _erode4(m)
                rows.append((r.image_id, int(m.sum()), int(er.sum()),
                             int(_dilate4(m).sum()),
                             int(_dilate4(er).sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _MORPH_SCHEMA.fields])
    return images.mapInPandas(gen, _MORPH_SCHEMA)


_SAT_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("total", T.LongType()),
    T.StructField("mid_sat", T.LongType()),
    T.StructField("win_sum", T.LongType()),
])


def sat_stats(images: DataFrame, x0: str, y0: str,
              size: int = 16) -> DataFrame:
    """Summed-area table (integral image) — the O(1)-window-query
    primitive of vision feature extraction (Haar features, box blurs,
    brightness normalization all read it). Per image: the SAT is the
    2-D inclusive prefix sum of channel 0; this op reports the full
    total (the SAT's far corner), the SAT value at the image midpoint
    (w//2, h//2), and a `size`×`size` window sum at per-row offsets
    (`x0`, `y0`) evaluated THROUGH the 4-corner identity
    S(x1,y1) − S(x0−1,y1) − S(x1,y0−1) + S(x0−1,y0−1) — so any
    off-by-one in the cumsum or the corner indexing is caught by an
    oracle that sums the same regions directly.

    Scale: mapInPandas, two whole-array cumsums per image, no
    shuffle. Out-of-range windows fail loudly (cf. crop_stats)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                ox, oy = int(getattr(r, x0)), int(getattr(r, y0))
                if not (0 <= ox <= r.w - size and 0 <= oy <= r.h - size):
                    raise ValueError(
                        f"sat_stats: window ({ox},{oy})+{size} outside "
                        f"image {r.image_id} ({r.w}x{r.h})")
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                sat = v.cumsum(axis=0).cumsum(axis=1)

                def s(yy: int, xx: int) -> int:
                    return int(sat[yy, xx]) if yy >= 0 and xx >= 0 else 0

                x1, y1 = ox + size - 1, oy + size - 1
                win = (s(y1, x1) - s(oy - 1, x1)
                       - s(y1, ox - 1) + s(oy - 1, ox - 1))
                rows.append((r.image_id, s(r.h - 1, r.w - 1),
                             s(r.h // 2, r.w // 2), win))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SAT_SCHEMA.fields])
    return images.mapInPandas(gen, _SAT_SCHEMA)


_MEDIAN_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("sum_median", T.LongType()),
    T.StructField("n_changed", T.LongType()),
    T.StructField("max_absdiff", T.LongType()),
])


def median_stats(images: DataFrame) -> DataFrame:
    """3×3 median filter on channel 0 — the NONLINEAR rank filter next
    to the linear stencils (Sobel, box/focal mean): the classic
    salt-and-pepper denoiser, and the impulse-noise screen for vision
    training data (a large n_changed / max_absdiff means speckle).
    Per image, over interior pixels: Σ median, #(median ≠ center), and
    max |median − center| — all exact integers (the median of 9 ints
    IS the 5th order statistic, no interpolation ever happens).

    Implementation: stack the 9 shifted views, ONE partial sort
    (np.partition at k=4) along the stack axis — O(1) per pixel, no
    per-pixel Python. Shuffle-free mapInPandas, like every per-image
    op in this module.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                stack = np.stack([v[1 + dr:v.shape[0] - 1 + dr,
                                    1 + dc:v.shape[1] - 1 + dc]
                                  for dr in (-1, 0, 1)
                                  for dc in (-1, 0, 1)])
                med = np.partition(stack, 4, axis=0)[4]
                ctr = v[1:-1, 1:-1]
                diff = np.abs(med - ctr)
                rows.append((r.image_id, int(med.sum()),
                             int((diff > 0).sum()), int(diff.max())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _MEDIAN_SCHEMA.fields])
    return images.mapInPandas(gen, _MEDIAN_SCHEMA)


_ORIENT_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("obin", T.IntegerType()),
    T.StructField("n", T.LongType()),
])


def orient_hist(images: DataFrame) -> DataFrame:
    """Gradient-orientation histogram (HOG-lite) on channel 0 — the
    descriptor family behind HOG/SIFT, reduced to its exact-integer
    core so an SQL oracle can replay it: Sobel (gx, gy) per interior
    pixel, orientation binned into 8 sectors by SIGN/MAGNITUDE
    comparisons only (obin = 4·[gy<0] + 2·[gx<0] + [|gy|>|gx|]; ties
    |gy|=|gx| fall to the [ax≥ay] side), zero-gradient pixels in
    their own bin −1. No atan2, no floats, nothing an engine could
    round differently. Output long-format (image_id, obin, n).

    Scale: shuffle-free mapInPandas like every per-image op here;
    NumPy does the binning (no per-pixel Python)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                gx = ((v[:-2, 2:] + 2 * v[1:-1, 2:] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[1:-1, :-2] + v[2:, :-2]))
                gy = ((v[2:, :-2] + 2 * v[2:, 1:-1] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[:-2, 1:-1] + v[:-2, 2:]))
                flat = (gx == 0) & (gy == 0)
                obin = (4 * (gy < 0) + 2 * (gx < 0)
                        + (np.abs(gy) > np.abs(gx))).astype(np.int64)
                obin[flat] = -1
                vals, cnts = np.unique(obin, return_counts=True)
                rows.extend((r.image_id, int(b), int(c))
                            for b, c in zip(vals, cnts))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _ORIENT_SCHEMA.fields])
    return images.mapInPandas(gen, _ORIENT_SCHEMA)


_GLCM_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("contrast", T.LongType()),
    T.StructField("energy", T.LongType()),
    T.StructField("n_pairs", T.LongType()),
])


def glcm_stats(images: DataFrame, levels: int = 4) -> DataFrame:
    """Texture features from the gray-level co-occurrence matrix
    (Haralick 1973, the classic texture descriptor): quantize channel
    0 to `levels` gray levels (v div (256/levels) — exact), count
    horizontally-adjacent level pairs P(i,j), and report the two
    integer-exact Haralick moments — contrast Σ(i−j)²·P(i,j) and
    energy Σ P(i,j)² — plus the pair count. Smooth images score low
    contrast / high energy; noise scores the reverse: the texture
    screen for vision training data.

    Everything stays integer (no normalization — the moments over raw
    counts carry the same signal and hash identically), so the oracle
    can rebuild the full GLCM from an adjacency self-join."""
    if 256 % levels:
        raise ValueError(f"glcm_stats: levels={levels} must divide 256")
    q = 256 // levels
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                lv = (v // q).astype(np.int64)
                a, b = lv[:, :-1], lv[:, 1:]
                pair = a * levels + b
                cnts = np.bincount(pair.ravel(), minlength=levels * levels)
                i = np.arange(levels * levels) // levels
                j = np.arange(levels * levels) % levels
                contrast = int(((i - j) ** 2 * cnts).sum())
                energy = int((cnts.astype(object) ** 2).sum())
                rows.append((r.image_id, contrast, energy, int(cnts.sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _GLCM_SCHEMA.fields])
    return images.mapInPandas(gen, _GLCM_SCHEMA)


_MOTION_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("motion_l1", T.LongType()),
    T.StructField("max_px_diff", T.LongType()),
])


def motion_stats(videos: DataFrame) -> DataFrame:
    """Frame-differencing motion energy over CPNV videos — the
    scene-cut / static-clip screen for video training data: for every
    consecutive frame pair (j−1, j) of channel 0, Σ|Δpixel| and
    max|Δpixel|, exact int64. A static clip scores ~0; a hard cut
    spikes max_px_diff. One output row per pair (frame_idx = j ≥ 1);
    single-frame clips emit nothing.

    Scale: mapInPandas frame walk, frames decoded once per video and
    differenced with whole-array NumPy — no shuffle, no per-pixel
    Python. Inter-frame codecs (mp4/webm) still raise upstream in the
    codec, as documented there."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                frames = codec.cpnv_decode(r.bytes)
                prev = None
                for j, f in enumerate(frames):
                    cur = f[..., 0].astype(np.int64)
                    if prev is not None:
                        d = np.abs(cur - prev)
                        rows.append((r.image_id, j, int(d.sum()),
                                     int(d.max())))
                    prev = cur
            yield pd.DataFrame(
                rows, columns=[f.name for f in _MOTION_SCHEMA.fields])
    return videos.mapInPandas(gen, _MOTION_SCHEMA)


_BAND_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_veg", T.LongType()),
    T.StructField("n_water", T.LongType()),
    T.StructField("n_neutral", T.LongType()),
    T.StructField("diff_sum", T.LongType()),
])


def band_class(images: DataFrame) -> DataFrame:
    """Band-math pixel classification (r07) — the NDVI pattern from
    remote sensing mapped onto the RGB fixture: treating channel 2 as
    NIR and channel 0 as red, classify each pixel by the sign and
    magnitude of the normalized difference WITHOUT ever dividing —
    NDVI > 0.1 ⇔ 10·(nir − red) > (nir + red), an exact integer
    comparison both engines evaluate identically (the float ratio
    would round differently at the class boundary). Emits per image
    the vegetation / water / neutral pixel counts plus Σ(nir − red).

    Scale: embarrassingly parallel mapInPandas, no shuffle; whole-
    array NumPy comparisons, no per-pixel Python."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h) \
                    .astype(np.int64)
                red, nir = v[..., 0], v[..., 2]
                veg = 10 * (nir - red) > (nir + red)
                water = 10 * (red - nir) > (nir + red)
                rows.append((r.image_id, int(veg.sum()), int(water.sum()),
                             int((~(veg | water)).sum()),
                             int((nir - red).sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _BAND_SCHEMA.fields])
    return images.mapInPandas(gen, _BAND_SCHEMA)


_OTSU_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("otsu_t", T.IntegerType()),
    T.StructField("n0", T.LongType()),
    T.StructField("n1", T.LongType()),
    T.StructField("q_scaled", T.StringType()),
])


def otsu_stats(images: DataFrame) -> DataFrame:
    """Otsu's automatic threshold (r07) on channel 0, exact-integer
    formulation: over candidate thresholds t ∈ the image's DISTINCT
    pixel values (class 0 = v ≤ t; the last value is excluded — empty
    class 1 is not a split), maximize the between-class objective as
    the 2^20-scaled floor quotient

        q(t) = ((s0·n1 − s1·n0)² << 20) // (n0·n1)

    with Python arbitrary-precision ints (the square peaks ~5·10²⁰,
    past int64 — the oracle replays it in DuckDB HUGEINT, floor
    division matching `//` on the non-negative operands). Ties break
    to the LOWEST t. q is emitted as a digit string: exact, and too
    wide for int64.

    Scale: per-image work is one np.unique + a ≤256-step scan —
    mapInPandas, no shuffle, independent of image size beyond the
    histogram pass."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                n_tot = int(v.size)
                s_tot = int(v.sum(dtype=np.int64))
                vals, counts = np.unique(v, return_counts=True)
                best = None
                n0 = 0
                s0 = 0
                for val, cnt in zip(vals.tolist(), counts.tolist()):
                    n0 += int(cnt)
                    s0 += int(val) * int(cnt)
                    n1 = n_tot - n0
                    if n1 == 0:
                        break
                    num = (s0 * n1 - (s_tot - s0) * n0) ** 2
                    q = (num << 20) // (n0 * n1)
                    if best is None or q > best[0]:
                        best = (q, int(val), n0, n1)
                if best is not None:
                    rows.append((r.image_id, best[1], best[2], best[3],
                                 str(best[0])))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _OTSU_SCHEMA.fields])
    return images.mapInPandas(gen, _OTSU_SCHEMA)


_HARRIS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_pos", T.LongType()),
    T.StructField("n_corners", T.LongType()),
    T.StructField("max_r16", T.LongType()),
    T.StructField("sum_r16_m", T.LongType()),
])


def harris_stats(images: DataFrame, thresh: int = 0) -> DataFrame:
    """Harris corner response (r07), exact-integer formulation: Sobel
    gradients on channel 0, 3×3 box structure tensor (A=Σgx², B=Σgy²,
    C=Σgxgy), and the response with k = 1/16 cleared of the division:

        R16 = 16·(A·B − C²) − (A+B)²        (≤ ~1.4e15, int64-safe)

    Per image: #(R16 > 0), #(R16 > thresh), max R16, and
    Σ_{R16>0} (R16 div 2^20) — the positives-only floor-scaled sum
    (positive operands ⇒ Spark's truncating `div` == DuckDB's flooring
    `//`; a signed sum of raw R16 would overflow int64). Defined on
    pixels ≥2 from the border (Sobel interior, then window interior).

    Scale: shuffle-free mapInPandas, whole-array NumPy; the oracle
    replays gradients AND window sums as two chained 9-offset scatter
    joins."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                gx = ((v[:-2, 2:] + 2 * v[1:-1, 2:] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[1:-1, :-2] + v[2:, :-2]))
                gy = ((v[2:, :-2] + 2 * v[2:, 1:-1] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[:-2, 1:-1] + v[:-2, 2:]))

                def box(a):
                    return (a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
                            + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
                            + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:])

                A, B, C = box(gx * gx), box(gy * gy), box(gx * gy)
                r16 = 16 * (A * B - C * C) - (A + B) * (A + B)
                pos = r16 > 0
                rows.append((r.image_id, int(pos.sum()),
                             int((r16 > thresh).sum()),
                             int(r16.max()) if r16.size else 0,
                             int((r16[pos] // (1 << 20)).sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _HARRIS_SCHEMA.fields])
    return images.mapInPandas(gen, _HARRIS_SCHEMA)


_YCBCR_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("sum_y", T.LongType()),
    T.StructField("min_y", T.LongType()),
    T.StructField("max_y", T.LongType()),
    T.StructField("sum_cb", T.LongType()),
    T.StructField("sum_cr", T.LongType()),
])


def ycbcr_stats(images: DataFrame) -> DataFrame:
    """Integer RGB→YCbCr color-space conversion (r07) — the
    preprocessing step every JPEG/video encoder and most augmentation
    pipelines run first, and the FIRST op in this family to touch all
    THREE channels (everything else reads channel 0). BT.601-shaped
    integer coefficients scaled by 256 so each plane stays exact:

        Y256  =  77·R + 150·G +  29·B      (weights sum to 256)
        Cb256 = −43·R −  85·G + 128·B      (weights sum to 0)
        Cr256 = 128·R − 107·G −  21·B

    Per image: Σ/min/max of Y256 and Σ of the signed chroma planes
    (int64-safe: ≤ 96·96 px · 65280 ≪ 2^63). No division, no
    rounding — the oracle re-derives every plane bit-for-bit from the
    synthetic pixel closed form at channel offsets j = 3p, 3p+1,
    3p+2. Scale: shuffle-free mapInPandas, whole-array NumPy."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for im in pdf.itertuples():
                img = codec.decode_image(im.bytes, im.fmt, im.w, im.h) \
                    .astype(np.int64)
                r, g, b = img[..., 0], img[..., 1], img[..., 2]
                y = 77 * r + 150 * g + 29 * b
                cb = -43 * r - 85 * g + 128 * b
                cr = 128 * r - 107 * g - 21 * b
                rows.append((im.image_id, int(y.sum()), int(y.min()),
                             int(y.max()), int(cb.sum()), int(cr.sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _YCBCR_SCHEMA.fields])
    return images.mapInPandas(gen, _YCBCR_SCHEMA)


_WAVE_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("max_abs", T.LongType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("zero_cross", T.LongType()),
    T.StructField("energy", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("n_voiced", T.LongType()),
])


def waveform_stats(clips: DataFrame, frame: int = 1024,
                   vad_thresh_ms: int = 358_000_000) -> DataFrame:
    """Audio waveform features (r07) — the audio leg of the multimodal
    family (librosa `zero_crossing_rate`/RMS, WebRTC-style energy
    VAD), all exact-integer so the oracle replays every sample from
    the closed form:

    - max_abs / sum_abs / energy (Σ s², ≤ 8192·2^30 ≪ 2^63)
    - zero_cross: #(t : s_t·s_{t+1} < 0) — strict sign change
    - n_voiced: of the n div `frame` FULL frames, how many have
      frame energy ≥ `vad_thresh_ms`·frame (i.e. mean square ≥
      vad_thresh_ms — the uniform-PCM mean square is ≈ 2^32/12 ≈
      3.58e8, so the default splits frames near 50/50)

    Input must be pre-filtered to decodable fmt ('s16le'):
    codec.decode_audio raises on compressed codecs by design (decode
    stub, same stance as inter-frame video). Scale: shuffle-free
    mapInPandas, whole-array NumPy per clip."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                s = codec.decode_audio(r.bytes, r.fmt, r.n_samples) \
                    .astype(np.int64)
                zc = int(((s[:-1] * s[1:]) < 0).sum())
                nf = len(s) // frame
                fe = (s[:nf * frame] ** 2).reshape(nf, frame).sum(axis=1)
                rows.append((r.clip_id, len(s), int(np.abs(s).max()),
                             int(np.abs(s).sum()), zc, int((s * s).sum()),
                             nf, int((fe >= vad_thresh_ms * frame).sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WAVE_SCHEMA.fields])
    return clips.mapInPandas(gen, _WAVE_SCHEMA)


_PITCH_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("best_lag", T.LongType()),
    T.StructField("r_best", T.LongType()),
    T.StructField("r_lag32", T.LongType()),
    T.StructField("f0_milli", T.LongType()),
])


def audio_pitch(clips: DataFrame, win: int = 512,
                lags: tuple = tuple(range(32, 97, 8))) -> DataFrame:
    """Autocorrelation pitch estimation (r07 wave D) — the classic
    ACF pitch tracker (YIN/RAPT's first stage): over the first `win`
    samples of each clip, R(L) = Σ_t s_t·s_{t+L} for a fixed lag
    grid; the fundamental period estimate is argmax R (ties → the
    SMALLEST lag, deterministic in both engines), and
    f0_milli = sr·1000 div best_lag. Exact int64 throughout
    (|s| < 2^15, win = 512 → |R| < 512·2^30 ≪ 2^63), so the oracle
    re-derives every product from the closed-form sample plane.

    Input must be pre-filtered to decodable fmt ('s16le') —
    codec.decode_audio raises on compressed codecs by design.
    Scale: shuffle-free mapInPandas; per clip one win×|lags| NumPy
    matmul-shaped dot, no per-sample Python."""
    lag_arr = np.asarray(lags, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                s = codec.decode_audio(r.bytes, r.fmt, r.n_samples) \
                    .astype(np.int64)
                head = s[:win]
                acf = np.array([int(head @ s[L:L + win])
                                for L in lag_arr], dtype=np.int64)
                i = int(np.argmax(acf))  # first max = smallest lag
                best = int(lag_arr[i])
                rows.append((r.clip_id, best, int(acf[i]), int(acf[0]),
                             int(r.sr) * 1000 // best))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PITCH_SCHEMA.fields])
    return clips.mapInPandas(gen, _PITCH_SCHEMA)


_RLE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_px", T.LongType()),
    T.StructField("n_runs", T.LongType()),
    T.StructField("max_run", T.LongType()),
    T.StructField("mean_run_milli", T.LongType()),
])


def run_length_stats(images: DataFrame, q_shift: int = 6) -> DataFrame:
    """Run-length encoding statistics (r07 wave D) — the RLE
    compressibility probe (fax G3 / TIFF PackBits shape, and the
    cheap "is this image synthetic/flat?" screen for vision training
    data): channel 0 is quantized to 2^(8−q_shift) levels
    (q = v >> q_shift), runs are maximal same-q spans WITHIN each
    pixel row (runs never cross row boundaries, as in every scanline
    codec), and per image we emit run count, longest run, and mean
    run length in exact milli-pixels (n_px·1000 div n_runs).

    Scale: shuffle-free mapInPandas; runs found by one vectorized
    diff per image. The oracle replays runs as a gaps-and-islands
    window over the closed-form pixel plane."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
                q = (v.astype(np.int64) >> q_shift)
                starts = np.ones_like(q, dtype=bool)
                starts[:, 1:] = q[:, 1:] != q[:, :-1]
                flat = starts.ravel()
                n_runs = int(flat.sum())
                idx = np.flatnonzero(flat)
                lens = np.diff(np.append(idx, q.size))
                n_px = int(q.size)
                rows.append((r.image_id, n_px, n_runs, int(lens.max()),
                             n_px * 1000 // n_runs))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RLE_SCHEMA.fields])
    return images.mapInPandas(gen, _RLE_SCHEMA)


_MOM_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("mass", T.LongType()),
    T.StructField("m10", T.LongType()),
    T.StructField("m01", T.LongType()),
    T.StructField("mu20m", T.LongType()),
    T.StructField("mu02m", T.LongType()),
    T.StructField("mu11m", T.LongType()),
    T.StructField("elong", T.LongType()),
])


def image_moments(images: DataFrame) -> DataFrame:
    """Raw + central image moments (r07 wave E) — the shape
    descriptor underneath Hu moments / OpenCV `cv2.moments`:
    intensity mass M = Σv, first moments m10 = Σv·x / m01 = Σv·y
    (centroid numerators), and the M-scaled central second moments
    µ20·M = M·m20 − m10², µ02·M, µ11·M = M·m11 − m10·m01 — kept as
    EXACT int64 (the M scaling clears the centroid division;
    bounds: M ≤ 255·96², M·m20 ≲ 5·10^16 ≪ 2^63). `elong` is the
    integer orientation/elongation verdict sign(µ20M − µ02M)
    (wider-than-tall = +1) — the anisotropy bit a layout classifier
    keys on. Shuffle-free mapInPandas, whole-array NumPy; the
    oracle replays every moment from the closed-form pixel plane."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                ys, xs = np.mgrid[0:r.h, 0:r.w]
                m = int(v.sum())
                m10 = int((v * xs).sum())
                m01 = int((v * ys).sum())
                m20 = int((v * xs * xs).sum())
                m02 = int((v * ys * ys).sum())
                m11 = int((v * xs * ys).sum())
                mu20m = m * m20 - m10 * m10
                mu02m = m * m02 - m01 * m01
                mu11m = m * m11 - m10 * m01
                rows.append((r.image_id, m, m10, m01, mu20m, mu02m,
                             mu11m, int(np.sign(mu20m - mu02m))))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _MOM_SCHEMA.fields])
    return images.mapInPandas(gen, _MOM_SCHEMA)


_HOUGH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_edges", T.LongType()),
    T.StructField("best_count", T.LongType()),
    T.StructField("best_theta", T.LongType()),
    T.StructField("best_rho", T.LongType()),
])

# 1024-scaled cos/sin at θ = t·30° for t = 0..5 — integer literals so
# the SQL oracle votes with bit-identical arithmetic
_HCOS = (1024, 887, 512, 0, -512, -887)
_HSIN = (0, 512, 887, 1024, 887, 512)


def hough_lines(images: DataFrame, thresh: int = 800,
                scale: int = 4096, off: int = 131072) -> DataFrame:
    """Hough line detection (r07 wave F) — the classic voting
    transform (Duda–Hart '72; OpenCV HoughLines) kept exact-integer:
    edge pixels (interior Sobel L1 ≥ `thresh`) vote into a (θ, ρ)
    accumulator with 1024-scaled integer trig, ρ bucket =
    (x·cosθ₁₀₂₄ + y·sinθ₁₀₂₄ + off) div scale (`off` keeps the
    numerator positive so floor ≡ trunc). Per image: edge count and
    the strongest accumulator cell — ties break to the smallest
    (θ, ρ), deterministic in both engines via max-count → min-θ →
    min-ρ. Shuffle-free mapInPandas; votes via one bincount per θ."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                gx = ((v[:-2, 2:] + 2 * v[1:-1, 2:] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[1:-1, :-2] + v[2:, :-2]))
                gy = ((v[2:, :-2] + 2 * v[2:, 1:-1] + v[2:, 2:])
                      - (v[:-2, :-2] + 2 * v[:-2, 1:-1] + v[:-2, 2:]))
                mask = (np.abs(gx) + np.abs(gy)) >= thresh
                ys, xs = np.nonzero(mask)
                xs, ys = xs + 1, ys + 1      # interior → image coords
                best = (0, -1, -1)           # (count, theta, rho)
                for t in range(6):
                    rho = (xs * _HCOS[t] + ys * _HSIN[t] + off) // scale
                    if rho.size == 0:
                        continue
                    vals, cnts = np.unique(rho, return_counts=True)
                    i = int(np.argmax(cnts))  # first max = smallest rho
                    if cnts[i] > best[0]:
                        best = (int(cnts[i]), t, int(vals[i]))
                rows.append((r.image_id, int(mask.sum()),
                             best[0], best[1], best[2]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _HOUGH_SCHEMA.fields])
    return images.mapInPandas(gen, _HOUGH_SCHEMA)


_AFP_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("fp", T.LongType()),
])


def audio_fingerprint(clips: DataFrame, frame: int = 64,
                      bits: int = 16) -> DataFrame:
    """Acoustic fingerprint (r07 wave G) — the Chromaprint/Shazam
    shape reduced to its deterministic core: frame energies E_f over
    `frame`-sample windows, bit_i = (E_{i+1} > E_i), fp = Σ bit_i·2^i
    (a `bits`-bit energy-delta signature, exact int64 end-to-end).
    Needs bits+1 frames — every s16le clip (≥2048 samples) has ≥32
    at the default 64. Shuffle-free mapInPandas; the dedup screen
    over these fingerprints is LSH-banded downstream (the audio
    analog of simhash banding)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                s = codec.decode_audio(r.bytes, r.fmt, r.n_samples) \
                    .astype(np.int64)
                nf = bits + 1
                en = (s[:nf * frame] ** 2).reshape(nf, frame).sum(axis=1)
                bvec = (en[1:] > en[:-1]).astype(np.int64)
                fp = int((bvec << np.arange(bits)).sum())
                rows.append((r.clip_id, fp))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AFP_SCHEMA.fields])
    return clips.mapInPandas(gen, _AFP_SCHEMA)


_LBP_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_interior", T.LongType()),
    T.StructField("sum_code", T.LongType()),
    T.StructField("n_uniform", T.LongType()),
    T.StructField("n_q0", T.LongType()),
    T.StructField("n_q1", T.LongType()),
    T.StructField("n_q2", T.LongType()),
    T.StructField("n_q3", T.LongType()),
])

# LBP neighbor order: counterclockwise from east — bit k set when the
# k-th neighbor ≥ centre. The SQL oracle replays the same offsets.
LBP_OFFS = ((0, 1), (-1, 1), (-1, 0), (-1, -1),
            (0, -1), (1, -1), (1, 0), (1, 1))


def lbp_stats(images: DataFrame) -> DataFrame:
    """Local-binary-pattern texture features (Ojala et al.), exact
    integer — per image over channel-0 interior pixels: the 8-bit LBP
    code (bit k ⟺ neighbor_k ≥ centre, neighbors counterclockwise
    from east), its sum, the count of UNIFORM patterns (≤ 2 circular
    0↔1 transitions — popcount(code XOR rol8(code)) ≤ 2), and a
    4-bin coarse histogram. The texture descriptor behind face/defect
    classification pipelines, and — like Sobel/GLCM — a per-image
    quality signal for vision training-data curation.

    Scale: embarrassingly parallel mapInPandas, no shuffle; NumPy
    shifted-view comparisons (no per-pixel Python)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                c = v[1:-1, 1:-1]
                code = np.zeros_like(c)
                for k, (dr, dc) in enumerate(LBP_OFFS):
                    nb = v[1 + dr:v.shape[0] - 1 + dr,
                           1 + dc:v.shape[1] - 1 + dc]
                    code |= (nb >= c).astype(np.int64) << k
                rot = ((code << 1) | (code >> 7)) & 255
                x = code ^ rot        # popcount via unpackbits (8-bit)
                trans = np.unpackbits(x.astype(np.uint8)[..., None],
                                      axis=-1).sum(axis=-1)
                rows.append((r.image_id, int(code.size), int(code.sum()),
                             int((trans <= 2).sum()),
                             int((code < 64).sum()),
                             int(((code >= 64) & (code < 128)).sum()),
                             int(((code >= 128) & (code < 192)).sum()),
                             int((code >= 192).sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _LBP_SCHEMA.fields])
    return images.mapInPandas(gen, _LBP_SCHEMA)


_DITHER_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_on", T.LongType()),
    T.StructField("q00", T.LongType()),
    T.StructField("q01", T.LongType()),
    T.StructField("q10", T.LongType()),
    T.StructField("q11", T.LongType()),
])

# the standard 4×4 Bayer index matrix (recursive interleave order)
BAYER4 = np.array([[0, 8, 2, 10],
                   [12, 4, 14, 6],
                   [3, 11, 1, 9],
                   [15, 7, 13, 5]], dtype=np.int64)


def ordered_dither(images: DataFrame) -> DataFrame:
    """Ordered (Bayer 4×4) dithering — the halftoning step of 1-bit
    image export, chosen over Floyd–Steinberg because it is
    POSITION-LOCAL (error diffusion is a serial scan; the threshold
    matrix is embarrassingly parallel, the right choice at 100 TB).
    Channel-0 pixel turns ON ⟺ px ≥ 16·B4[r%4][c%4] + 9 — the
    engine's fixed integer threshold convention (a slightly stricter
    cut than px/255 > (B+0.5)/16, whose exact form would be
    32·px > 510·B + 255; both engines use the SAME 16·B+9 rule, so
    results agree bit-for-bit — ADVICE r07). Per
    image: total ON count and the ON count per 2×2 quadrant (the
    dithered density map a thumbnail service checks).

    Scale: mapInPandas, zero shuffle; NumPy tiling, no per-pixel
    Python."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                h, w = v.shape
                thr = 16 * BAYER4[np.arange(h)[:, None] % 4,
                                  np.arange(w)[None, :] % 4] + 9
                on = v >= thr
                qr = (np.arange(h)[:, None] * 2) // h
                qc = (np.arange(w)[None, :] * 2) // w
                q = np.zeros((2, 2), dtype=np.int64)
                for a in (0, 1):
                    for b in (0, 1):
                        q[a, b] = int(on[(qr == a) & (qc == b)].sum())
                rows.append((r.image_id, int(on.sum()),
                             int(q[0, 0]), int(q[0, 1]),
                             int(q[1, 0]), int(q[1, 1])))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DITHER_SCHEMA.fields])
    return images.mapInPandas(gen, _DITHER_SCHEMA)


_TMPL_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("best_r", T.LongType()),
    T.StructField("best_c", T.LongType()),
    T.StructField("best_score", T.LongType()),
])

# deterministic 5×5 integer template, values in −2..2
TMPL5 = ((np.arange(5)[:, None] * 7 + np.arange(5)[None, :] * 3 + 1)
         % 5 - 2).astype(np.int64)


def template_match(images: DataFrame) -> DataFrame:
    """Template matching — the integer cross-correlation core of
    patch localization (OpenCV matchTemplate / CCORR): slide the
    fixed 5×5 signed template over channel 0, score(r, c) =
    Σ T[i,j]·v[r+i, c+j], report the argmax with ties broken to the
    smallest (r, c) — fully deterministic, exact int64. The
    normalized variants divide by patch norms (float); the raw-CCORR
    form is chosen so the SQL oracle can replay all 25 terms
    verbatim.

    Scale: mapInPandas, zero shuffle; the convolution is 25 NumPy
    shifted adds per image — no FFT needed at kernel size 5."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                H, Wd = v.shape
                score = np.zeros((H - 4, Wd - 4), dtype=np.int64)
                for i in range(5):
                    for j in range(5):
                        score += TMPL5[i, j] * v[i:H - 4 + i, j:Wd - 4 + j]
                best = int(score.max())
                pos = np.argwhere(score == best)
                br, bc = pos[np.lexsort((pos[:, 1], pos[:, 0]))][0]
                rows.append((r.image_id, int(br), int(bc), best))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _TMPL_SCHEMA.fields])
    return images.mapInPandas(gen, _TMPL_SCHEMA)


_RESAMPLE_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("n_out", T.LongType()),
    T.StructField("sum_abs2", T.LongType()),
    T.StructField("energy4", T.LongType()),
    T.StructField("max_abs2", T.LongType()),
])


def audio_resample(clips: DataFrame) -> DataFrame:
    """Rational 2/3 audio resampling (the 48 kHz → 32 kHz shape) with
    linear interpolation, kept EXACT by emitting 2×-scaled samples:
    output position k sits at input position 3k/2, so even k reads
    one sample (out2 = 2·s[3k/2]) and odd k the midpoint (out2 =
    s[(3k−1)/2] + s[(3k+1)/2]) — no division ever happens (a /2 on
    signed sums would floor-vs-trunc diverge across engines).
    Reports per clip the resampled length 2(n−1) div 3 + 1 and
    scaled abs-sum / energy (4×) / peak stats.

    Input pre-filtered to decodable fmt ('s16le'); scale:
    shuffle-free mapInPandas, whole-array NumPy."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                s = codec.decode_audio(r.bytes, r.fmt, r.n_samples) \
                    .astype(np.int64)
                n_out = 2 * (len(s) - 1) // 3 + 1
                k = np.arange(n_out)
                even = k % 2 == 0
                out2 = np.empty(n_out, dtype=np.int64)
                out2[even] = 2 * s[3 * k[even] // 2]
                a = (3 * k[~even] - 1) // 2
                out2[~even] = s[a] + s[a + 1]
                # n_out = 0 only for an empty clip (len(s) == 0, never
                # produced by the synth, ADVICE r07): emit zeros
                # instead of letting max() raise on an empty array
                peak = int(np.abs(out2).max()) if n_out else 0
                rows.append((r.clip_id, n_out, int(np.abs(out2).sum()),
                             int((out2 * out2).sum()), peak))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RESAMPLE_SCHEMA.fields])
    return clips.mapInPandas(gen, _RESAMPLE_SCHEMA)


_MEDIANCUT_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("split_c", T.LongType()),
    T.StructField("med_v", T.LongType()),
    T.StructField("n_lo", T.LongType()),
    T.StructField("n_hi", T.LongType()),
])


def mediancut_split(images: DataFrame) -> DataFrame:
    """The first split of median-cut color quantization (Heckbert):
    per image, find the channel with the widest value range (ties →
    R before G before B), take that channel's LOWER median (rank
    (n+1) div 2 in value order), and report how many pixels fall in
    each half (≤ median vs >). The palette-construction primitive
    behind GIF/PNG8 export; deterministic and exact-integer
    throughout.

    Scale: mapInPandas, zero shuffle; per-image np.sort."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = codec.decode_image(r.bytes, r.fmt, r.w, r.h) \
                    .astype(np.int64)
                rng = [int(img[..., c].max() - img[..., c].min())
                       for c in range(3)]
                split = int(np.argmax(rng))  # argmax ties → smallest c
                v = np.sort(img[..., split].ravel())
                med = int(v[(len(v) + 1) // 2 - 1])
                rows.append((r.image_id, split, med,
                             int((v <= med).sum()), int((v > med).sum())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _MEDIANCUT_SCHEMA.fields])
    return images.mapInPandas(gen, _MEDIANCUT_SCHEMA)


_NOISE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_interior", T.LongType()),
    T.StructField("lap_sum", T.LongType()),
    T.StructField("lap_max", T.LongType()),
])


def noise_estimate(images: DataFrame) -> DataFrame:
    """Immerkær-style noise estimation, integer core: the 4-connected
    Laplacian |4·v − N − S − E − W| over channel-0 interior pixels —
    flat noisy images score high per pixel, clean gradients score
    low; the σ estimate is lap_sum·√(π/2)/(6·n) driver-side (the √
    deliberately never enters the engine). The blur/noise quality
    gate for vision curation, next to sobel_stats' busy-ness score.

    Scale: mapInPandas shifted adds, zero shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                lap = np.abs(4 * v[1:-1, 1:-1] - v[:-2, 1:-1]
                             - v[2:, 1:-1] - v[1:-1, :-2] - v[1:-1, 2:])
                rows.append((r.image_id, int(lap.size), int(lap.sum()),
                             int(lap.max())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _NOISE_SCHEMA.fields])
    return images.mapInPandas(gen, _NOISE_SCHEMA)


_LETTERBOX_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("border_n", T.LongType()),
    T.StructField("border_sum", T.LongType()),
    T.StructField("interior_n", T.LongType()),
    T.StructField("interior_sum", T.LongType()),
    T.StructField("letterboxed", T.BooleanType()),
])


def letterbox_detect(images: DataFrame, margin: int = 2) -> DataFrame:
    """Letterbox / framing detector — the curation screen that flags
    images whose `margin`-pixel border is much darker than the
    content (black bars from aspect-ratio padding): channel-0 sums
    over border vs interior, verdict border_mean < interior_mean/2
    kept integer by cross-multiplication (2·border_sum·interior_n <
    interior_sum·border_n). Exact int64; mapInPandas, zero shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                inner = v[margin:-margin, margin:-margin]
                tot, n = int(v.sum()), v.size
                isum, inum = int(inner.sum()), inner.size
                bsum, bn = tot - isum, n - inum
                rows.append((r.image_id, bn, bsum, inum, isum,
                             2 * bsum * inum < isum * bn))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _LETTERBOX_SCHEMA.fields])
    return images.mapInPandas(gen, _LETTERBOX_SCHEMA)


_SYMMETRY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("n_pairs", T.LongType()),
    T.StructField("asym_sum", T.LongType()),
    T.StructField("asym_max", T.LongType()),
])


def symmetry_score(images: DataFrame) -> DataFrame:
    """Horizontal-mirror asymmetry — the composition screen that
    separates symmetric subjects (faces, logos, architecture) from
    natural scenes: Σ|v[r, c] − v[r, w−1−c]| over the left half of
    channel 0 (each mirror pair counted once; the odd middle column
    is its own mirror and contributes zero, so it is skipped).
    Exact int64; mapInPandas, zero shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
                    .astype(np.int64)
                half = v.shape[1] // 2
                d = np.abs(v[:, :half] - v[:, ::-1][:, :half])
                rows.append((r.image_id, int(d.size), int(d.sum()),
                             int(d.max())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SYMMETRY_SCHEMA.fields])
    return images.mapInPandas(gen, _SYMMETRY_SCHEMA)
