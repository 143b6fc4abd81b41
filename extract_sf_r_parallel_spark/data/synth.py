"""Deterministic fixture generators (FIXTURES.md) — seeded, no wall
clock, no network. Produce pandas DataFrames (Arrow-friendly) that
tests lift into Spark or write as Parquet.

The subject table follows BASELINE.json ``input_hint``:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). Polygon layers mirror the reference's
footprint shapefiles (ConventionalSeismic.shp.xml schema → feature_id,
layer, YEAR, geom) with controlled disjointness, YEAR=0 sentinels
(C_…R:150,231) and ~2% invalid rings (C_…R:317-318).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import codec
from .geotag import WINDOW, X_LO, Y_LO, geotag_xy, geotag_year, splitmix64

__all__ = [
    "images_pdf", "neardup_images_pdf", "geotag_images_pdf",
    "footprint_layers_pdf",
    "wetland_pdf", "overlap_layer_pdf", "videos_pdf",
    "sample_plane", "audio_pdf",
    "LAYERS", "WETLAND_CLASSES",
]

LAYERS = ("seismic", "wells", "harvest")
WETLAND_CLASSES = ("Bog", "Fen", "Marsh", "Open Water", "Swamp")


# Pixel generator: closed-form Lehmer hash over (image seed, flat
# index) with modulus 2^32−5 and L'Ecuyer's multiplier 279470273, an
# xorshift to break the affine structure, then mod 256. Closed-form
# (not an iterated stream) so the driver's DuckDB oracle re-derives
# every pixel with the same 64-bit integer arithmetic and checks
# mean_r/g/b exactly (plans/registry.py multimodal_stats oracle).
_PIX_P = 4294967291   # 2^32 − 5 (prime)
_PIX_A = 279470273    # Lehmer multiplier for that modulus (L'Ecuyer)
_PIX_M = 2654435761   # Knuth's 2^32/φ multiplicative-hash constant


def pixel_plane(base: int, n_vals: int) -> np.ndarray:
    """Flat uint8 pixel stream for one image (row-major h×w×3)."""
    idx = np.arange(n_vals, dtype=np.int64)
    h1 = (base + idx * _PIX_M) % _PIX_P
    h2 = (h1 * _PIX_A) % _PIX_P
    h3 = (h2 ^ (h2 >> 16))
    return (h3 % 256).astype(np.uint8)


def images_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """The image+caption subject table (FIXTURES.md §1)."""
    sizes = (32, 64, 96)
    rows = []
    for i in range(n):
        w = sizes[i % 3]
        h = sizes[(i // 3) % 3]
        img = pixel_plane(seed * 1_000_003 + i, h * w * 3).reshape(h, w, 3)
        fmt = "raw" if i % 17 == 0 else "png"
        rows.append({
            "image_id": f"img{i:08d}",
            "bytes": codec.encode_image(img, fmt),
            "w": np.int32(w),
            "h": np.int32(h),
            "fmt": fmt,
            "caption": f"A caption for image {i:08d} in tone {i % 7} about subject {i % 13}.",
            "phash": np.int64(codec.phash64(img)),
        })
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def neardup_images_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Image table with PLANTED near-duplicates for perceptual dedup:
    every i ≡ 1 (mod 4) re-renders image i−1's pixel plane with a
    sparse deterministic perturbation (+1 mod 256 on flat indices
    j ≡ 0 mod 701) — visually identical, byte-different after encode.
    Sizes follow the ORIGINAL index so a copy keeps its twin's shape.
    Bases offset by 900000 to stay disjoint from images_pdf/videos_pdf
    seeds; closed-form throughout so the driver's DuckDB oracle
    re-derives every (perturbed) pixel."""
    sizes = (32, 64, 96)
    rows = []
    for i in range(n):
        orig = i - 1 if i % 4 == 1 else i
        w = sizes[orig % 3]
        h = sizes[(orig // 3) % 3]
        flat = pixel_plane(seed * 1_000_003 + 900_000 + orig,
                           h * w * 3).astype(np.int64)
        if i % 4 == 1:
            j = np.arange(flat.size)
            flat = np.where(j % 701 == 0, (flat + 1) % 256, flat)
        img = flat.astype(np.uint8).reshape(h, w, 3)
        fmt = "raw" if i % 17 == 0 else "png"
        rows.append({
            "image_id": f"img{i:08d}",
            "bytes": codec.encode_image(img, fmt),
            "w": np.int32(w),
            "h": np.int32(h),
            "fmt": fmt,
            "caption": f"A caption for image {i:08d} in tone {i % 7} about subject {i % 13}.",
            "phash": np.int64(codec.phash64(img)),
        })
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def videos_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Synthetic video table in the same opaque-binary model as
    `images_pdf` (input_hint columns), fmt="cpnv" (codec.cpnv_encode:
    length-prefixed concatenated PNG frames). Deterministic and
    SQL-replayable: frame j of video i draws its pixels from
    pixel_plane(seed·1000003 + 500000 + i·64 + j) — the same Lehmer
    closed form the multimodal_stats oracle re-derives — with the
    500000 offset keeping video bases disjoint from every image base.
    n_frames = 3 + i % 5; w = 32; h = 32 or 48 by parity of i."""
    rows = []
    for i in range(n):
        w = 32
        h = 32 if i % 2 == 0 else 48
        n_frames = 3 + i % 5
        frames = [
            pixel_plane(seed * 1_000_003 + 500_000 + i * 64 + j,
                        h * w * 3).reshape(h, w, 3)
            for j in range(n_frames)
        ]
        rows.append({
            "image_id": f"vid{i:08d}",
            "bytes": codec.cpnv_encode(frames),
            "w": np.int32(w),
            "h": np.int32(h),
            "fmt": "cpnv",
            "caption": f"A clip {i:08d} with {n_frames} frames.",
            "phash": np.int64(codec.phash64(frames[0])),
        })
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def geotag_images_pdf(images: pd.DataFrame) -> pd.DataFrame:
    """Attach the engine geotag: x, y, YEAR, PKEY, SS (stands in for the
    reference's point table attrs PKEY/SS/YEAR, C_…R:89-91)."""
    out = images.copy()
    x, y = geotag_xy(out["image_id"].tolist())
    out["x"] = x
    out["y"] = y
    out["YEAR"] = geotag_year(out["phash"].to_numpy())
    out["PKEY"] = out["image_id"]
    out["SS"] = out["image_id"].str.slice(0, 6)
    return out


# ---------------------------------------------------------------------------
# polygon layers
# ---------------------------------------------------------------------------

_SLOT = 50.0          # metres; one feature per slot → pairwise disjoint
_NSLOT = int(WINDOW / _SLOT)  # 400 per axis
_HOT_FRAC = 0.05      # 5% of slots hold 80% of features (skew, FIXTURES §2)


def _slot_origin(slot_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sx = (slot_ids % _NSLOT) * _SLOT
    sy = (slot_ids // _NSLOT) * _SLOT
    return X_LO + sx, Y_LO + sy


def _assign_slots(n: int, rng: np.random.Generator) -> np.ndarray:
    total = _NSLOT * _NSLOT
    hot = int(total * _HOT_FRAC)
    n_hot = min(int(n * 0.8), hot)
    hot_slots = rng.permutation(hot)[:n_hot]
    cold_slots = hot + rng.permutation(total - hot)[: n - n_hot]
    return np.concatenate([hot_slots, cold_slots])


def _shape_ring(layer: str, ox: float, oy: float, u: np.ndarray) -> np.ndarray:
    """A small shape inscribed in the 50 m slot (inset ≥ 5 m)."""
    cx, cy = ox + 25.0, oy + 25.0
    if layer == "seismic":      # thin rectangle ≈ buffered seismic line
        hw, hh = 1.0 + 2.0 * u[0], 15.0 + 4.0 * u[1]
        if u[2] > 0.5:
            hw, hh = hh, hw
        ring = [[cx - hw, cy - hh], [cx + hw, cy - hh], [cx + hw, cy + hh],
                [cx - hw, cy + hh], [cx - hw, cy - hh]]
    elif layer == "wells":      # small square pad
        s = 4.0 + 8.0 * u[0]
        ring = [[cx - s, cy - s], [cx + s, cy - s], [cx + s, cy + s],
                [cx - s, cy + s], [cx - s, cy - s]]
    else:                       # harvest: simple star polygon (5-8 vertices)
        k = 5 + int(u[0] * 4)
        # evenly spaced angles with bounded jitter → consecutive angular
        # gaps < π → guaranteed simple (star-shaped) ring
        ang = (np.arange(k) + 0.8 * u[1:1 + k]) * (2 * np.pi / k)
        rad = 8.0 + 12.0 * u[1 + k:1 + 2 * k]
        pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        ring = np.vstack([pts, pts[:1]]).tolist()
    return np.asarray(ring, dtype=np.float64)


def _invalidate(ring: np.ndarray, mode: int) -> np.ndarray:
    if mode == 0:  # bowtie: swap two adjacent vertices → self-intersection
        r = ring.copy()
        r[[1, 2]] = r[[2, 1]]
        return r
    return ring[:-1]  # unclosed


def footprint_layers_pdf(n_per_layer: int, seed: int = 42) -> pd.DataFrame:
    """All footprint layers in ONE table keyed by the `layer` column —
    the engine never physically splits layers (SURVEY.md P4 note)."""
    frames = []
    for li, layer in enumerate(LAYERS):
        rng = np.random.default_rng(seed * 7919 + li)
        slots = _assign_slots(n_per_layer, rng)
        ox, oy = _slot_origin(slots)
        u = rng.random((n_per_layer, 24))
        years = np.where(
            rng.random(n_per_layer) < 0.06, 0,
            1960 + (rng.random(n_per_layer) * 59).astype(int),
        ).astype(np.int32)
        invalid = rng.random(n_per_layer) < 0.02
        rows = []
        for i in range(n_per_layer):
            ring = _shape_ring(layer, ox[i], oy[i], u[i])
            ok = True
            if invalid[i]:
                ring = _invalidate(ring, i % 2)
                ok = False
            rows.append({
                "feature_id": np.int64(li * 10_000_000 + i),
                "layer": layer,
                "YEAR": years[i],
                "geom": [ring.ravel().tolist()],
                "is_valid_truth": ok,
            })
        frames.append(pd.DataFrame(rows))
    pdf = pd.concat(frames, ignore_index=True)
    pdf["feature_id"] = pdf["feature_id"].astype("int64")
    pdf["YEAR"] = pdf["YEAR"].astype("int32")
    return pdf


def wetland_pdf(n: int, seed: int = 43) -> pd.DataFrame:
    """Wetland layer: same geometry model + CWCS_Class partition column
    (AESRD_CWCSmergedwetlandinven2018layer.shp.xml; D_…R:107-114), no
    temporal filter applies (D_…R:28-30)."""
    rng = np.random.default_rng(seed)
    slots = _assign_slots(n, rng)
    ox, oy = _slot_origin(slots)
    u = rng.random((n, 24))
    classes = [WETLAND_CLASSES[int(c)] for c in rng.integers(0, 5, n)]
    rows = []
    for i in range(n):
        ring = _shape_ring("harvest", ox[i], oy[i], u[i])
        rows.append({
            "feature_id": np.int64(90_000_000 + i),
            "layer": "wetland",
            "CWCS_Class": classes[i],
            "YEAR": np.int32(0),
            "geom": [ring.ravel().tolist()],
            "is_valid_truth": True,
        })
    pdf = pd.DataFrame(rows)
    pdf["feature_id"] = pdf["feature_id"].astype("int64")
    pdf["YEAR"] = pdf["YEAR"].astype("int32")
    return pdf


def overlap_layer_pdf() -> pd.DataFrame:
    """50 rectangles in 25 known-overlap pairs: A=[0,30]×[0,20] and B
    shifted +15 in x → union area 2·600 − 300 = 900 per pair. Exercises
    the dissolve path (C_…R:99,154) with a closed-form answer."""
    rows = []
    for p in range(25):
        ox = X_LO + 200.0 + (p % 5) * 2000.0
        oy = Y_LO + 200.0 + (p // 5) * 2000.0
        a = np.array([[ox, oy], [ox + 30, oy], [ox + 30, oy + 20],
                      [ox, oy + 20], [ox, oy]])
        b = a + np.array([15.0, 0.0])
        for j, ring in enumerate((a, b)):
            rows.append({
                "feature_id": np.int64(80_000_000 + p * 2 + j),
                "layer": "overlap",
                "YEAR": np.int32(2000),
                "geom": [ring.ravel().tolist()],
                "is_valid_truth": True,
            })
    pdf = pd.DataFrame(rows)
    pdf["feature_id"] = pdf["feature_id"].astype("int64")
    pdf["YEAR"] = pdf["YEAR"].astype("int32")
    return pdf


def sample_plane(base: int, n_vals: int) -> np.ndarray:
    """Flat int16 PCM sample stream for one audio clip — the SAME
    Lehmer closed form as pixel_plane, reduced mod 2^16 and re-centred
    to signed (s = h % 65536 − 32768), so the driver's DuckDB oracle
    re-derives every sample with plain 64-bit integer arithmetic."""
    idx = np.arange(n_vals, dtype=np.int64)
    h1 = (base + idx * _PIX_M) % _PIX_P
    h2 = (h1 * _PIX_A) % _PIX_P
    h3 = (h2 ^ (h2 >> 16))
    return (h3 % 65536 - 32768).astype(np.int16)


def audio_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Synthetic audio table in the same opaque-binary model as
    `images_pdf` / `videos_pdf` (input_hint shape, audio flavour):
    (clip_id:string, bytes:binary, sr:int32, n_samples:int32,
    fmt:string). fmt is "s16le" (raw 16-bit little-endian mono PCM —
    the honestly-decodable path) except every 17th clip, which is
    tagged "opus" and wraps the same PCM: compressed audio codecs are
    NOT implementable from scratch offline, so codec.decode_audio
    raises NotImplementedError for them (mirroring the inter-frame
    video stub) and queries filter to the decodable fmt. Clip i draws
    samples from sample_plane(seed·1000003 + 900000 + i) — the 900000
    offset keeps audio bases disjoint from image (i) and video
    (500000+) bases. n_samples = 2048/4096/8192 by i % 3; sr mirrors
    8000/16000/22050."""
    rows = []
    for i in range(n):
        ns = (2048, 4096, 8192)[i % 3]
        pcm = sample_plane(seed * 1_000_003 + 900_000 + i, ns)
        rows.append({
            "clip_id": f"clip{i:08d}",
            "bytes": pcm.astype("<i2").tobytes(),
            "sr": np.int32((8000, 16000, 22050)[i % 3]),
            "n_samples": np.int32(ns),
            "fmt": "opus" if i % 17 == 0 else "s16le",
        })
    pdf = pd.DataFrame(rows)
    pdf["sr"] = pdf["sr"].astype("int32")
    pdf["n_samples"] = pdf["n_samples"].astype("int32")
    return pdf
