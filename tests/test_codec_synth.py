"""Codec + fixture-generator tests (FIXTURES.md §1-§3 invariants)."""

import numpy as np
import pytest

from extract_sf_r_parallel_spark.data import codec, synth
from extract_sf_r_parallel_spark.data.geotag import WINDOW, X_LO, Y_LO
from extract_sf_r_parallel_spark.geo import kernels as K


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    data = codec.png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codec.png_decode(data)
    assert (out == img).all()
    assert codec.psnr(img, out) == float("inf")  # ≥ 40 dB trivially


def test_raw_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert (codec.raw_decode(codec.raw_encode(img), 32, 32) == img).all()


def test_phash_deterministic_and_sensitive():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    h1 = codec.phash64(img)
    h2 = codec.phash64(img.copy())
    assert h1 == h2
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert codec.phash64(other) != h1
    # near-duplicate (tiny noise) → small hamming distance
    noisy = np.clip(img.astype(int) + rng.integers(-4, 5, img.shape), 0, 255).astype(np.uint8)
    ham = bin((h1 ^ codec.phash64(noisy)) & ((1 << 64) - 1)).count("1")
    assert ham <= 12


def test_images_pdf_schema_and_determinism():
    a = synth.images_pdf(30)
    b = synth.images_pdf(30)
    assert list(a.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert a["phash"].equals(b["phash"]) and a["caption"].equals(b["caption"])
    assert set(a["fmt"]) == {"png", "raw"}
    # decode invariant on every row
    for _, r in a.iterrows():
        img = codec.decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        assert img.shape == (r["h"], r["w"], 3)
        assert codec.phash64(img) == r["phash"]


def test_geotag_in_window():
    g = synth.geotag_images_pdf(synth.images_pdf(50))
    assert ((g["x"] >= X_LO) & (g["x"] < X_LO + WINDOW)).all()
    assert ((g["y"] >= Y_LO) & (g["y"] < Y_LO + WINDOW)).all()
    assert ((g["YEAR"] >= 1993) & (g["YEAR"] <= 2022)).all()
    assert (g["PKEY"] == g["image_id"]).all()


def test_footprint_layers_disjoint_and_flagged():
    pdf = synth.footprint_layers_pdf(200)
    assert set(pdf["layer"]) == set(synth.LAYERS)
    # validity flag matches the kernel's judgement
    for _, r in pdf.iterrows():
        ring = np.array(r["geom"][0]).reshape(-1, 2)
        assert K.ring_is_valid(ring) == r["is_valid_truth"]
    assert (~pdf["is_valid_truth"]).sum() >= 3
    assert (pdf["YEAR"] == 0).sum() >= 0.04 * len(pdf)
    # pairwise disjoint within a layer: slot construction ⇒ bboxes disjoint
    for layer in synth.LAYERS:
        sub = pdf[(pdf["layer"] == layer) & pdf["is_valid_truth"]]
        boxes = []
        for g in sub["geom"]:
            r = np.array(g[0]).reshape(-1, 2)
            boxes.append((r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()))
        boxes = np.array(boxes)
        n = len(boxes)
        i, j = np.triu_indices(n, k=1)
        ow = np.minimum(boxes[i, 2], boxes[j, 2]) - np.maximum(boxes[i, 0], boxes[j, 0])
        oh = np.minimum(boxes[i, 3], boxes[j, 3]) - np.maximum(boxes[i, 1], boxes[j, 1])
        assert not ((ow > 0) & (oh > 0)).any()


def test_wetland_classes():
    pdf = synth.wetland_pdf(100)
    assert set(pdf["CWCS_Class"]) == set(synth.WETLAND_CLASSES)


def test_overlap_layer_union_area():
    pdf = synth.overlap_layer_pdf()
    assert len(pdf) == 50
    rings = [np.array(g[0]).reshape(-1, 2) for g in pdf["geom"]]
    # each pair: sum of areas 1200, union 900 (closed form)
    a0 = abs(K.ring_area(rings[0])) + abs(K.ring_area(rings[1]))
    assert a0 == pytest.approx(1200.0)
