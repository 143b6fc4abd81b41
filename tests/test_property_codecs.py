"""Hypothesis property tests for the from-scratch codecs: lossless
round-trip identity (PNG), the CJPG PSNR ≥ 40 dB bound on arbitrary
images and dimensions, and CPNV container selection semantics."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_sf_r_parallel_spark.data import codec

dims = st.integers(min_value=1, max_value=41)


def _img(w, h, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31))
def test_png_roundtrip_identity(w, h, seed):
    img = _img(w, h, seed)
    assert (codec.png_decode(codec.png_encode(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31),
       step=st.integers(min_value=1, max_value=6))
def test_cjpg_psnr_bound_any_dims(w, h, seed, step):
    """PSNR ≥ 10·log10(255²·12/step²) for ANY input: the orthonormal
    DCT maps quantization MSE to pixel MSE; clipping and rint only
    shrink the error. step ≤ 6 keeps the bound ≥ 40 dB."""
    img = _img(w, h, seed)
    back = codec.cjpg_decode(codec.cjpg_encode(img, step))
    assert back.shape == img.shape
    bound = 10 * np.log10(255.0**2 * 12 / step**2)
    assert codec.psnr(img, back) >= min(bound, 40.0) - 1e-9


@settings(max_examples=25, deadline=None)
@given(n=st.integers(min_value=0, max_value=9),
       every=st.integers(min_value=1, max_value=4),
       seed=st.integers(0, 2**31))
def test_cpnv_selection_semantics(n, every, seed):
    frames = [_img(9, 7, seed + j) for j in range(n)]
    data = codec.cpnv_encode(frames)
    assert codec.cpnv_frame_count(data) == n
    picks = list(codec.cpnv_iter_frames(data, every))
    assert [i for i, _ in picks] == list(range(0, n, every))
    for i, png in picks:
        assert (codec.png_decode(png) == frames[i]).all()
