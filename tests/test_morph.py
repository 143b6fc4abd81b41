"""Morphology: the shift-based erosion/dilation/opening must match the
per-pixel set definition, and opening must kill isolated salt noise
while preserving solid shapes."""

import numpy as np
import pandas as pd

from extract_sf_r_parallel_spark.data import codec, synth
from extract_sf_r_parallel_spark.operators.multimodal import (
    _dilate4, _erode4, morph_stats)

CROSS = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]


def set_erode(m):
    h, w = m.shape
    out = np.zeros_like(m)
    for yy in range(h):
        for xx in range(w):
            out[yy, xx] = all(
                0 <= yy + dy < h and 0 <= xx + dx < w and m[yy + dy, xx + dx]
                for dx, dy in CROSS)
    return out


def set_dilate(m):
    h, w = m.shape
    out = np.zeros_like(m)
    for yy in range(h):
        for xx in range(w):
            out[yy, xx] = any(
                0 <= yy + dy < h and 0 <= xx + dx < w and m[yy + dy, xx + dx]
                for dx, dy in CROSS)
    return out


def test_kernels_match_set_definition():
    rng = np.random.default_rng(5)
    for shape in ((1, 1), (2, 7), (3, 3), (11, 6)):
        m = rng.random(shape) < 0.45
        assert (_erode4(m) == set_erode(m)).all()
        assert (_dilate4(m) == set_dilate(m)).all()


def test_opening_kills_salt_keeps_solid():
    m = np.zeros((20, 20), dtype=bool)
    m[3:9, 3:9] = True          # solid 6×6 block
    m[15, 15] = True            # salt speckle
    op = _dilate4(_erode4(m))
    assert not op[15, 15]                      # speckle gone
    assert op[3:9, 3:9].sum() >= 6 * 6 - 4     # block survives (corners may
    assert op.sum() <= m.sum()                 # round under the cross)


def test_spark_morph_matches_local(spark):
    pdf = synth.images_pdf(12)
    got = morph_stats(spark.createDataFrame(pdf)).toPandas() \
        .set_index("image_id").sort_index()
    for r in pdf.itertuples():
        m = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)[..., 0] >= 192
        er = _erode4(m)
        assert got.loc[r.image_id, "n_fg"] == m.sum()
        assert got.loc[r.image_id, "n_eroded"] == er.sum()
        assert got.loc[r.image_id, "n_dilated"] == _dilate4(m).sum()
        assert got.loc[r.image_id, "n_opened"] == _dilate4(er).sum()
