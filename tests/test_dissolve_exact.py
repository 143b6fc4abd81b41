"""Exact dissolved-union area (VERDICT r01 #8): overlap detection is
automatic (dissolve left at its default), results are exact — not
supersampled — and layers whose union is not S-H-computable fall back
to the raster path (join) or fail loudly (fused)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from extract_sf_r_parallel_spark.data import synth
from extract_sf_r_parallel_spark.geo import kernels as K
from extract_sf_r_parallel_spark.operators.areadist import areadist
from extract_sf_r_parallel_spark.operators.areadist_fused import areadist_fused
from extract_sf_r_parallel_spark.oracle import areadist_oracle

from .conftest import LAYER_SCHEMA

PTS_SCHEMA = T.StructType([
    T.StructField("PKEY", T.StringType()),
    T.StructField("SS", T.StringType()),
    T.StructField("YEAR", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
])


@pytest.fixture(scope="module")
def overlap_frames():
    over = synth.overlap_layer_pdf()
    # one point at each pair's union centre: r=150 covers the whole
    # 45×20 union → AREA150 must be exactly 900 (2·600 − 300)
    rows = []
    for p in range(25):
        ox = synth.X_LO + 200.0 + (p % 5) * 2000.0
        oy = synth.Y_LO + 200.0 + (p // 5) * 2000.0
        rows.append((str(p), str(p % 7), 2010, ox + 22.5, oy + 10.0))
    pts = pd.DataFrame(rows, columns=["PKEY", "SS", "YEAR", "x", "y"])
    return pts, over


def test_auto_dissolve_exact_default(spark, overlap_frames):
    """No caller hint: the default detects the overlaps and produces
    the closed-form union area at 1e-8 (raster gets ~1 m²)."""
    pts_pd, over = overlap_frames
    pts = spark.createDataFrame(pts_pd, PTS_SCHEMA)
    pls = spark.createDataFrame(over, LAYER_SCHEMA)
    for got in (
        areadist_fused(pts, pls, temporal=False, age=False).toPandas(),
        areadist(pts, pls, temporal=False, age=False,
                 broadcast_polys=True).toPandas(),
    ):
        g = got.sort_values("PKEY").reset_index(drop=True)
        np.testing.assert_allclose(g["AREA150"], 900.0, atol=1e-8)
        np.testing.assert_allclose(g["AREA565"], 900.0, atol=1e-8)
    # serial oracle agrees through its own union path
    want = areadist_oracle(pts_pd, over, temporal=False, age=False)
    np.testing.assert_allclose(want["AREA150"], 900.0, atol=1e-8)


def test_auto_dissolve_partial_circle(spark, overlap_frames):
    """Circle smaller than the union: exact circle∩union, checked
    against the independent raster estimate."""
    pts_pd, over = overlap_frames
    pts_pd = pts_pd.copy()
    pts_pd["x"] += 10.0  # off-centre so the clip is asymmetric
    pts = spark.createDataFrame(pts_pd, PTS_SCHEMA)
    pls = spark.createDataFrame(over, LAYER_SCHEMA)
    got = areadist_fused(pts, pls, temporal=False, age=False,
                         radii=(18.0,)).toPandas().sort_values("PKEY")
    rings = [np.asarray(g[0], np.float64).reshape(-1, 2) for g in over["geom"]]
    for _, r in got.iterrows():
        px, py = pts_pd.loc[pts_pd.PKEY == r.PKEY, ["x", "y"]].iloc[0]
        near = [rg for rg in rings
                if np.abs(rg[:, 0] - px).min() < 2000]
        want = K.union_circle_area(px, py, 18.0, near,
                                   np.zeros(len(near), np.int64))
        assert r["AREA18"] == pytest.approx(want, abs=1e-8)
        assert r["AREA18"] < np.pi * 18 * 18  # genuinely clipped


@pytest.fixture(scope="module")
def star_overlap():
    """Two overlapping non-convex stars: the exact union needs a
    non-convex clip → DissolveFallback."""
    ang = np.arange(10) * 2 * np.pi / 10
    rad = np.where(np.arange(10) % 2 == 0, 30.0, 12.0)
    cx, cy = synth.X_LO + 500.0, synth.Y_LO + 500.0
    s1 = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1)
    s1 = np.vstack([s1, s1[:1]])
    s2 = s1 + [10.0, 0.0]
    rows = [{"feature_id": i, "layer": "stars", "YEAR": 2000,
             "geom": [s.ravel().tolist()], "is_valid_truth": True}
            for i, s in enumerate((s1, s2))]
    return cx, cy, [s1, s2], pd.DataFrame(rows)


def test_star_overlap_falls_back(spark, star_overlap):
    cx, cy, rings, layer = star_overlap
    pts = spark.createDataFrame(
        pd.DataFrame([("0", "0", 2010, cx + 5.0, cy)],
                     columns=["PKEY", "SS", "YEAR", "x", "y"]), PTS_SCHEMA)
    pls = spark.createDataFrame(layer, LAYER_SCHEMA)
    # fused: loud failure pointing at the raster path
    with pytest.raises(Exception, match="raster"):
        areadist_fused(pts, pls, temporal=False, age=False)
    # join path: automatic per-layer raster fallback
    got = areadist(pts, pls, temporal=False, age=False,
                   broadcast_polys=True).toPandas()
    from extract_sf_r_parallel_spark.operators.areadist import _union_area_raster
    want = _union_area_raster(cx + 5.0, cy, 150.0, rings)
    assert got["AREA150"].iloc[0] == pytest.approx(want, rel=0.02)
    # and the union is strictly less than the double-counted sum
    s = sum(K.circle_polygon_area(cx + 5.0, cy, 150.0, r) for r in rings)
    assert got["AREA150"].iloc[0] < s
