"""CRS reprojection as a pipeline stage (VERDICT r01 #7): lon/lat
inputs run through project_points/project_layer must yield the same
extraction results as pre-projected planar fixtures, and the forward/
inverse pair must round-trip to sub-mm."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.data import synth
from extract_sf_r_parallel_spark.geo import kernels as K
from extract_sf_r_parallel_spark.operators.areadist_fused import areadist_fused
from extract_sf_r_parallel_spark.operators.reproject import (
    project_layer,
    project_points,
    unproject_points,
)

from .conftest import GEOTAGGED_SCHEMA, LAYER_SCHEMA


@pytest.fixture(scope="module")
def lonlat_frames():
    """The planar fixtures expressed in lon/lat (inverse-projected), so
    the pipeline has to reproject them back before any geometry."""
    images = synth.geotag_images_pdf(synth.images_pdf(80))
    layers = synth.footprint_layers_pdf(150)
    ll_images = images.copy()
    lon, lat = K.tmerc_inverse(images["x"].to_numpy(), images["y"].to_numpy())
    ll_images["lon"], ll_images["lat"] = lon, lat
    ll_images = ll_images.drop(columns=["x", "y"])
    ll_layers = layers.copy()
    geoms = []
    for g in layers["geom"]:
        rings = []
        for ring in g:
            v = np.asarray(ring, np.float64).reshape(-1, 2)
            lo, la = K.tmerc_inverse(v[:, 0], v[:, 1])
            rings.append(np.column_stack([lo, la]).ravel().tolist())
        geoms.append(rings)
    ll_layers["geom"] = geoms
    return images, layers, ll_images, ll_layers


def test_projected_pipeline_matches_planar(spark, lonlat_frames):
    images, layers, ll_images, ll_layers = lonlat_frames
    pts = spark.createDataFrame(images, GEOTAGGED_SCHEMA)
    pls = spark.createDataFrame(layers, LAYER_SCHEMA)
    want = areadist_fused(pts, pls).toPandas() \
        .sort_values(["PKEY", "layer"]).reset_index(drop=True)

    # lon/lat variant: the reprojection stage is the first pipeline op,
    # exactly where the reference calls st_transform (C_…R:33)
    ll_pts = project_points(
        spark.createDataFrame(ll_images), "lon", "lat").drop("lon", "lat")
    ll_pls = project_layer(
        spark.createDataFrame(ll_layers[LAYER_SCHEMA.fieldNames()]))
    got = areadist_fused(ll_pts, ll_pls).toPandas() \
        .sort_values(["PKEY", "layer"]).reset_index(drop=True)

    assert len(got) == len(want)
    for c in ["NEAR_DIST", "AREA150", "PROP150", "MEANAGE_150",
              "AREA565", "PROP565", "MEANAGE_565"]:
        np.testing.assert_allclose(
            got[c].to_numpy(float), want[c].to_numpy(float),
            rtol=1e-6, atol=1e-4, equal_nan=True, err_msg=c)


def test_roundtrip_submm(spark, lonlat_frames):
    images, _, ll_images, _ = lonlat_frames
    df = project_points(spark.createDataFrame(ll_images), "lon", "lat")
    back = unproject_points(df, lon="lon2", lat="lat2")
    pdf = back.select("PKEY", "x", "y", "lon", "lat", "lon2", "lat2").toPandas()
    m = pdf.merge(images[["PKEY", "x", "y"]], on="PKEY", suffixes=("", "_ref"))
    # forward(inverse(planar)) recovers the original metres to <1 mm
    np.testing.assert_allclose(m["x"], m["x_ref"], atol=1e-3)
    np.testing.assert_allclose(m["y"], m["y_ref"], atol=1e-3)
    # degree-space round-trip of the engine UDF pair
    np.testing.assert_allclose(pdf["lon2"], pdf["lon"], atol=1e-9)
    np.testing.assert_allclose(pdf["lat2"], pdf["lat"], atol=1e-9)
