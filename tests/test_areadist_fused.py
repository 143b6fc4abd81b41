"""The fused broadcast path must match the generic join path — and the
serial oracle — row-for-row, for every variant (age, wetland,
no-temporal). Also asserts the fused plan is a single narrow stage
(no shuffle exchange)."""

import numpy as np
import pytest

from extract_sf_r_parallel_spark.data import synth
from extract_sf_r_parallel_spark.operators.areadist import areadist
from extract_sf_r_parallel_spark.operators.areadist_fused import areadist_fused
from extract_sf_r_parallel_spark.oracle import areadist_oracle

from .conftest import GEOTAGGED_SCHEMA, LAYER_SCHEMA, WETLAND_SCHEMA


@pytest.fixture(scope="module")
def frames():
    images = synth.geotag_images_pdf(synth.images_pdf(120))
    layers = synth.footprint_layers_pdf(250)
    return images, layers


def _cmp(got, want, cols):
    g = got.sort_values(["PKEY", "layer"]).reset_index(drop=True)
    w = want.sort_values(["PKEY", "layer"]).reset_index(drop=True)
    assert len(g) == len(w)
    for c in cols:
        np.testing.assert_allclose(
            g[c].to_numpy(float), w[c].to_numpy(float),
            rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=c)


METRICS = ["NEAR_DIST", "AREA150", "PROP150", "MEANAGE_150",
           "AREA565", "PROP565", "MEANAGE_565"]


def test_fused_matches_oracle_and_join_path(spark, frames):
    images, layers = frames
    pts = spark.createDataFrame(images, GEOTAGGED_SCHEMA)
    pls = spark.createDataFrame(layers, LAYER_SCHEMA)
    fused = areadist_fused(pts, pls).toPandas()
    want = areadist_oracle(images, layers)
    assert len(fused) == len(images) * 3
    _cmp(fused, want, METRICS)
    joinpath = areadist(pts, pls).toPandas()
    _cmp(fused, joinpath, METRICS)
    # caption passthrough (graft invariant)
    m = fused.merge(images[["PKEY", "caption"]], on="PKEY", suffixes=("", "_in"))
    assert (m["caption"] == m["caption_in"]).all()


def test_fused_wetland_variant(spark, frames):
    images, _ = frames
    wet = synth.wetland_pdf(150)
    pts = spark.createDataFrame(images, GEOTAGGED_SCHEMA)
    pls = spark.createDataFrame(wet, WETLAND_SCHEMA)
    fused = areadist_fused(pts, pls, temporal=False, age=False,
                           layer_col="CWCS_Class").toPandas()
    want = areadist_oracle(images, wet, temporal=False, age=False,
                           layer_col="CWCS_Class")
    _cmp(fused, want, ["NEAR_DIST", "AREA150", "PROP150", "AREA565", "PROP565"])


def test_fused_plan_single_stage(spark, frames):
    import contextlib
    import io
    images, layers = frames
    pts = spark.createDataFrame(images, GEOTAGGED_SCHEMA)
    pls = spark.createDataFrame(layers, LAYER_SCHEMA)
    df = areadist_fused(pts, pls)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan           # zero shuffles
    assert "Join" not in plan               # no materialized pair join
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_index_cache_hits_on_parquet_backed_layers(spark, frames, tmp_path):
    """Second fused build over the SAME parquet-backed layer plan must
    reuse the cached _FeatureIndex + broadcast (no rebuild, no second
    broadcast), must NOT collide across different files with one
    schema, and must never engage for in-memory relations."""
    from extract_sf_r_parallel_spark.operators import areadist_fused as AF
    images, layers = frames
    pts = spark.createDataFrame(images, GEOTAGGED_SCHEMA)

    AF.clear_index_cache()
    try:
        path_a = str(tmp_path / "layers_a.parquet")
        path_b = str(tmp_path / "layers_b.parquet")
        spark.createDataFrame(layers, LAYER_SCHEMA).write.parquet(path_a)
        spark.createDataFrame(
            layers.assign(YEAR=layers["YEAR"] + 1),
            LAYER_SCHEMA).write.parquet(path_b)

        pls_a = spark.read.parquet(path_a)
        first = AF.areadist_fused(pts, pls_a).toPandas()
        assert len(AF._IDX_CACHE) == 1
        (idx0, bc0) = next(iter(AF._IDX_CACHE.values()))

        # identical plan, fresh DataFrame object → cache hit
        second = AF.areadist_fused(pts, spark.read.parquet(path_a)).toPandas()
        assert len(AF._IDX_CACHE) == 1
        (idx1, bc1) = next(iter(AF._IDX_CACHE.values()))
        assert idx1 is idx0 and bc1 is bc0
        _cmp(second, first, METRICS)

        # same schema, DIFFERENT files → distinct entry, not a stale hit
        diff = AF.areadist_fused(pts, spark.read.parquet(path_b)).toPandas()
        assert len(AF._IDX_CACHE) == 2
        assert not np.allclose(
            diff.sort_values(["PKEY", "layer"])["MEANAGE_150"].to_numpy(float),
            first.sort_values(["PKEY", "layer"])["MEANAGE_150"].to_numpy(float),
            equal_nan=True)

        # different build params over the same plan → distinct entry
        AF.areadist_fused(pts, spark.read.parquet(path_a), maxdist=300.0,
                          radii=(150.0,)).toPandas()
        assert len(AF._IDX_CACHE) == 3

        # in-memory relations are uncacheable by design (plan string
        # carries no data identity)
        pls_mem = spark.createDataFrame(layers, LAYER_SCHEMA)
        assert AF._plan_key(pls_mem) is None
        AF.areadist_fused(pts, pls_mem).toPandas()
        assert len(AF._IDX_CACHE) == 3
    finally:
        AF.clear_index_cache()
    assert len(AF._IDX_CACHE) == 0 and len(AF._COUNT_CACHE) == 0
