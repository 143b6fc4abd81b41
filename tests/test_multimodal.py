"""Multimodal pipeline: decode invariants (input_hint: PSNR ≥ 40 dB —
∞ for our lossless codecs — caption equality, phash stability),
resize, deterministic pixel embeddings feeding similarity, and the
clearly-marked video stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.data import codec, synth
from extract_sf_r_parallel_spark.operators import multimodal as M
from extract_sf_r_parallel_spark.operators.similarity import brute_force_topk

from .conftest import IMAGES_SCHEMA


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(synth.images_pdf(60), IMAGES_SCHEMA)


def test_decode_stats_phash_invariant(spark, images):
    out = M.decode_stats(images).toPandas()
    assert len(out) == 60
    assert out["phash_ok"].all()  # lossless round-trip: phash identical
    assert ((out[["mean_r", "mean_g", "mean_b"]] > 100)
            & (out[["mean_r", "mean_g", "mean_b"]] < 155)).all().all()


def test_resize_images(spark, images):
    out = M.resize_images(images, 16, 16).toPandas()
    for r in out.itertuples():
        img = codec.png_decode(bytes(r.bytes))
        assert img.shape == (16, 16, 3)


def test_pixel_embed_feeds_similarity(spark, images):
    emb = M.pixel_embed(images)
    pdf = emb.toPandas()
    assert all(len(v) == 64 for v in pdf.embedding)
    norms = [np.linalg.norm(np.asarray(v, np.float64)) for v in pdf.embedding]
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    nn = brute_force_topk(emb, emb, k=1, id_q="image_id", id_c="image_id").toPandas()
    assert len(nn) == 60


def test_frame_sample_stub_and_passthrough(spark, images):
    ok = M.frame_sample(images).toPandas()
    assert len(ok) == 60 and (ok["frame_idx"] == 0).all()
    vid = images.withColumn("fmt", F.lit("mp4"))
    with pytest.raises(Exception, match="NotImplementedError|video codec"):
        M.frame_sample(vid).collect()
