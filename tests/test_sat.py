"""Integral image: SAT-derived window sums must equal direct slice
sums at every offset, and out-of-range windows fail loudly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.data import codec, synth
from extract_sf_r_parallel_spark.operators.multimodal import sat_stats


def test_sat_matches_direct_slices(spark):
    pdf = synth.images_pdf(12)
    df = (spark.createDataFrame(pdf)
          .withColumn("i", F.expr("CAST(substring(image_id, 4, 8) "
                                  "AS BIGINT)"))
          .withColumn("ox", (F.col("i") * 11 % (F.col("w") - 16)))
          .withColumn("oy", (F.col("i") * 3 % (F.col("h") - 16))))
    got = sat_stats(df, "ox", "oy").toPandas().set_index("image_id")
    for idx, r in enumerate(pdf.itertuples()):
        v = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)[..., 0] \
            .astype(np.int64)
        ox, oy = idx * 11 % (r.w - 16), idx * 3 % (r.h - 16)
        assert got.loc[r.image_id, "total"] == v.sum()
        assert got.loc[r.image_id, "mid_sat"] == \
            v[:r.h // 2 + 1, :r.w // 2 + 1].sum()
        assert got.loc[r.image_id, "win_sum"] == \
            v[oy:oy + 16, ox:ox + 16].sum()


def test_sat_zero_offset_window(spark):
    # x0 = y0 = 0 exercises the s(-1, ·) = 0 guard corners
    pdf = synth.images_pdf(3)
    df = spark.createDataFrame(pdf) \
        .withColumn("ox", F.lit(0)).withColumn("oy", F.lit(0))
    got = sat_stats(df, "ox", "oy").toPandas().set_index("image_id")
    for r in pdf.itertuples():
        v = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)[..., 0] \
            .astype(np.int64)
        assert got.loc[r.image_id, "win_sum"] == v[:16, :16].sum()


def test_sat_out_of_bounds_raises(spark):
    pdf = synth.images_pdf(1)
    df = spark.createDataFrame(pdf) \
        .withColumn("ox", F.col("w") - 8).withColumn("oy", F.lit(0))
    with pytest.raises(Exception, match="outside"):
        sat_stats(df, "ox", "oy").collect()
