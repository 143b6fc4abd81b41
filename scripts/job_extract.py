"""Cluster job entrypoint for spark-submit (north rule packaging):
geotag an image table, run the areadist extraction against polygon
layers with bucket lineage, write partitioned output.

    spark-submit --py-files dist/extract_sf_r_parallel_spark.zip \
        scripts/job_extract.py --points <parquet|icelite> \
        --layers <parquet> --out <dir> [--resume] [--buckets 64]

Local smoke: python scripts/job_extract.py --demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from extract_sf_r_parallel_spark.data import geotag, synth  # noqa: E402
from extract_sf_r_parallel_spark.session import get_spark  # noqa: E402
from extract_sf_r_parallel_spark.sources.lineage import extract_with_resume  # noqa: E402


def geotag_images(images_df):
    """images (input_hint schema) → points: engine geotag as a pandas UDF."""
    @F.pandas_udf(T.StructType([
        T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType()),
    ]))
    def _xy(ids: pd.Series) -> pd.DataFrame:
        x, y = geotag.geotag_xy(ids.tolist())
        return pd.DataFrame({"x": x, "y": y})

    df = images_df.withColumn("_xy", _xy(F.col("image_id")))
    return (
        df.select("*", "_xy.*").drop("_xy")
        .withColumn("YEAR", (F.lit(1993) + F.pmod(F.abs(F.col("phash")), F.lit(30))).cast("int"))
        .withColumn("PKEY", F.col("image_id"))
        .withColumn("SS", F.substring("image_id", 1, 6))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points")
    ap.add_argument("--layers")
    ap.add_argument("--out", default="/tmp/extract_out")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--demo", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app="job_extract")
    spark.sparkContext.setLogLevel("WARN")

    if args.demo:
        from tests.conftest import GEOTAGGED_SCHEMA, LAYER_SCHEMA
        pts = spark.createDataFrame(
            synth.geotag_images_pdf(synth.images_pdf(100)), GEOTAGGED_SCHEMA)
        layers = spark.createDataFrame(synth.footprint_layers_pdf(200), LAYER_SCHEMA)
        args.buckets = 4
    else:
        pts = geotag_images(spark.read.parquet(args.points))
        layers = spark.read.parquet(args.layers)

    res = extract_with_resume(
        spark, pts.select("PKEY", "SS", "YEAR", "x", "y"), layers,
        args.out, n_buckets=args.buckets)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
