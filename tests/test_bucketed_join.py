"""Bucketing evidence (SURVEY §4 / 100 TB story): two tables bucketed
on the hex cell id join WITHOUT any exchange — the co-located join a
production deployment would use for repeated joins against a static
footprint layer (bucket once at ingest, every later join skips both
shuffles)."""

import re

from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.geo import index as I
from extract_sf_r_parallel_spark.operators.range_join import (
    explode_poly_cells,
    with_cell,
)
from extract_sf_r_parallel_spark.plans import spatial_queries as SQ

SF = "/root/testdata/sf0.001"


def test_bucketed_cell_join_has_no_exchange(spark, tmp_path):
    code = I.code_for_radius(250.0)
    pts = with_cell(SQ.points_df(spark, SF), code)
    polys = explode_poly_cells(SQ.rects_df(spark, SF), 1000.0, code) \
        .select("fid", "cell")
    spark.sql("DROP TABLE IF EXISTS bk_pts")
    spark.sql("DROP TABLE IF EXISTS bk_polys")
    pts.write.bucketBy(8, "cell").sortBy("cell").mode("overwrite") \
        .saveAsTable("bk_pts")
    polys.write.bucketBy(8, "cell").sortBy("cell").mode("overwrite") \
        .saveAsTable("bk_polys")
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bk_pts").join(spark.table("bk_polys"), "cell")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # bucketed scan on both sides → zero shuffle exchanges
            assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, \
                plan[:2000]
            # and the join result is identical to the shuffled one
            n_bucketed = j.count()
            n_plain = pts.join(polys, "cell").count()
            assert n_bucketed == n_plain > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_pts")
        spark.sql("DROP TABLE IF EXISTS bk_polys")
