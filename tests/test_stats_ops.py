"""Grouped OLS + IQR outlier screen: closed forms vs NumPy."""

import numpy as np

from extract_sf_r_parallel_spark.plans.relational import q_iqr_outliers
from extract_sf_r_parallel_spark.plans.spatial_queries import q_group_ols

SF = "/root/testdata/sf0.001"


def test_group_ols_matches_numpy(spark):
    got = q_group_ols(spark, SF).toPandas().set_index("pyear").sort_index()
    from extract_sf_r_parallel_spark.plans.spatial_queries import points_df
    pts = points_df(spark, SF).toPandas()
    for year, grp in pts.groupby("pyear"):
        if len(grp) < 2 or grp.x.nunique() == 1:
            continue
        slope, intercept = np.polyfit(grp.x, grp.y, 1)
        assert abs(got.loc[year, "slope"] - slope) < 1e-9
        assert abs(got.loc[year, "intercept"] - intercept) < 1e-6
        assert got.loc[year, "n"] == len(grp)


def test_ols_exact_line(spark):
    # y = 3x + 7 exactly → slope/intercept recovered exactly
    rows = [(1997, float(x), float(3 * x + 7)) for x in range(50)]
    df = spark.createDataFrame(rows, "pyear int, x double, y double")
    from pyspark.sql import functions as F
    g = df.groupBy("pyear").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    r = g.select(
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
        .alias("slope")).first()
    assert r.slope == 3.0


def test_iqr_outlier_counts_match_numpy(spark):
    got = q_iqr_outliers(spark, SF).toPandas().set_index("l_returnflag")
    import pandas as pd
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        q1 = np.quantile(grp.l_quantity, 0.25)  # type-7, same as Spark
        q3 = np.quantile(grp.l_quantity, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = int(((grp.l_quantity < lo) | (grp.l_quantity > hi)).sum())
        assert got.loc[flag, "q1"] == q1 and got.loc[flag, "q3"] == q3
        assert got.loc[flag, "n_outliers"] == n_out
