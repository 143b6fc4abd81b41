"""Great-circle kernels: closed-form distances and cardinal bearings
(pure-Column implementations vs spherical trigonometry facts)."""

import math

from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.functions.geodesic import (
    EARTH_RADIUS_M, bearing_deg, haversine_m)


def _one(spark, lat1, lon1, lat2, lon2):
    df = spark.createDataFrame(
        [(float(lat1), float(lon1), float(lat2), float(lon2))],
        "lat1 double, lon1 double, lat2 double, lon2 double")
    r = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"),
                    F.col("lat2"), F.col("lon2")).alias("d"),
        bearing_deg(F.col("lat1"), F.col("lon1"),
                    F.col("lat2"), F.col("lon2")).alias("b")).first()
    return r.d, r.b


def test_equator_arc_and_meridian(spark):
    # 90° along the equator = quarter circumference
    d, b = _one(spark, 0, 0, 0, 90)
    assert abs(d - math.pi / 2 * EARTH_RADIUS_M) < 1e-3
    assert abs(b - 90.0) < 1e-9          # due East
    # pole to pole through the meridian = half circumference
    d, b = _one(spark, -90, 0, 90, 0)
    assert abs(d - math.pi * EARTH_RADIUS_M) < 1e-3
    assert abs(b - 0.0) < 1e-9           # due North


def test_cardinal_bearings_and_symmetry(spark):
    d_ns, b_ns = _one(spark, 10, 20, 20, 20)
    assert abs(b_ns - 0.0) < 1e-9
    d_sn, b_sn = _one(spark, 20, 20, 10, 20)
    assert abs(b_sn - 180.0) < 1e-9
    assert abs(d_ns - d_sn) < 1e-9       # distance is symmetric
    _, b_w = _one(spark, 0, 20, 0, 10)
    assert abs(b_w - 270.0) < 1e-9


def test_antipodal_clamp_no_nan(spark):
    d, _ = _one(spark, 48.1, 11.5, -48.1, -168.5)
    assert abs(d - math.pi * EARTH_RADIUS_M) < 1.0
    assert d == d                        # not NaN


def test_zero_distance(spark):
    d, _ = _one(spark, 37.0, -122.0, 37.0, -122.0)
    assert d == 0.0
