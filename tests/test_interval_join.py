"""Interval-overlap join: exactly-once emission across bucket
boundaries (the 1-D owner-bucket trick) and parity with a brute-force
overlap sweep, including long intervals spanning many buckets."""

import numpy as np
import pandas as pd

from extract_sf_r_parallel_spark.operators.intervals import interval_join


def test_interval_join_exactly_once_vs_brute_force(spark):
    rng = np.random.default_rng(13)
    # numeric intervals; lengths up to 40 buckets at width 1s → pairs
    # share MANY buckets, so duplicate emission would be caught
    ls = rng.integers(0, 1000, 80)
    l = pd.DataFrame({"k": rng.integers(0, 3, 80), "lid": range(80),
                      "a": ls.astype(float),
                      "b": (ls + rng.integers(0, 40, 80)).astype(float)})
    rs = rng.integers(0, 1000, 90)
    r = pd.DataFrame({"k": rng.integers(0, 3, 90), "rid": range(90),
                      "c": rs.astype(float),
                      "d": (rs + rng.integers(0, 25, 90)).astype(float)})
    got = interval_join(spark.createDataFrame(l), spark.createDataFrame(r),
                        "a", "b", "c", "d", key="k",
                        bucket_width_seconds=1).toPandas()
    pairs = list(zip(got["lid_l"], got["rid_r"]))
    assert len(pairs) == len(set(pairs)), "duplicate pair emission"
    want = set()
    for lr in l.itertuples():
        for rr in r.itertuples():
            if lr.k == rr.k and lr.a <= rr.d and rr.c <= lr.b:
                want.add((lr.lid, rr.rid))
    assert set(pairs) == want and len(want) > 50


def test_interval_join_no_key_and_wide_buckets(spark):
    l = pd.DataFrame({"lid": [0, 1], "a": [0.0, 100.0], "b": [50.0, 110.0]})
    r = pd.DataFrame({"rid": [0, 1, 2], "c": [49.0, 60.0, 105.0],
                      "d": [55.0, 70.0, 400.0]})
    got = interval_join(spark.createDataFrame(l), spark.createDataFrame(r),
                        "a", "b", "c", "d", key=None,
                        bucket_width_seconds=1000).toPandas()
    assert set(zip(got["lid_l"], got["rid_r"])) == {(0, 0), (1, 2)}


def test_interval_join_bucket_cap_guard(spark):
    """VERDICT r04 #5: a pathologically long interval must fail loudly
    at the cap, not silently explode to thousands of rows."""
    import pytest
    l = pd.DataFrame({"lid": [0], "a": [0.0], "b": [10.0]})
    r = pd.DataFrame({"rid": [0], "c": [0.0], "d": [9999.0]})  # 10k buckets
    with pytest.raises(Exception, match="coarsen bucket_width_seconds"):
        interval_join(spark.createDataFrame(l), spark.createDataFrame(r),
                      "a", "b", "c", "d", bucket_width_seconds=1,
                      max_buckets_per_row=100).toPandas()
    # raising the cap (or coarsening) makes the same join succeed
    ok = interval_join(spark.createDataFrame(l), spark.createDataFrame(r),
                       "a", "b", "c", "d", bucket_width_seconds=1000) \
        .toPandas()
    assert len(ok) == 1


def test_interval_join_shared_name_different_dtype(spark):
    """ADVICE r04: a bound column's dtype must resolve against its OWN
    side. Pre-fix, dict(left.dtypes + right.dtypes) let a same-named
    numeric payload column on the RIGHT shadow the left's timestamp
    bound, sending it down the numeric branch (timestamp * 1e6 -> 
    analysis error)."""
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    l = pd.DataFrame({"lid": [0, 1],
                      "s": [t0, t0 + pd.Timedelta(hours=2)],
                      "e": [t0 + pd.Timedelta(hours=1),
                            t0 + pd.Timedelta(hours=3)]})
    # right carries a NUMERIC payload column also named "s"
    r = pd.DataFrame({"rid": [0], "s": [123.0],
                      "c": [t0 + pd.Timedelta(minutes=30)],
                      "d": [t0 + pd.Timedelta(minutes=90)]})
    got = interval_join(spark.createDataFrame(l), spark.createDataFrame(r),
                        "s", "e", "c", "d").toPandas()
    assert sorted(zip(got["lid_l"], got["rid_r"])) == [(0, 0)]
    assert got["s_r"].tolist() == [123.0]  # payload rides along
