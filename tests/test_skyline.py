"""Skyline: the two-phase distributed plan must equal the quadratic
dominance definition on adversarial inputs — duplicates of skyline
points kept, anticorrelated data (large skylines), many partitions."""

import numpy as np
import pandas as pd

from extract_sf_r_parallel_spark.operators.skyline import (
    skyline_min2, skyline_pandas)


def brute_skyline(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    xs, ys = pdf[x].to_numpy(), pdf[y].to_numpy()
    keep = []
    for i in range(len(pdf)):
        dom = ((xs <= xs[i]) & (ys <= ys[i])
               & ((xs < xs[i]) | (ys < ys[i])))
        keep.append(not dom.any())
    return pdf[np.array(keep)]


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    w = want[got.columns].sort_values(list(got.columns)) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def _random(n, rng, anticorrelated=False):
    x = rng.integers(0, 60, n).astype(float)
    if anticorrelated:
        y = 100.0 - x + rng.integers(0, 5, n)
    else:
        y = rng.integers(0, 60, n).astype(float)
    return pd.DataFrame({"id": np.arange(n), "x": x, "y": y})


def test_pandas_kernel_matches_brute_force():
    rng = np.random.default_rng(7)
    for anti in (False, True):
        for n in (1, 2, 17, 400):
            pdf = _random(n, rng, anti)
            _cmp(skyline_pandas(pdf, "x", "y"), brute_skyline(pdf, "x", "y"))


def test_duplicates_of_skyline_points_all_kept():
    pdf = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                        "x": [0.0, 0.0, 1.0, 1.0, 2.0],
                        "y": [5.0, 5.0, 3.0, 3.0, 9.0]})
    out = skyline_pandas(pdf, "x", "y")
    assert sorted(out.id) == [1, 2, 3, 4]  # both duplicate pairs kept


def test_distributed_matches_brute_force_across_partitions(spark):
    rng = np.random.default_rng(11)
    for anti in (False, True):
        pdf = _random(3000, rng, anti)
        df = spark.createDataFrame(pdf).repartition(13)
        got = skyline_min2(df, "x", "y").toPandas()
        _cmp(got, brute_skyline(pdf, "x", "y"))


def test_all_identical_rows_survive(spark):
    pdf = pd.DataFrame({"id": range(20), "x": [3.0] * 20, "y": [4.0] * 20})
    got = skyline_min2(spark.createDataFrame(pdf).repartition(5),
                       "x", "y").toPandas()
    assert len(got) == 20
