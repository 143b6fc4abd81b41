"""k-bounded city-block distance transform: the min-plus relaxation
plan must match a brute-force capped-L1 sweep — exact within the cap
(round r settles every cell at distance ≤ r), features report 0,
cells beyond the horizon report the sentinel rounds+1."""

import numpy as np
import pandas as pd

from extract_sf_r_parallel_spark.operators.focal import dist_transform


def brute_dt(feat: np.ndarray, rounds: int) -> np.ndarray:
    """Capped L1 distance to the nearest True cell (cap = rounds+1)."""
    H, W = feat.shape
    cap = rounds + 1
    out = np.full((H, W), cap, dtype=np.int64)
    fy, fx = np.nonzero(feat)
    for yy in range(H):
        for xx in range(W):
            if len(fx):
                d = int(np.min(np.abs(fx - xx) + np.abs(fy - yy)))
                out[yy, xx] = min(d, cap)
    return out


def test_dist_transform_matches_brute(spark):
    rng = np.random.default_rng(11)
    v = rng.integers(0, 1000, (16, 16)).astype(np.int64)
    rows = [(xx, yy, int(v[yy, xx])) for yy in range(16) for xx in range(16)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    got = dist_transform(df, thresh=900, x="cx", y="cy", value="v",
                         rounds=3, block=8).toPandas()
    want = brute_dt(v >= 900, rounds=3)
    exp = {}
    for yy in range(16):
        for xx in range(16):
            k = (xx // 8, yy // 8)
            s, n = exp.get(k, (0, 0))
            exp[k] = (s + want[yy, xx], n + (want[yy, xx] <= 3))
    got_map = {(r.bx, r.by): (r.sum_d, r.n_reached)
               for r in got.itertuples()}
    assert got_map == exp


def test_dist_transform_single_feature(spark):
    # one feature at (2,2) on a 7×7 grid: d = min(|x-2|+|y-2|, cap)
    rows = [(xx, yy, 999 if (xx, yy) == (2, 2) else 0)
            for yy in range(7) for xx in range(7)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    got = dist_transform(df, thresh=990, x="cx", y="cy", value="v",
                         rounds=2, block=100).toPandas()
    want = sum(min(abs(xx - 2) + abs(yy - 2), 3)
               for yy in range(7) for xx in range(7))
    n_reach = sum(1 for yy in range(7) for xx in range(7)
                  if abs(xx - 2) + abs(yy - 2) <= 2)
    assert int(got.sum_d.iloc[0]) == want
    assert int(got.n_reached.iloc[0]) == n_reach


def test_dist_transform_no_features(spark):
    rows = [(xx, yy, 1) for yy in range(4) for xx in range(4)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    got = dist_transform(df, thresh=990, x="cx", y="cy", value="v",
                         rounds=3, block=100).toPandas()
    assert int(got.sum_d.iloc[0]) == 16 * 4 and int(got.n_reached.iloc[0]) == 0
