"""Brute-force pins for the r07 wave-X queries: abc_class vs a serial
Pareto cutter (with band-partition invariants), user_paths vs a
per-user sorted walk, symmetry_score vs a planted mirror image plus
a per-pixel recount."""

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import (
    symmetry_score)

SF = "/root/testdata/sf0.001"


def test_abc_class_matches_serial_pareto(spark):
    got = (E.queries()["abc_class"](spark, SF).toPandas()
           .set_index("cls").sort_index())
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])
    li["cents"] = np.round(li.l_extendedprice * 100).astype(np.int64)
    rev = (li.groupby("l_partkey").cents.sum()
           .reset_index().sort_values(["cents", "l_partkey"],
                                      ascending=[False, True]))
    tot = int(rev.cents.sum())
    cum = 0
    bands = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
    for c in rev.cents:
        cum += int(c)
        b = "A" if 5 * cum <= 4 * tot else (
            "B" if 20 * cum <= 19 * tot else "C")
        bands[b][0] += 1
        bands[b][1] += int(c)
    for b, (n, cents) in bands.items():
        if n == 0:
            assert b not in got.index
            continue
        assert got.loc[b].n_parts == n
        assert got.loc[b].revenue_cents == cents
    assert got.n_parts.sum() == rev.shape[0]
    assert got.revenue_cents.sum() == tot


def test_user_paths_matches_serial_walk(spark):
    got = (E.queries()["user_paths"](spark, SF).toPandas()
           .set_index("path").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    want: dict = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        path = ">".join(g.event_type.head(3))
        want[path] = want.get(path, 0) + 1
    assert {p: int(r.n_users) for p, r in got.iterrows()} == want
    assert got.n_users.sum() == ev.user_id.nunique()


def _img_df(spark, v):
    img = np.repeat(v[..., None].astype(np.uint8), 3, axis=2)
    return spark.createDataFrame(pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(v.shape[1]), "h": np.int32(v.shape[0]),
        "fmt": "raw", "caption": "", "phash": np.int64(0)}]))


def test_symmetry_score_zero_on_planted_mirror(spark):
    rng = np.random.default_rng(83)
    left = rng.integers(0, 256, (9, 7), dtype=np.int64)
    v = np.concatenate([left, left[:, ::-1]], axis=1)   # perfect mirror
    got = symmetry_score(_img_df(spark, v)).toPandas().iloc[0]
    assert got.asym_sum == 0 and got.asym_max == 0
    assert got.n_pairs == 9 * 7


def test_symmetry_score_matches_perpixel(spark):
    rng = np.random.default_rng(89)
    v = rng.integers(0, 256, (10, 13), dtype=np.int64)   # odd width
    got = symmetry_score(_img_df(spark, v)).toPandas().iloc[0]
    diffs = [abs(int(v[r, c]) - int(v[r, 12 - c]))
             for r in range(10) for c in range(6)]
    assert got.n_pairs == len(diffs)
    assert got.asym_sum == sum(diffs) and got.asym_max == max(diffs)
