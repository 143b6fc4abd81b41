"""Brute-force pins for the r07 wave-W queries: hhi_brand vs pandas
share accounting, price_runs vs a literal serial run walker,
letterbox_detect vs a planted black-border image plus a per-pixel
recount."""

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import (
    letterbox_detect)

SF = "/root/testdata/sf0.001"


def test_hhi_brand_matches_pandas(spark):
    got = (E.queries()["hhi_brand"](spark, SF).toPandas()
           .set_index("p_brand").sort_index())
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    p = pd.read_parquet(f"{SF}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    m["q"] = m.l_quantity.astype(np.int64)
    for brand, g in m.groupby("p_brand"):
        qs = g.groupby("l_suppkey").q.sum()
        row = got.loc[brand]
        assert row.n_suppliers == len(qs)
        assert row.total_q == qs.sum()
        assert row.hhi_num == int((qs ** 2).sum())
        assert row.max_q == qs.max()
        assert row.dominated == bool(
            4 * qs.max() ** 2 > qs.sum() ** 2)
        # HHI bounds: 1/n ≤ HHI ≤ 1 ⟺ total²/n ≤ num ≤ total²
        assert row.total_q ** 2 <= row.hhi_num * row.n_suppliers
        assert row.hhi_num <= row.total_q ** 2


def test_price_runs_matches_serial_walker(spark):
    got = (E.queries()["price_runs"](spark, SF).toPandas()
           .set_index("l_partkey").sort_index())
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_orderkey",
                 "l_linenumber", "l_extendedprice"])
    li["cents"] = np.round(li.l_extendedprice * 100).astype(np.int64)
    for pk, g in li.groupby("l_partkey"):
        cents = g.sort_values(
            ["l_shipdate", "l_orderkey", "l_linenumber"]).cents.to_numpy()
        dirs = np.sign(np.diff(cents))
        n_up = int((dirs == 1).sum())
        n_down = int((dirs == -1).sum())
        n_flat = int((dirs == 0).sum())
        best = cur = 0
        for d in dirs:
            cur = cur + 1 if d == 1 else 0
            best = max(best, cur)
        row = got.loc[pk]
        assert (row.n_up, row.n_down, row.n_flat) == (n_up, n_down,
                                                      n_flat)
        assert row.max_up_run == best


def _img_df(spark, v):
    img = np.repeat(v[..., None].astype(np.uint8), 3, axis=2)
    return spark.createDataFrame(pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(v.shape[1]), "h": np.int32(v.shape[0]),
        "fmt": "raw", "caption": "", "phash": np.int64(0)}]))


def test_letterbox_fires_on_planted_black_bars(spark):
    v = np.full((20, 30), 200, dtype=np.int64)
    v[:2, :] = 0
    v[-2:, :] = 0
    v[:, :2] = 0
    v[:, -2:] = 0
    got = letterbox_detect(_img_df(spark, v)).toPandas().iloc[0]
    assert bool(got.letterboxed)
    assert got.border_sum == 0
    assert got.interior_sum == 200 * 16 * 26
    # and a uniform image is NOT letterboxed
    g2 = letterbox_detect(
        _img_df(spark, np.full((20, 30), 90, dtype=np.int64))) \
        .toPandas().iloc[0]
    assert not bool(g2.letterboxed)


def test_letterbox_counts_match_perpixel(spark):
    rng = np.random.default_rng(79)
    v = rng.integers(0, 256, (11, 17), dtype=np.int64)
    got = letterbox_detect(_img_df(spark, v)).toPandas().iloc[0]
    bsum = bn = isum = inum = 0
    for r in range(11):
        for c in range(17):
            if 2 <= r <= 8 and 2 <= c <= 14:
                isum += v[r, c]; inum += 1
            else:
                bsum += v[r, c]; bn += 1
    assert (got.border_n, got.border_sum) == (bn, bsum)
    assert (got.interior_n, got.interior_sum) == (inum, isum)
    assert got.letterboxed == (2 * bsum * inum < isum * bn)
