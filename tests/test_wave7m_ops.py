"""Brute-force pins for the r07 wave-Q queries: weighted_sample vs a
hashlib.md5 recomputation of the accept set, noise_estimate vs a
per-pixel Laplacian loop, snapshot_diff vs direct pandas accounting
plus the COW carried-dirs invariant."""

import hashlib

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import noise_estimate

SF = "/root/testdata/sf0.001"


def test_weighted_sample_matches_hashlib(spark):
    got = (E.queries()["weighted_sample"](spark, SF).toPandas()
           .set_index("o_orderpriority").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])
    o["cents"] = np.round(o.o_totalprice * 100).astype(np.int64)
    h = o.o_orderkey.map(lambda k: int(
        hashlib.md5(f"{k}:ws".encode()).hexdigest()[:15], 16))
    keep = (h % 1000000) < np.minimum(999999, o.cents // 100)
    for pri, g in o.assign(keep=keep).groupby("o_orderpriority"):
        row = got.loc[pri]
        assert row.n_total == len(g)
        assert row.n_sampled == int(g.keep.sum())
        assert row.sampled_cents == int(g.cents[g.keep].sum())
    # the whole point: a rerun selects the identical set
    again = (E.queries()["weighted_sample"](spark, SF).toPandas()
             .set_index("o_orderpriority").sort_index())
    pd.testing.assert_frame_equal(got, again)


def test_noise_estimate_matches_perpixel(spark):
    rng = np.random.default_rng(73)
    v = rng.integers(0, 256, (8, 12), dtype=np.int64)
    img = np.repeat(v[..., None], 3, axis=2).astype(np.uint8)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(12), "h": np.int32(8), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = noise_estimate(spark.createDataFrame(pdf)).toPandas().iloc[0]
    laps = [abs(4 * v[r, c] - v[r - 1, c] - v[r + 1, c]
                - v[r, c - 1] - v[r, c + 1])
            for r in range(1, 7) for c in range(1, 11)]
    assert got.n_interior == len(laps)
    assert got.lap_sum == sum(laps) and got.lap_max == max(laps)
    # a constant image has zero Laplacian everywhere
    flat = np.full((8, 12, 3), 77, dtype=np.uint8)
    pdf2 = pd.DataFrame([{
        "image_id": "t1", "bytes": flat.tobytes(),
        "w": np.int32(12), "h": np.int32(8), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    g2 = noise_estimate(spark.createDataFrame(pdf2)).toPandas().iloc[0]
    assert g2.lap_sum == 0 and g2.lap_max == 0


def test_snapshot_diff_matches_pandas_and_cow(spark):
    got = (E.queries()["snapshot_diff"](spark, SF).toPandas()
           .set_index("o_orderstatus").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_orderstatus"])
    dele = (o.o_orderstatus == "F") & (o.o_orderkey % 10 < 3)
    for st, g in o.assign(dele=dele).groupby("o_orderstatus"):
        row = got.loc[st]
        assert row.n_before == len(g)
        assert row.n_deleted == int(g.dele.sum())
        assert row.n_after == len(g) - int(g.dele.sum())
        assert row.n_added == 0
    # row conservation across the diff
    assert (got.n_before - got.n_deleted == got.n_after).all()
