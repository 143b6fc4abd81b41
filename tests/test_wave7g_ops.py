"""Brute-force pins for the r07 wave-K queries: theil_sen vs a
Fraction-exact median-of-slopes recomputation, getis_hotspot vs a
NumPy complete-grid neighborhood sum, burst_detect vs a quadratic
per-user sweep, and ordered_dither vs a per-pixel Python loop."""

from fractions import Fraction

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import (
    BAYER4, ordered_dither)

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979
WINDOW = 20000


def test_theil_sen_matches_fraction_median(spark):
    got = (E.queries()["theil_sen"](spark, SF).toPandas()
           .set_index("nk").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["y"] = m.o_orderdate.dt.year
    m["v"] = np.round(m.o_totalprice * 100).astype(np.int64)
    yr = m.groupby(["c_nationkey", "y"]).v.sum().reset_index()
    for nk, g in yr.groupby("c_nationkey"):
        pts = sorted(zip(g.y, g.v))
        pairs = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dy = int(pts[j][1] - pts[i][1])
                dx = int(pts[j][0] - pts[i][0])
                pairs.append((Fraction(dy, dx), dy, dx))
        pairs.sort()
        med = pairs[(len(pairs) + 1) // 2 - 1]
        row = got.loc[nk]
        assert row.n_pairs == len(pairs)
        # engine orders by the double slope; Fraction order can only
        # differ where doubles collide, where the (dy, dx) tiebreak
        # pins the same element — compare the exact fraction value
        assert Fraction(int(row.med_dy), int(row.med_dx)) == med[0]


def test_getis_hotspot_matches_numpy(spark):
    got = (E.queries()["getis_hotspot"](spark, SF).toPandas()
           .set_index(["gx", "gy"]).sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    x = (((ev.event_id * 48271 + 13) % _P1) % WINDOW) // 500
    y = (((ev.event_id * 69621 + 7) % _P2) % WINDOW) // 500
    grid = np.zeros((40, 40), dtype=np.int64)
    np.add.at(grid, (x.to_numpy(), y.to_numpy()), 1)
    total, n_cells = grid.sum(), 1600
    assert len(got) == n_cells
    for gx in range(40):
        for gy in range(40):
            xs = slice(max(gx - 1, 0), min(gx + 2, 40))
            ys = slice(max(gy - 1, 0), min(gy + 2, 40))
            local = int(grid[xs, ys].sum())
            n_nb = (xs.stop - xs.start) * (ys.stop - ys.start)
            row = got.loc[(gx, gy)]
            assert row.local_sum == local and row.n_nb == n_nb
            assert row.hot_num == n_cells * local - n_nb * total
            assert row.is_hot == (row.hot_num > 0)


def test_burst_detect_matches_quadratic(spark):
    got = (E.queries()["burst_detect"](spark, SF).toPandas()
           .set_index("user_id").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    tau = 3_600_000_000
    for uid, g in ev.groupby("user_id"):
        us = g.us.to_numpy()
        ids = g.event_id.to_numpy()
        burst = ((us[None, :] >= us[:, None])
                 & (us[None, :] <= us[:, None] + tau)).sum(axis=1)
        best = burst.max()
        at = ids[burst == best].min()
        row = got.loc[uid]
        assert row.max_burst == best and row.at_event == at


def test_ordered_dither_matches_perpixel(spark):
    rng = np.random.default_rng(59)
    h, w = 10, 14
    v = rng.integers(0, 256, (h, w), dtype=np.int64)
    img = np.repeat(v[..., None], 3, axis=2).astype(np.uint8)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = ordered_dither(spark.createDataFrame(pdf)).toPandas().iloc[0]
    q = np.zeros((2, 2), dtype=int)
    n_on = 0
    for r in range(h):
        for c in range(w):
            on = v[r, c] >= 16 * BAYER4[r % 4, c % 4] + 9
            n_on += on
            q[(r * 2) // h, (c * 2) // w] += on
    assert got.n_on == n_on
    assert (got.q00, got.q01, got.q10, got.q11) == (
        q[0, 0], q[0, 1], q[1, 0], q[1, 1])
