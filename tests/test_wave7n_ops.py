"""Brute-force pins for the r07 wave-R queries: ring_profile vs
NumPy band assignment, st_cube vs a pandas cube + argmax,
interval_union vs a literal sort-and-sweep interval merger."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979


def _xy(ev):
    x = ((ev.event_id * 48271 + 13) % _P1) % 20000
    y = ((ev.event_id * 69621 + 7) % _P2) % 20000
    return x.to_numpy(), y.to_numpy()


def test_ring_profile_matches_numpy(spark):
    got = (E.queries()["ring_profile"](spark, SF).toPandas()
           .set_index("ring").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    x, y = _xy(ev)
    ring = np.minimum(np.maximum(np.abs(x - 10000),
                                 np.abs(y - 10000)) // 500, 20)
    df = ev.assign(ring=ring)
    for r, g in df.groupby("ring"):
        row = got.loc[r]
        assert row.n_events == len(g)
        assert row.n_users == g.user_id.nunique()
        assert abs(row.sum_value - round(g.value.sum(), 4)) < 1e-9
    assert got.n_events.sum() == len(ev)   # bands partition the plane


def test_st_cube_matches_pandas(spark):
    got = (E.queries()["st_cube"](spark, SF).toPandas()
           .set_index(["gx", "gy"]).sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts"])
    x, y = _xy(ev)
    day = (ev.ts.dt.floor("D")
           - pd.Timestamp("2024-01-01")).dt.days.to_numpy()
    df = pd.DataFrame({"gx": x // 4000, "gy": y // 4000, "day": day})
    cube = df.groupby(["gx", "gy", "day"]).size().rename("n").reset_index()
    for (gx, gy), g in cube.groupby(["gx", "gy"]):
        row = got.loc[(gx, gy)]
        assert row.n_days == len(g)
        assert row.n_total == g.n.sum()
        peak = g.n.max()
        assert row.peak_n == peak
        assert row.peak_day == g[g.n == peak].day.min()


def test_interval_union_matches_sweep(spark):
    got = (E.queries()["interval_union"](spark, SF).toPandas()
           .set_index("user_id").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["s"] = ev.ts.astype("datetime64[us]").astype("int64")
    tau = 600_000_000
    for uid, g in ev.groupby("user_id"):
        islands = []
        for s in sorted(g.s):
            e = s + tau
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        cov = sum(hi - lo for lo, hi in islands)
        row = got.loc[uid]
        assert row.n_islands == len(islands)
        assert row.covered_us == cov
        assert row.covered_sec == cov // 1_000_000
        # union ≤ naive sum, with equality iff no overlaps
        assert cov <= len(g) * tau
