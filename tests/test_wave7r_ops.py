"""Brute-force pins for the r07 wave-V queries: fence_visits vs a
pandas containment scan, hod_profile vs a pandas hour histogram,
cume_users vs a serial first-seen walk."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979


def test_fence_visits_matches_pandas_scan(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import rects_df
    got = (E.queries()["fence_visits"](spark, SF).toPandas()
           .set_index("fid").sort_index())
    fences = (rects_df(spark, SF).drop("geom").toPandas())
    fences = fences[fences.fid % 97 == 0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    x = (((ev.event_id * 48271 + 13) % _P1) % 20000).to_numpy()
    y = (((ev.event_id * 69621 + 7) % _P2) % 20000).to_numpy()
    us = ev.ts.astype("datetime64[us]").astype("int64").to_numpy()
    for f in fences.itertuples():
        m = ((x >= f.rxmin - 500) & (x <= f.rxmax + 500)
             & (y >= f.rymin - 500) & (y <= f.rymax + 500))
        if not m.any():
            assert f.fid not in got.index
            continue
        row = got.loc[f.fid]
        assert row.n_pings == int(m.sum())
        assert row.n_users == ev.user_id[m].nunique()
        assert row.span_sec == (int(us[m].max()) - int(us[m].min())) \
            // 1_000_000


def test_hod_profile_matches_pandas(spark):
    got = E.queries()["hod_profile"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["hod"] = ev.ts.dt.hour
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    g = (ev.groupby(["event_type", "hod"])
         .agg(n=("cents", "size"), sum_cents=("cents", "sum")))
    got_i = got.set_index(["event_type", "hod"]).sort_index()
    assert len(got_i) == len(g)
    assert (got_i.n == g.sort_index().n).all()
    assert (got_i.sum_cents == g.sort_index().sum_cents).all()
    for et, gg in g.reset_index().groupby("event_type"):
        peak = gg.n.max()
        want_hod = gg[gg.n == peak].hod.min()
        assert (got[got.event_type == et].peak_hod == want_hod).all()


def test_cume_users_matches_serial(spark):
    got = (E.queries()["cume_users"](spark, SF).toPandas()
           .sort_values("day").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    day = (ev.ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    first = day.groupby(ev.user_id).min()
    counts = first.value_counts().sort_index()
    assert list(got.day) == list(counts.index)
    assert list(got.n_new) == list(counts.values)
    assert list(got.cum_users) == list(counts.cumsum().values)
    assert got.cum_users.iloc[-1] == ev.user_id.nunique()
