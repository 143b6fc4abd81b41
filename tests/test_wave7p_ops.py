"""Brute-force pins for the r07 wave-T queries: sliding_stream vs the
unnested batch overlap (each event in exactly 2 windows),
snaive_error vs a serial complete-spine lag walk, value_histogram vs
NumPy binning."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_sliding_stream_equals_batch_overlap(spark):
    got = E.queries()["sliding_stream"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["h"] = ev.ts.dt.floor("h")
    a = ev[["h", "event_type", "value"]].copy()
    b = a.copy()
    b["h"] = b.h - pd.Timedelta(hours=1)
    both = pd.concat([a, b])
    want = (both.groupby(["h", "event_type"])
            .agg(n=("value", "size"), sum_value=("value", "sum"))
            .reset_index())
    g = got.sort_values(["win_start", "event_type"]).reset_index(drop=True)
    w = want.sort_values(["h", "event_type"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g.n.to_numpy() == w.n.to_numpy()).all()
    assert np.allclose(g.sum_value, w.sum_value.round(4), atol=1e-9)
    # every event contributes to exactly two windows
    assert g.n.sum() == 2 * len(ev)


def test_snaive_error_matches_serial(spark):
    got = (E.queries()["snaive_error"](spark, SF).toPandas()
           .set_index("event_type").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    day = (ev.ts.dt.floor("D")
           - pd.Timestamp("2024-01-01")).dt.days
    df = ev.assign(day=day)
    max_day = int(day.max())
    for et, g in df.groupby("event_type"):
        counts = np.zeros(max_day + 1, dtype=np.int64)
        np.add.at(counts, g.day.to_numpy(), 1)
        errs = np.abs(counts[7:] - counts[:-7])
        row = got.loc[et]
        assert row.n_days == len(errs)
        assert row.sum_abs_err == errs.sum()
        assert row.max_abs_err == errs.max()


def test_value_histogram_matches_numpy(spark):
    got = (E.queries()["value_histogram"](spark, SF).toPandas()
           .set_index("bin").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    bins = np.minimum(np.floor(ev.value / 25).astype(np.int64), 19)
    cents = np.round(ev.value * 100).astype(np.int64)
    df = pd.DataFrame({"bin": bins, "cents": cents})
    want = df.groupby("bin").agg(n=("cents", "size"),
                                 sum_cents=("cents", "sum"))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))
    assert got.n.sum() == len(ev)
