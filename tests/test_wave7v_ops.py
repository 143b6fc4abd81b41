"""Brute-force pins for the r07 wave-Z queries: dedup_latest vs a
per-key serial last-one-wins walk (with a planted tie), and
share_of_total vs integer ppm recomputation with conservation
invariants."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_dedup_latest_matches_serial(spark):
    got = (E.queries()["dedup_latest"](spark, SF).toPandas()
           .set_index("event_type").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type", "event_id",
                                  "ts", "value"])
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    kept = (ev.sort_values(["us", "event_id"])
            .groupby(["user_id", "event_type"]).tail(1))
    want = kept.groupby("event_type").agg(
        n_keys=("event_id", "size"), id_checksum=("event_id", "sum"),
        kept_cents=("cents", "sum"))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.sort_index().astype("int64"))


def test_dedup_latest_tie_broken_by_event_id(spark):
    from pyspark.sql import functions as F
    pdf = pd.DataFrame({
        "user_id": [1, 1], "event_type": ["click", "click"],
        "event_id": [10, 20],
        "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 2),
        "value": [1.0, 2.0]})
    df = spark.createDataFrame(pdf).select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    m = (df.groupBy("user_id", "event_type")
         .agg(F.max(F.struct("us", "event_id", "cents")).alias("m"))
         .select("m.event_id").toPandas())
    assert list(m.event_id) == [20]   # tie on ts → larger id wins


def test_share_of_total_matches_ppm_recompute(spark):
    got = (E.queries()["share_of_total"](spark, SF).toPandas()
           .set_index("nk").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["cents"] = np.round(m.o_totalprice * 100).astype(np.int64)
    rev = m.groupby("c_nationkey").cents.sum()
    tot = int(rev.sum())
    order = rev.reset_index().sort_values(
        ["cents", "c_nationkey"], ascending=[False, True])
    cum = 0
    for r in order.itertuples():
        cum += int(r.cents)
        row = got.loc[r.c_nationkey]
        assert row.cents == r.cents
        assert row.share_ppm == 1_000_000 * int(r.cents) // tot
        assert row.cum_ppm == 1_000_000 * cum // tot
    assert got.cents.sum() == tot
    # the last cumulative share is exactly 100%
    assert got.cum_ppm.max() == 1_000_000
