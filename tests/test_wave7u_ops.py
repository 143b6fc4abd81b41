"""Brute-force pins for the r07 wave-Y queries: json_props vs
json.loads row-by-row (plus a malformed-input probe proving the
n_missing audit fires), tile_change vs a pandas two-period split."""

import json

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979


def test_json_props_matches_json_loads(spark):
    got = (E.queries()["json_props"](spark, SF).toPandas()
           .set_index("event_type").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "props"])
    ev["k"] = ev.props.map(lambda s: json.loads(s).get("k"))
    for et, g in ev.groupby("event_type"):
        row = got.loc[et]
        ks = g.k.dropna().astype(np.int64)
        assert row.n == len(g)
        assert row.n_missing == g.k.isna().sum()
        assert row.sum_k == ks.sum()
        assert (row.min_k, row.max_k) == (ks.min(), ks.max())
        assert row.n_high == int((ks > 50).sum())


def test_json_props_missing_audit_fires(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(pd.DataFrame({
        "props": ['{"k": 7}', '{"j": 9}', "not json", None]}))
    k = df.select(F.get_json_object("props", "$.k").cast("long")
                  .alias("k")).toPandas().k
    assert list(k.isna()) == [False, True, True, True]
    assert k.iloc[0] == 7


def test_tile_change_matches_pandas_split(spark):
    got = (E.queries()["tile_change"](spark, SF).toPandas()
           .set_index(["gx", "gy"]).sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts"])
    x = (((ev.event_id * 48271 + 13) % _P1) % 20000) // 2000
    y = (((ev.event_id * 69621 + 7) % _P2) % 20000) // 2000
    day = (ev.ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    df = pd.DataFrame({"gx": x, "gy": y, "h2": day >= 15})
    g = df.groupby(["gx", "gy"]).h2.agg(["size", "sum"])
    t2 = int(df.h2.sum())
    t1 = len(df) - t2
    for (gx, gy), r in g.iterrows():
        n2 = int(r["sum"])
        n1 = int(r["size"]) - n2
        row = got.loc[(gx, gy)]
        assert (row.n1, row.n2) == (n1, n2)
        assert row.shift_num == n2 * t1 - n1 * t2
        assert row.grew == (row.shift_num > 0)
    assert got.n1.sum() == t1 and got.n2.sum() == t2
