"""Brute-force pins for the r07 wave-H queries: basket_pairs vs an
itertools pair enumeration over pandas baskets, and mad_outliers vs a
serial NumPy lower-median / MAD recomputation — both at sf0.001
against the same parquet the driver gate reads."""

import itertools

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_basket_pairs_matches_itertools(spark):
    got = E.queries()["basket_pairs"](spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    d = li.drop_duplicates()
    counts = {}
    for _, basket in d.groupby("l_orderkey")["l_partkey"]:
        for a, b in itertools.combinations(sorted(basket), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = {k: v for k, v in counts.items() if v >= 2}
    assert {(r.part_a, r.part_b): r.support
            for r in got.itertuples()} == want
    # the lift verdict, recomputed exactly (integer cross-multiply)
    cnt = d.groupby("l_partkey").size().to_dict()
    n = d["l_orderkey"].nunique()
    for r in got.itertuples():
        assert r.cnt_a == cnt[r.part_a] and r.cnt_b == cnt[r.part_b]
        assert r.lift_pos == (r.support * n > r.cnt_a * r.cnt_b)


def test_mad_outliers_matches_numpy(spark):
    got = (E.queries()["mad_outliers"](spark, SF).toPandas()
           .set_index("c_nationkey").sort_index())
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    c["cents"] = np.round(c.c_acctbal * 100).astype(np.int64)
    for nk, g in c.groupby("c_nationkey"):
        n = len(g)
        # lower median under the total (cents, custkey) order
        order1 = g.sort_values(["cents", "c_custkey"]).cents.to_numpy()
        med = int(order1[(n + 1) // 2 - 1])
        dev = np.abs(g.cents.to_numpy() - med)
        order2 = g.assign(dev=dev).sort_values(["dev", "c_custkey"])
        mad = int(order2.dev.to_numpy()[(n + 1) // 2 - 1])
        row = got.loc[nk]
        assert row.n == n
        assert row.med_cents == med
        assert row.mad_cents == mad
        assert row.n_outliers == int((dev > 3 * mad).sum())
