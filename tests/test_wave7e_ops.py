"""Brute-force pins for the r07 wave-I queries: unpivot_melt vs a
pandas melt, gini_lorenz vs a serial NumPy Gini/Lorenz recomputation,
and ripley_k / knox_test vs full-quadratic pair enumerations (the
real engines are cell/bucket-blocked — the quadratic truth proves the
blocking loses no pair) at sf0.001."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979
_A1, _A2 = 48271, 69621
WINDOW = 20000


def _pts():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts"])
    x = ((ev.event_id * _A1 + 13) % _P1) % WINDOW
    y = ((ev.event_id * _A2 + 7) % _P2) % WINDOW
    us = ev.ts.astype("datetime64[us]").astype("int64")
    return (ev.event_id.to_numpy(), x.to_numpy(), y.to_numpy(),
            us.to_numpy())


def test_unpivot_melt_matches_pandas(spark):
    got = (E.queries()["unpivot_melt"](spark, SF).toPandas()
           .set_index("metric"))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cols = {"qty": "l_quantity", "price": "l_extendedprice",
            "disc": "l_discount", "tax": "l_tax"}
    for m, c in cols.items():
        v = np.round(li[c] * 100).astype(np.int64)
        row = got.loc[m]
        assert row.n == len(v)
        assert row.sum_cents == v.sum()
        assert row.min_cents == v.min() and row.max_cents == v.max()


def test_gini_lorenz_matches_numpy(spark):
    got = (E.queries()["gini_lorenz"](spark, SF).toPandas()
           .set_index("c_nationkey"))
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    c["x"] = np.round(c.c_acctbal * 100).astype(np.int64) + 100000
    for nk, g in c.groupby("c_nationkey"):
        xs = g.sort_values(["x", "c_custkey"]).x.to_numpy()
        n = len(xs)
        i = np.arange(1, n + 1)
        row = got.loc[nk]
        assert row.n == n and row.sum_x == xs.sum()
        assert row.gini_num == int(((2 * i - n - 1) * xs).sum())
        assert row.lorenz_half == xs[: n // 2].sum()
        # invariant: 0 ≤ Gini < 1 for positive x
        assert 0 <= row.gini_num < row.n * row.sum_x


def test_ripley_k_matches_quadratic(spark):
    got = E.queries()["ripley_k"](spark, SF).toPandas().iloc[0]
    ids, x, y, _ = _pts()
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    upper = ids[:, None] < ids[None, :]
    for col, r in (("k300", 300), ("k600", 600), ("k1200", 1200)):
        assert got[col] == int((upper & (d2 <= r * r)).sum()), col


def test_knox_test_matches_quadratic(spark):
    got = E.queries()["knox_test"](spark, SF).toPandas().iloc[0]
    ids, x, y, us = _pts()
    upper = ids[:, None] < ids[None, :]
    d2 = ((x[:, None] - x[None, :]) ** 2
          + (y[:, None] - y[None, :]) ** 2)
    dt = np.abs(us[:, None] - us[None, :])
    near_s = upper & (d2 <= 600 * 600)
    near_t = upper & (dt <= 600_000_000)
    n = len(ids)
    assert got.n_events == n
    assert got.pairs_total == n * (n - 1) // 2
    assert got.pairs_space == int(near_s.sum())
    assert got.pairs_time == int(near_t.sum())
    assert got.pairs_both == int((near_s & near_t).sum())
    assert got.knox_pos == (got.pairs_both * got.pairs_total
                            > got.pairs_space * got.pairs_time)
