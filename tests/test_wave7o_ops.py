"""Brute-force pins for the r07 wave-S queries: aspect_class vs the
full NumPy gradient-sign classifier, fk_orphans vs pandas anti-joins
PLUS a corrupted-copy probe (the audit must actually fire),
top3_concat vs a serial sort-and-slice."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_aspect_class_matches_numpy(spark):
    got = (E.queries()["aspect_class"](spark, SF).toPandas()
           .set_index(["bx", "by"]).sort_index())
    n = 800
    cx, cy = np.meshgrid(np.arange(n, dtype=np.int64),
                         np.arange(n, dtype=np.int64), indexing="ij")
    v = ((cx * 2654435761 + cy * 40503 + 7) % 4294967291) % 1000
    gx = v[2:, 1:-1] - v[:-2, 1:-1]
    gy = v[1:-1, 2:] - v[1:-1, :-2]
    flat = (gx == 0) & (gy == 0)
    e = ~flat & (np.abs(gx) >= np.abs(gy)) & (gx > 0)
    w = ~flat & (np.abs(gx) >= np.abs(gy)) & (gx < 0)
    nn = ~flat & (np.abs(gx) < np.abs(gy)) & (gy > 0)
    s = ~flat & (np.abs(gx) < np.abs(gy)) & (gy <= 0)
    bx = (cx[1:-1, 1:-1] // 25).ravel()
    by = (cy[1:-1, 1:-1] // 25).ravel()
    df = pd.DataFrame({"bx": bx, "by": by, "e": e.ravel(), "w": w.ravel(),
                       "n": nn.ravel(), "s": s.ravel(),
                       "flat": flat.ravel()})
    want = df.groupby(["bx", "by"]).sum()
    assert len(got) == 1024
    assert (got.n_e.to_numpy() == want.e.to_numpy()).all()
    assert (got.n_w.to_numpy() == want.w.to_numpy()).all()
    assert (got.n_n.to_numpy() == want.n.to_numpy()).all()
    assert (got.n_s.to_numpy() == want.s.to_numpy()).all()
    assert (got.n_flat.to_numpy() == want.flat.to_numpy()).all()
    # the five classes partition every interior cell
    total = got[["n_e", "n_w", "n_n", "n_s", "n_flat"]].sum(axis=1)
    assert (total == want[["e", "w", "n", "s", "flat"]].sum(axis=1)).all()


def test_fk_orphans_zero_on_clean_and_fires_on_corrupt(spark):
    got = (E.queries()["fk_orphans"](spark, SF).toPandas()
           .set_index("fk"))
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    assert got.loc["lineitem.orderkey"].n_child == len(li)
    assert (got.n_orphan == 0).all()   # fixture is integrity-clean
    # corrupt probe: drop half the parents, the SAME anti-join fires
    from pyspark.sql import functions as F
    child = spark.createDataFrame(o[["o_custkey"]])
    parent = spark.createDataFrame(
        pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"]))
    broken = parent.filter(F.col("c_custkey") % 2 == 0)
    n_orphan = (child.select(F.col("o_custkey").alias("k"))
                .join(broken.select(F.col("c_custkey").alias("k")),
                      "k", "left_anti").count())
    want = int((o.o_custkey % 2 != 0).sum())
    assert n_orphan == want > 0


def test_top3_concat_matches_serial(spark):
    got = (E.queries()["top3_concat"](spark, SF).toPandas()
           .set_index("c_nationkey").sort_index())
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    c["cents"] = np.round(c.c_acctbal * 100).astype(np.int64)
    for nk, g in c.groupby("c_nationkey"):
        order = g.sort_values(["cents", "c_custkey"],
                              ascending=[False, True])
        want = ":".join(str(k) for k in order.c_custkey.head(3))
        row = got.loc[nk]
        assert row.n == len(g) and row.top3 == want
