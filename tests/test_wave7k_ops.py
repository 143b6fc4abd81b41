"""Brute-force pins for the r07 wave-O queries: local_moran vs a
NumPy complete-grid deviation-product, yoy_ttest vs scipy-free
paired-t recomputation, clustering_coef vs a set-based triangle
counter, crossmodal_corr vs direct NumPy moments."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979
WINDOW = 20000


def test_local_moran_matches_numpy(spark):
    got = (E.queries()["local_moran"](spark, SF).toPandas()
           .set_index(["gx", "gy"]).sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    x = (((ev.event_id * 48271 + 13) % _P1) % WINDOW) // 500
    y = (((ev.event_id * 69621 + 7) % _P2) % WINDOW) // 500
    grid = np.zeros((40, 40), dtype=np.int64)
    np.add.at(grid, (x.to_numpy(), y.to_numpy()), 1)
    n, s = 1600, int(grid.sum())
    dev = n * grid - s
    assert len(got) == 1600
    for gx in range(40):
        for gy in range(40):
            xs = slice(max(gx - 1, 0), min(gx + 2, 40))
            ys = slice(max(gy - 1, 0), min(gy + 2, 40))
            nb = int(dev[xs, ys].sum()) - int(dev[gx, gy])
            row = got.loc[(gx, gy)]
            assert row.dev == dev[gx, gy] and row.nb_sum == nb
            assert row.i_num == int(dev[gx, gy]) * nb
            want_q = ("HH" if dev[gx, gy] >= 0 and nb >= 0 else
                      "LL" if dev[gx, gy] < 0 and nb < 0 else
                      "HL" if dev[gx, gy] >= 0 else "LH")
            assert row.quad == want_q


def test_yoy_ttest_matches_serial(spark):
    got = (E.queries()["yoy_ttest"](spark, SF).toPandas()
           .set_index("c_nationkey").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    o["y"] = o.o_orderdate.dt.year
    o["cents"] = np.round(o.o_totalprice * 100).astype(np.int64)
    rev = o.groupby(["o_custkey", "y"]).cents.sum().unstack()
    both = rev[[1997, 1998]].dropna()
    d = (both[1998].astype(np.int64) // 100
         - both[1997].astype(np.int64) // 100)
    nk = c.set_index("c_custkey").c_nationkey
    for nation, g in d.groupby(d.index.map(nk)):
        n = len(g)
        sd, sd2 = int(g.sum()), int((g ** 2).sum())
        row = got.loc[nation]
        assert (row.n, row.sum_d, row.sum_d2) == (n, sd, sd2)
        want = (float(sd) * float(sd) * float(n - 1)
                > 4.0 * (float(n) * float(sd2) - float(sd) * float(sd)))
        assert row.significant == want


def test_clustering_coef_matches_sets(spark):
    got = (E.queries()["clustering_coef"](spark, SF).toPandas()
           .set_index("v").sort_index())
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    d = li.drop_duplicates()
    cnt: dict = {}
    for _, basket in d.groupby("l_orderkey")["l_partkey"]:
        bs = sorted(basket)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                cnt[(bs[i], bs[j])] = cnt.get((bs[i], bs[j]), 0) + 1
    edges = {e for e, k in cnt.items() if k >= 2}
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    assert set(got.index) == set(nbrs)
    for v, ns in nbrs.items():
        ns_sorted = sorted(ns)
        t = sum(1 for i in range(len(ns_sorted))
                for j in range(i + 1, len(ns_sorted))
                if (ns_sorted[i], ns_sorted[j]) in edges)
        row = got.loc[v]
        assert row.deg == len(ns) and row.t_v == t
        assert row.dense == (6 * t >= len(ns) * (len(ns) - 1))


def test_crossmodal_corr_matches_numpy(spark):
    from extract_sf_r_parallel_spark.data import codec, synth
    got = E.queries()["crossmodal_corr"](spark, SF).toPandas().iloc[0]
    imgs = synth.images_pdf(240)
    xs, ys = [], []
    for r in imgs.itertuples():
        v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0]
        xs.append(len(r.caption))
        ys.append(int(v.astype(np.int64).sum()))
    x, y = np.array(xs, dtype=np.int64), np.array(ys, dtype=np.int64)
    n = len(x)
    assert got.n == n
    assert got.cov_num == n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    assert got.var_x_num == n * int((x * x).sum()) - int(x.sum()) ** 2
    assert got.var_y_num == n * int((y * y).sum()) - int(y.sum()) ** 2
    assert got.positive == (got.cov_num > 0)
