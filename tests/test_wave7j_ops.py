"""Brute-force pins for the r07 wave-N queries: stock_floor vs the
literal serial max(b+d, 0) recursion (proving the Lindley reflection
identity the engine uses), max_drawdown vs a serial peak walk,
rfm_scores vs a serial quintile cutter, and scene_cuts vs the
operator-level motion recomputation."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_stock_floor_matches_serial_recursion(spark):
    got = (E.queries()["stock_floor"](spark, SF).toPandas()
           .set_index("l_suppkey").sort_index())
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_orderkey",
                 "l_linenumber", "l_returnflag", "l_quantity"])
    li["d"] = np.where(li.l_returnflag == "R",
                       li.l_quantity, -li.l_quantity).astype(np.int64)
    for sk, g in li.groupby("l_suppkey"):
        g = g.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
        b = p = 0
        minp = None
        for d in g.d:
            b = max(b + int(d), 0)     # the serial truth
            p += int(d)
            minp = p if minp is None else min(minp, p)
        row = got.loc[sk]
        assert row.n_events == len(g)
        assert row.final_naive == p
        assert row.min_prefix == minp
        assert row.final_floor == b   # reflection identity == recursion


def test_max_drawdown_matches_serial_walk(spark):
    got = (E.queries()["max_drawdown"](spark, SF).toPandas()
           .set_index("l_partkey").sort_index())
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_orderkey",
                 "l_linenumber", "l_extendedprice"])
    li["cents"] = np.round(li.l_extendedprice * 100).astype(np.int64)
    for pk, g in li.groupby("l_partkey"):
        g = g.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
        peak, mdd = -1, 0
        for c in g.cents:
            peak = max(peak, int(c))
            mdd = max(mdd, peak - int(c))
        row = got.loc[pk]
        assert row.n_ticks == len(g)
        assert row.max_cents == peak and row.max_dd == mdd
        assert row.last_cents == int(g.cents.iloc[-1])


def test_rfm_scores_matches_serial_quintiles(spark):
    got = (E.queries()["rfm_scores"](spark, SF).toPandas()
           .set_index("o_custkey").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    o["cents"] = np.round(o.o_totalprice * 100).astype(np.int64)
    agg = o.groupby("o_custkey").agg(
        last_dt=("o_orderdate", "max"), freq=("o_orderdate", "size"),
        cents=("cents", "sum")).reset_index()

    def ntile5(keys):
        # keys pre-sorted list of custkeys; NTILE(5): first buckets
        # take the extra rows
        n = len(keys)
        base, extra = divmod(n, 5)
        out, i = {}, 0
        for b in range(5):
            size = base + (1 if b < extra else 0)
            for k in keys[i:i + size]:
                out[k] = b + 1
            i += size
        return out

    r = ntile5(list(agg.sort_values(
        ["last_dt", "o_custkey"], ascending=[False, True]).o_custkey))
    f = ntile5(list(agg.sort_values(
        ["freq", "o_custkey"], ascending=[False, True]).o_custkey))
    m = ntile5(list(agg.sort_values(
        ["cents", "o_custkey"], ascending=[False, True]).o_custkey))
    for ck in agg.o_custkey:
        row = got.loc[ck]
        assert (row.r_score, row.f_score, row.m_score) == (
            r[ck], f[ck], m[ck])
        assert row.rfm == 100 * r[ck] + 10 * f[ck] + m[ck]


def test_scene_cuts_matches_motion_recompute(spark):
    from extract_sf_r_parallel_spark.data import synth
    from extract_sf_r_parallel_spark.operators.multimodal import (
        motion_stats)
    got = (E.queries()["scene_cuts"](spark, SF).toPandas()
           .set_index("image_id").sort_index())
    videos = synth.videos_pdf(24)
    m = motion_stats(
        spark.createDataFrame(videos)).toPandas()
    meta = videos.set_index("image_id")[["w", "h"]]
    for vid, g in m.groupby("image_id"):
        npx = int(meta.loc[vid].w) * int(meta.loc[vid].h)
        cuts = g[g.motion_l1 > 85 * npx]
        row = got.loc[vid]
        assert row.n_pairs == len(g)
        assert row.n_cuts == len(cuts)
        assert row.first_cut == (int(cuts.frame_idx.min())
                                 if len(cuts) else -1)
        assert row.max_l1 == int(g.motion_l1.max())
