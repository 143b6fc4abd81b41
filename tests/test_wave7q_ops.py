"""Brute-force pins for the r07 wave-U queries: order_gaps vs a
serial per-customer gap walk, ahash_balance vs the operator's own
bits re-counted in Python (plus an all-images-covered invariant),
caption_subjects vs direct i % 13 ground truth — proving the regex
path parses what synth planted."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_order_gaps_matches_serial(spark):
    got = (E.queries()["order_gaps"](spark, SF).toPandas()
           .set_index("c_nationkey").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_orderkey"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    nk = c.set_index("c_custkey").c_nationkey
    rows = []
    for ck, g in o.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        days = g.o_orderdate.dt.floor("D")
        for prev, cur in zip(days[:-1], days[1:]):
            rows.append((nk[ck], (cur - prev).days))
    df = pd.DataFrame(rows, columns=["nation", "gap"])
    want = df.groupby("nation").agg(
        n_gaps=("gap", "size"), sum_gap_days=("gap", "sum"),
        max_gap_days=("gap", "max"))
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.sort_index().astype("int64"),
        check_names=False)


def test_ahash_balance_matches_operator_bits(spark):
    from extract_sf_r_parallel_spark.data import synth
    from extract_sf_r_parallel_spark.operators.multimodal import ahash_bits
    got = (E.queries()["ahash_balance"](spark, SF).toPandas()
           .set_index("b").sort_index())
    ah = ahash_bits(
        spark.createDataFrame(synth.images_pdf(240))).toPandas()
    counts = np.zeros(64, dtype=np.int64)
    for s in ah.ahash:
        counts += np.frombuffer(s.encode(), dtype=np.uint8) == ord("1")
    assert len(got) == 64 and (got.n_images == 240).all()
    assert (got.n_set.to_numpy() == counts).all()
    assert (got.imbalance == (2 * got.n_set - 240).abs()).all()


def test_caption_subjects_matches_ground_truth(spark):
    got = (E.queries()["caption_subjects"](spark, SF).toPandas()
           .set_index("subject").sort_index())
    sizes = [32, 64, 96]
    want: dict = {}
    for i in range(240):
        w, h = sizes[i % 3], sizes[(i // 3) % 3]
        n, px = want.get(i % 13, (0, 0))
        want[i % 13] = (n + 1, px + w * h)
    assert {int(b): (int(r.n_images), int(r.sum_px))
            for b, r in got.iterrows()} == want
