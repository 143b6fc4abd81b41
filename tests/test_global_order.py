"""r08: distributed global rank / ntile / running sum
(operators/global_order.py — VERDICT r07 next-#3) must be value-
identical to the unpartitioned-window forms they replace, and the
rewritten rfm_scores / abc_class plans must contain NO unpartitioned
window (the one plan shape that breaks at a 10⁸-row rollup)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.global_order import (
    ntile_from_rank,
    with_global_cumsum,
    with_global_rank,
)
from extract_sf_r_parallel_spark.plans import relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(5)
    n = 5_000
    pdf = pd.DataFrame({
        "k": np.arange(n),
        # heavy ties: ranks depend on the tiebreak, exactly the case
        # where a sloppy rewrite diverges from NTILE
        "v": rng.integers(0, 40, n),
        "c": rng.integers(0, 10_000, n).astype("int64"),
    })
    return spark.createDataFrame(pdf)


def test_global_rank_matches_window(spark, frame):
    order = [F.col("v").desc(), F.col("k")]
    got, n = with_global_rank(frame, order, out="rk")
    assert n == frame.count()
    want = frame.withColumn("rk", F.row_number().over(W.orderBy(*order)))
    g = {r["k"]: r["rk"] for r in got.collect()}
    w = {r["k"]: r["rk"] for r in want.collect()}
    assert g == w


@pytest.mark.parametrize("n,tiles", [(5000, 5), (5001, 5), (4999, 7),
                                     (3, 5), (1, 4), (10, 10)])
def test_ntile_from_rank_matches_f_ntile(spark, n, tiles):
    df = spark.range(n).select((F.col("id") + 1).alias("rk"), "id")
    got = df.select("id", ntile_from_rank(F.col("rk"), n, tiles)
                    .alias("t")).collect()
    want = df.select("id", F.ntile(tiles).over(W.orderBy("id"))
                     .alias("t")).collect()
    assert {r["id"]: r["t"] for r in got} == \
        {r["id"]: r["t"] for r in want}


def test_global_cumsum_matches_window(spark, frame):
    order = [F.col("c").desc(), F.col("k")]
    got = with_global_cumsum(frame, order, "c", out="cum")
    want = frame.withColumn("cum", F.sum("c").over(
        W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)))
    g = {r["k"]: r["cum"] for r in got.collect()}
    w = {r["k"]: r["cum"] for r in want.collect()}
    assert g == w


def test_rfm_abc_plans_have_no_unpartitioned_window(spark):
    # rfm_scores: three distributed ranks, no scalar agg → the plan
    # must contain NO SinglePartition exchange at all; abc_class keeps
    # exactly one (the legitimate 1-row grand-total aggregate). Both
    # must carry the _pid-partitioned window exchanges instead.
    rfm = relational.q_rfm_scores(spark, SF)
    p = rfm._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in p, p[:2000]
    assert "hashpartitioning(_pid" in p

    abc = relational.q_abc_class(spark, SF)
    p = abc._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange SinglePartition") <= 1, p[:2000]
    assert "hashpartitioning(_pid" in p
