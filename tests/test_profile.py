"""Column profiling: the single-pass wide-agg/explode plan must match
per-column pandas truth, handle nulls, and the approx path must land
within HLL tolerance."""

import numpy as np
import pandas as pd
import pytest

from extract_sf_r_parallel_spark.operators.profile import profile_numeric


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "a": rng.integers(0, 50, n).astype(np.int64),
        "b": rng.normal(0, 10, n),
        "c": rng.integers(0, 100000, n).astype(np.int64),
    })
    df.loc[rng.choice(n, 100, replace=False), "b"] = np.nan
    return df


def test_profile_matches_pandas(spark, pdf):
    got = profile_numeric(spark.createDataFrame(pdf), ["a", "b", "c"]) \
        .toPandas().set_index("col_name")
    for c in ["a", "b", "c"]:
        s = pdf[c]
        r = got.loc[c]
        assert r.n == len(pdf)
        assert r.n_null == int(s.isna().sum())
        assert r.n_distinct == s.nunique(dropna=True)
        assert r.min_v == s.min() and r.max_v == s.max()


def test_profile_single_scan_plan(spark, pdf):
    df = profile_numeric(spark.createDataFrame(pdf), ["a", "b", "c"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one pass: exactly one scan of the input in the physical plan
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_profile_approx_within_tolerance(spark, pdf):
    got = profile_numeric(spark.createDataFrame(pdf), ["c"], approx=True) \
        .collect()[0]
    truth = pdf["c"].nunique()
    assert abs(got.n_distinct - truth) / truth < 0.05
