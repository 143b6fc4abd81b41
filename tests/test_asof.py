"""As-of join semantics on a controlled fixture: backward-inclusive
match, no-match nulls, tolerance aging, and left-row preservation."""

import pandas as pd

from extract_sf_r_parallel_spark.operators.asof import asof_join

T0 = pd.Timestamp("2025-01-01 00:00:00")


def _ts(mins):
    return T0 + pd.Timedelta(minutes=mins)


def test_asof_backward_inclusive_and_tolerance(spark):
    right = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(10), "value": 10.0},
        {"user_id": 1, "ts": _ts(20), "value": 20.0},
        {"user_id": 2, "ts": _ts(5), "value": 5.0},
    ]))
    left = spark.createDataFrame(pd.DataFrame([
        {"probe": "a", "user_id": 1, "ts": _ts(9)},    # before first → null
        {"probe": "b", "user_id": 1, "ts": _ts(10)},   # exact ts → inclusive
        {"probe": "c", "user_id": 1, "ts": _ts(15)},   # between → 10.0
        {"probe": "d", "user_id": 1, "ts": _ts(99)},   # after last → 20.0
        {"probe": "e", "user_id": 3, "ts": _ts(50)},   # unseen key → null
    ]))
    got = asof_join(left, right, on="user_id", payload=("value",)) \
        .toPandas().set_index("probe")
    assert pd.isna(got.loc["a", "value_asof"])
    assert got.loc["b", "value_asof"] == 10.0
    assert got.loc["c", "value_asof"] == 10.0
    assert got.loc["d", "value_asof"] == 20.0
    assert got.loc["d", "ts_asof"] == _ts(20)
    assert pd.isna(got.loc["e", "value_asof"])
    assert len(got) == 5  # left rows never drop

    tol = asof_join(left, right, on="user_id", payload=("value",),
                    tolerance_seconds=600).toPandas().set_index("probe")
    assert tol.loc["c", "value_asof"] == 10.0        # 5 min old → fresh
    assert pd.isna(tol.loc["d", "value_asof"])       # 79 min old → aged out
    assert pd.isna(tol.loc["d", "ts_asof"])
