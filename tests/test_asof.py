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


def test_asof_directions_match_pandas_merge_asof(spark):
    """Random tie-free fixture: all three directions must agree with
    pandas.merge_asof row-for-row (values and matched timestamps)."""
    import numpy as np
    rng = np.random.default_rng(31)
    right = pd.DataFrame({
        "user_id": rng.integers(0, 5, 60),
        "ts": [T0 + pd.Timedelta(seconds=int(s))
               for s in rng.choice(100_000, 60, replace=False)],
        "value": rng.normal(size=60).round(3),
    })
    left = pd.DataFrame({
        "probe": range(40),
        "user_id": rng.integers(0, 6, 40),  # user 5 never in right
        "ts": [T0 + pd.Timedelta(seconds=int(s))
               for s in rng.choice(100_000, 40, replace=False)],
    })
    R, L = spark.createDataFrame(right), spark.createDataFrame(left)
    for direction in ("backward", "forward", "nearest"):
        got = asof_join(L, R, on="user_id", payload=("value",),
                        direction=direction).toPandas() \
            .sort_values("probe").reset_index(drop=True)
        want = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="user_id", direction=direction) \
            .sort_values("probe").reset_index(drop=True)
        gv = got["value_asof"].to_numpy(float)
        wv = want["value"].to_numpy(float)
        import numpy.testing as npt
        assert (pd.isna(gv) == pd.isna(wv)).all(), direction
        npt.assert_allclose(gv[~pd.isna(gv)], wv[~pd.isna(wv)],
                            err_msg=direction)


def test_asof_forward_tolerance(spark):
    right = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(30), "value": 30.0}]))
    left = spark.createDataFrame(pd.DataFrame([
        {"probe": "x", "user_id": 1, "ts": _ts(0)},
        {"probe": "y", "user_id": 1, "ts": _ts(28)}]))
    got = asof_join(left, right, on="user_id", payload=("value",),
                    direction="forward", tolerance_seconds=300) \
        .toPandas().set_index("probe")
    assert pd.isna(got.loc["x", "value_asof"])   # 30 min ahead > 5 min tol
    assert got.loc["y", "value_asof"] == 30.0    # 2 min ahead → fresh


def test_asof_duplicate_timestamp_tie_breaker(spark):
    """Right rows sharing an exact (key, ts): the greatest tie_breaker
    wins, both directions (VERDICT r04 #4 — replayed-feed
    reproducibility)."""
    right = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(10), "event_id": 7, "value": 70.0},
        {"user_id": 1, "ts": _ts(10), "event_id": 9, "value": 90.0},
        {"user_id": 1, "ts": _ts(10), "event_id": 8, "value": 80.0},
        {"user_id": 1, "ts": _ts(40), "event_id": 3, "value": 30.0},
        {"user_id": 1, "ts": _ts(40), "event_id": 5, "value": 50.0},
    ]))
    left = spark.createDataFrame(pd.DataFrame([
        {"probe": "p", "user_id": 1, "ts": _ts(20)},
    ]))
    for _ in range(3):  # deterministic across replays
        back = asof_join(left, right, on="user_id",
                         payload=("event_id", "value"),
                         tie_breaker="event_id").toPandas()
        assert back.loc[0, "event_id_asof"] == 9
        assert back.loc[0, "value_asof"] == 90.0
        fwd = asof_join(left, right, on="user_id",
                        payload=("event_id", "value"),
                        direction="forward",
                        tie_breaker="event_id").toPandas()
        assert fwd.loc[0, "event_id_asof"] == 5
        assert fwd.loc[0, "value_asof"] == 50.0


def test_asof_null_payload_is_atomic(spark):
    """A matched right row whose payload is NULL must yield NULL — not
    an older row's value (ADVICE r04: the match record is one struct,
    filled atomically)."""
    right = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": _ts(10), "value": 10.0},
        {"user_id": 1, "ts": _ts(20), "value": None},
    ]))
    left = spark.createDataFrame(pd.DataFrame([
        {"probe": "a", "user_id": 1, "ts": _ts(15)},   # matches t=10
        {"probe": "b", "user_id": 1, "ts": _ts(25)},   # matches t=20 (NULL!)
    ]))
    got = asof_join(left, right, on="user_id", payload=("value",)) \
        .toPandas().set_index("probe")
    assert got.loc["a", "value_asof"] == 10.0
    assert got.loc["a", "ts_asof"] == _ts(10)
    assert pd.isna(got.loc["b", "value_asof"])       # NOT 10.0
    assert got.loc["b", "ts_asof"] == _ts(20)        # ts from the match
    # pandas merge_asof agrees
    want = pd.merge_asof(
        pd.DataFrame({"user_id": [1, 1], "ts": [_ts(15), _ts(25)]}),
        pd.DataFrame({"user_id": [1, 1], "ts": [_ts(10), _ts(20)],
                      "value": [10.0, None]}),
        on="ts", by="user_id")
    assert want["value"].tolist()[0] == 10.0 and pd.isna(want["value"][1])
