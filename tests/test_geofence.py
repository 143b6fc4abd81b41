"""Geofence transition detection: stream ≡ batch, late-ping rewrites,
first-ping rule, containment flag."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.streaming import events as SE
from extract_sf_r_parallel_spark.streaming.geofence import (
    geofence_batch,
    geofence_stream,
    with_inside,
)

SF_DIR = "/root/testdata/sf0.001"

_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("ts", pa.timestamp("us")),
    ("event_id", pa.int64()), ("inside", pa.int32()),
])
_READ_SCHEMA = ("user_id long, ts timestamp, event_id long, inside int")

T0 = pd.Timestamp("2024-03-01")


def _stamp(d):
    base = time.time() - 3600
    for i, f in enumerate(sorted(os.listdir(d))):
        p = os.path.join(d, f)
        os.utime(p, (base + 10 * i, base + 10 * i))


def _write(d, name, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                      "inside"])
    pq.write_table(pa.Table.from_pandas(pdf, schema=_SCHEMA),
                   os.path.join(d, name))


def _drain(spark, d, ck, sink):
    stream = spark.readStream.schema(_READ_SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(d)
    out = geofence_stream(stream, watermark="1 hour")
    SE.run_available_now(out, sink, ck)
    return (spark.table(sink).filter(F.col("user_id") >= 0)
            .toPandas().sort_values(["user_id", "ts", "event_id"])
            .reset_index(drop=True))


def _sec(s):
    return T0 + pd.Timedelta(seconds=s)


def test_late_ping_rewrites_transition(spark, tmp_path):
    """A within-watermark late ping must land in its TRUE event-time
    position: the enter fires at the late ping's ts, not at the first
    in-order inside ping a bufferless implementation would report."""
    d = str(tmp_path / "src")
    os.makedirs(d)
    _write(d, "part-000.parquet",
           [(1, _sec(0), 10, 0), (1, _sec(1000), 11, 1)])
    # late arrival: ts=500 (inside) sorts BETWEEN the two above
    _write(d, "part-001.parquet",
           [(1, _sec(500), 12, 1), (1, _sec(2000), 13, 0)])
    _write(d, "part-002.parquet",
           [(-1, _sec(0) + pd.Timedelta(days=400), 99, 0)])
    _stamp(d)
    got = _drain(spark, d, str(tmp_path / "ck"), "geofence_late")
    assert list(zip(got["event_id"], got["kind"])) == [
        (12, "enter"), (13, "exit")]
    assert got["ts"].tolist() == [_sec(500), _sec(2000)]


def test_first_ping_rule_and_flat_runs(spark, tmp_path):
    d = str(tmp_path / "src")
    os.makedirs(d)
    _write(d, "part-000.parquet", [
        (1, _sec(0), 1, 1),      # first ping inside → enter
        (1, _sec(10), 2, 1),     # flat run → nothing
        (2, _sec(0), 3, 0),      # first ping outside → nothing
        (2, _sec(10), 4, 0),
        (2, _sec(20), 5, 1),     # → enter
    ])
    _write(d, "part-001.parquet",
           [(-1, _sec(0) + pd.Timedelta(days=400), 99, 0)])
    _stamp(d)
    got = _drain(spark, d, str(tmp_path / "ck"), "geofence_first")
    assert list(zip(got["user_id"], got["event_id"], got["kind"])) == [
        (1, 1, "enter"), (2, 5, "enter")]


def test_stream_matches_batch_on_events_fixture(spark, tmp_path):
    """Full equivalence on the real events table: random fence flags,
    6 time-ordered files, state crossing every micro-batch boundary."""
    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    pdf = t.to_pandas()[["user_id", "ts", "event_id"]]
    rng = np.random.default_rng(9)
    pdf["inside"] = rng.integers(0, 2, len(pdf)).astype("int32")
    d = str(tmp_path / "src")
    os.makedirs(d)
    cuts = np.linspace(0, len(pdf), 7).astype(int)
    for i in range(6):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[cuts[i]:cuts[i + 1]],
                                 schema=_SCHEMA, preserve_index=False),
            os.path.join(d, f"part-{i:03d}.parquet"))
    _write(d, "part-zz.parquet",
           [(-1, pdf["ts"].max() + pd.Timedelta(days=400), 999, 0)])
    _stamp(d)
    got = _drain(spark, d, str(tmp_path / "ck"), "geofence_eq")
    want = geofence_batch(spark.createDataFrame(pdf)) \
        .toPandas().sort_values(["user_id", "ts", "event_id"]) \
        .reset_index(drop=True)
    assert len(got) == len(want) and len(want) > 100
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)


def test_with_inside_containment_and_buffer(spark):
    fences = pd.DataFrame({"rxmin": [0.0, 100.0], "rymin": [0.0, 100.0],
                           "rxmax": [10.0, 110.0], "rymax": [10.0, 110.0]})
    df = spark.createDataFrame(pd.DataFrame({
        "x": [5.0, 15.0, 99.0, 200.0],
        "y": [5.0, 5.0, 99.0, 200.0]}))
    got = with_inside(df, fences).toPandas()["inside"].tolist()
    assert got == [1, 0, 0, 0]
    buf = with_inside(df, fences, buffer=5.0).toPandas()["inside"].tolist()
    assert buf == [1, 1, 1, 0]  # 15 within 5 of fence 1; 99 of fence 2
