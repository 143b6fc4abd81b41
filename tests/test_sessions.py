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
    return str(d)


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
