"""Stream-stream funnel join: even-id events pair with odd-id events
of the same user within a time bound. The drained AvailableNow stream
must equal the batch self-join exactly (inner join, event-time-ordered
staged files → nothing is dropped as late)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.streaming import events as SE

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def staged(tmp_path):
    import os
    import time

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    d = tmp_path / "src"
    d.mkdir()
    cuts = np.linspace(0, t.num_rows, 7).astype(int)
    for i in range(6):
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       d / f"part-{i:03d}.parquet")
    base = time.time() - 3600
    for i, f in enumerate(sorted(d.iterdir())):
        os.utime(f, (base + 10 * i, base + 10 * i))
    return str(d)


def test_stream_funnel_join_matches_batch(spark, tmp_path, staged):
    def src():
        return spark.readStream.schema(SE.EVENTS_SCHEMA) \
            .option("maxFilesPerTrigger", 2).parquet(staged)

    left = src().filter(F.col("event_id") % 2 == 0)
    right = src().filter(F.col("event_id") % 2 == 1)
    j = SE.funnel_join(left, right, within="30 minutes", watermark="1 hour")
    SE.run_available_now(j, "funnel_out", str(tmp_path / "ck"),
                         shuffle_partitions=4)
    got = spark.table("funnel_out").toPandas()

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    a = ev[ev.event_id % 2 == 0][["user_id", "event_id", "ts"]] \
        .rename(columns={"event_id": "left_event_id", "ts": "lts"})
    b = ev[ev.event_id % 2 == 1][["user_id", "event_id", "ts"]] \
        .rename(columns={"event_id": "right_event_id", "ts": "rts"})
    m = a.merge(b, on="user_id")
    m = m[(m.rts > m.lts) & (m.rts <= m.lts + pd.Timedelta(minutes=30))]

    assert len(got) == len(m), (len(got), len(m))
    key = ["left_event_id", "right_event_id"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = m[key].sort_values(key).reset_index(drop=True)
    assert (g.to_numpy() == w.to_numpy()).all()
