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


def test_stream_funnel_left_outer_matches_batch(spark, tmp_path):
    """Left-outer leg: unmatched even-id events must emit with NULL
    right columns — which only happens once the GLOBAL watermark (min
    across the two parity-split inputs) passes left.ts + within, so
    the staging adds one far-future sentinel PER PARITY. A single
    sentinel (the inner-join staging) would leave one side's watermark
    at the real max and silently drop the tail's unmatched rows."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    d = tmp_path / "src"
    d.mkdir()
    cuts = np.linspace(0, t.num_rows, 7).astype(int)
    for i in range(6):
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       d / f"part-{i:03d}.parquet")
    f = t.slice(0, 1).to_pandas()
    f = pd.concat([f, f], ignore_index=True)
    f["event_id"] = [999_999_998, 999_999_999]
    f["user_id"] = -1
    f["ts"] = f["ts"] + pd.Timedelta(days=430)
    pq.write_table(pa.Table.from_pandas(f, schema=t.schema),
                   d / "part-zz-flush.parquet")
    base = time.time() - 3600
    for i, p in enumerate(sorted(d.iterdir())):
        os.utime(p, (base + 10 * i, base + 10 * i))

    def src():
        return spark.readStream.schema(SE.EVENTS_SCHEMA) \
            .option("maxFilesPerTrigger", 2).parquet(str(d))

    j = SE.funnel_join(src().filter(F.col("event_id") % 2 == 0),
                       src().filter(F.col("event_id") % 2 == 1),
                       within="30 minutes", watermark="1 hour",
                       how="left_outer")
    SE.run_available_now(j, "funnel_outer_out", str(tmp_path / "ck"),
                         shuffle_partitions=4)
    got = spark.table("funnel_outer_out").toPandas()
    got = got[got.user_id >= 0]

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    a = ev[ev.event_id % 2 == 0][["user_id", "event_id", "ts"]] \
        .rename(columns={"event_id": "left_event_id", "ts": "lts"})
    b = ev[ev.event_id % 2 == 1][["user_id", "event_id", "ts"]] \
        .rename(columns={"event_id": "right_event_id", "ts": "rts"})
    m = a.merge(b, on="user_id", how="left")
    keep = m.right_event_id.isna() | (
        (m.rts > m.lts) & (m.rts <= m.lts + pd.Timedelta(minutes=30)))
    m = m[keep]
    # a left row whose every candidate failed the bound still emits once
    matched = set(m.loc[m.right_event_id.notna(), "left_event_id"])
    un = a[~a.left_event_id.isin(matched)][["user_id", "left_event_id"]]
    want = pd.concat([
        m.loc[m.right_event_id.notna(),
              ["user_id", "left_event_id", "right_event_id"]],
        un.assign(right_event_id=pd.NA)], ignore_index=True)

    assert len(got) == len(want), (len(got), len(want))
    key = ["left_event_id", "right_event_id"]
    g = got[key].fillna(-1).astype("int64").sort_values(key) \
        .reset_index(drop=True)
    w = want[key].fillna(-1).astype("int64").sort_values(key) \
        .reset_index(drop=True)
    assert (g.to_numpy() == w.to_numpy()).all()
