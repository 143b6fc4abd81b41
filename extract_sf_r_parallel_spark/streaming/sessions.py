"""Custom stateful streaming operator: per-user SESSIONIZATION with an
inactivity gap — the `applyInPandasWithState` pattern the built-in
windowed aggregates can't express (session extent depends on the data,
not the clock grid).

- `sessionize_stream`: arbitrary stateful logic per user key. State =
  (start, last, n, Σvalue) in event-time micros; a session closes when
  the watermark passes last_ts + gap (EventTimeTimeout), so late events
  inside the gap still extend their session, exactly once per event.
- `sessionize_batch`: the deterministic batch twin (gaps-and-islands:
  LAG → break flags → running SUM → group), pure JVM window functions.
  The driver query `sessions` runs it against a DuckDB oracle of the
  same shape; the pytest proves stream ≡ batch across micro-batch
  boundaries.

Scale shape: state is per-user and O(1); the shuffle key is user_id
(the same key any per-entity stateful pipeline shards by); watermark
bounds state lifetime so the store can't grow unboundedly.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize_stream", "sessionize_batch", "SESSION_SCHEMA"]

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_STATE_SCHEMA = "start long, last long, n long, s double"


def _micros(ts: pd.Series) -> pd.Series:
    return ts.astype("int64")  # pandas datetime64[us/ns] → int


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """stream(ts, user_id, value, …) → closed sessions per user."""
    gap_us = gap_minutes * 60_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        out = []

        def close(st):
            out.append((user, st[0], st[1], st[2], st[3]))

        if state.hasTimedOut:
            close(state.get)
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts = _micros(rows["ts"].dt.as_unit("us")).to_numpy()
            order = ts.argsort(kind="stable")
            ts = ts[order]
            vals = rows["value"].to_numpy()[order]
            # Arbitrary stateful ops do NOT drop late rows for us —
            # an event older than the watermark (even older than the
            # open session) can land here. Treat the open session as
            # an interval [start, last] with aggregates and run
            # gaps-and-islands over {state interval} ∪ {events},
            # so late events extend session_start (min), merge, or
            # form their own earlier island exactly as the sorted
            # batch twin would. Residual divergence bound: a late
            # event that would have bridged a session emitted in an
            # EARLIER trigger is unrecoverable (that session is out
            # the door); within-watermark in-order arrival never
            # hits this.
            items = []
            if state.exists:
                items.append(list(state.get))
            items.extend([int(t), int(t), 1, float(v)]
                         for t, v in zip(ts, vals))
            items.sort(key=lambda x: (x[0], x[1]))
            merged = [items[0]]
            for it in items[1:]:
                cur = merged[-1]
                if it[0] - cur[1] <= gap_us:
                    cur[0] = min(cur[0], it[0])
                    cur[1] = max(cur[1], it[1])
                    cur[2] += it[2]
                    cur[3] += it[3]
                else:
                    merged.append(it)
            # every island but the newest is separated by > gap from
            # what follows → closed in batch order; emit now
            for isl in merged[:-1]:
                close(isl)
            st = merged[-1]
            wm_ms = state.getCurrentWatermarkMs()
            if st[1] + gap_us <= wm_ms * 1000:
                # the watermark already passed last + gap (late data
                # whose session is over): emit immediately — setting
                # a timeout in the past would kill the query
                close(st)
                if state.exists:
                    state.remove()
            else:
                state.update(tuple(st))
                state.setTimeoutTimestamp(
                    max((st[1] + gap_us) // 1000, wm_ms + 1))
        if out:
            pdf = pd.DataFrame(
                out, columns=["user_id", "s", "e", "n_events", "sum_value"])
            pdf["session_start"] = pd.to_datetime(pdf["s"], unit="us")
            pdf["session_end"] = pd.to_datetime(pdf["e"], unit="us")
            yield pdf[[f.name for f in SESSION_SCHEMA.fields]]

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout)
    )


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Deterministic batch twin: gaps-and-islands over event time."""
    gap_us = gap_minutes * 60_000_000
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet event time is TIMESTAMP_NTZ; interpret in the (UTC)
    # session zone — only differences matter for gap detection
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = F.when(t - F.lag(t).over(w) > gap_us, 1).otherwise(0)
    d = df.withColumn("_brk", brk)
    sid = F.sum("_brk").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0))
    d = d.withColumn("_sid", sid)
    return (
        d.groupBy("user_id", "_sid")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .drop("_sid")
    )
