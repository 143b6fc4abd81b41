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

_STATE_SCHEMA = ("starts array<long>, lasts array<long>, "
                 "ns array<long>, ss array<double>")


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
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        # state = EVERY island not yet provably closed, as parallel
        # arrays [start, last, n, Σvalue] sorted by start. Keeping the
        # non-newest islands in state (instead of emitting them the
        # trigger they appear, the pre-r04 behaviour) means a
        # within-watermark late event can still bridge two islands
        # that surfaced in the SAME trigger — the ADVICE r03 same-
        # trigger divergence. An island is emitted only once the
        # watermark passes island.last + gap, exactly the closure rule
        # event-time semantics promise.
        islands: list[list] = []
        if state.exists:
            st = state.get
            islands = [list(t) for t in zip(st[0], st[1], st[2], st[3])]

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            ts = _micros(rows["ts"].dt.as_unit("us")).to_numpy()
            order = ts.argsort(kind="stable")
            ts = ts[order]
            vals = rows["value"].to_numpy()[order]
            # Arbitrary stateful ops do NOT drop late rows for us — an
            # event older than the watermark (even older than every
            # kept island) can land here. Run gaps-and-islands over
            # {kept islands} ∪ {events}: late events extend starts,
            # merge islands, or form their own island exactly as the
            # sorted batch twin would. Residual divergence bound: only
            # an event that would have bridged a session ALREADY
            # emitted in an earlier trigger (watermark past its close)
            # diverges — inherent to append-mode streaming.
            items = islands + [[int(t), int(t), 1, float(v)]
                               for t, v in zip(ts, vals)]
            items.sort(key=lambda x: (x[0], x[1]))
            islands = [items[0]]
            for it in items[1:]:
                cur = islands[-1]
                if it[0] - cur[1] <= gap_us:
                    cur[0] = min(cur[0], it[0])
                    cur[1] = max(cur[1], it[1])
                    cur[2] += it[2]
                    cur[3] += it[3]
                else:
                    islands.append(it)

        keep = []
        for isl in islands:
            if isl[1] + gap_us <= wm_us:
                out.append((user, isl[0], isl[1], isl[2], isl[3]))
            else:
                keep.append(isl)
        if keep:
            state.update((
                [k[0] for k in keep], [k[1] for k in keep],
                [k[2] for k in keep], [k[3] for k in keep]))
            # wake when the EARLIEST kept island becomes closable;
            # clamp to wm+1 — a timeout at/before the watermark kills
            # the query (INVALID_TIMEOUT_TIMESTAMP)
            earliest = min(k[1] for k in keep) + gap_us
            state.setTimeoutTimestamp(max(earliest // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()
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
