"""Custom stateful streaming operator #2: GEOFENCE transition alerts.

The streaming×geospatial marriage the graft exists for: a live ping
stream (user_id, ts, x, y) against a static fence set, emitting one
row per enter/exit TRANSITION — the alerting primitive (arrived at
site, left the depot). Not expressible with built-in windowed aggs:
a transition depends on the PREVIOUS ping in event-time order, and
late pings can rewrite what "previous" means, so the operator buffers
per-user pings in state and finalizes them only when the watermark
passes their timestamp — the sessionizer's buffer-until-provable
pattern (streaming/sessions.py) with a different reduction.

Semantics (shared with the batch twin, which the driver oracle
replays in SQL): pings ordered by (ts, event_id) per user; emit
'enter' when inside flips 0→1 (or the user's FIRST ping is inside),
'exit' on 1→0.

Scale shape: state per user = one byte of truth (last finalized
inside/outside) + the not-yet-final ping buffer, whose length is
bounded by the watermark delay × ping rate; the shuffle key is
user_id. The containment flag is computed STATELESS before the
keyed op — here a vectorized pandas UDF over a broadcast fence table
(fine for fence sets that fit an executor, the usual case); at
millions of fences use the cell-index join (operators/overlay.py
machinery) to attach the flag instead — the stateful operator is
agnostic to how `inside` was derived.

A user idle forever keeps its 1-row state (no timeout is set without
buffered pings); a production deployment would expire idle keys with
a processing-time timeout — omitted here to keep event-time semantics
exact.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["with_inside", "geofence_stream", "geofence_batch",
           "GEOFENCE_SCHEMA"]

GEOFENCE_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("kind", T.StringType()),
])

_STATE_SCHEMA = ("last long, tss array<long>, eids array<long>, "
                 "ins array<long>")


def with_inside(df: DataFrame, fences: pd.DataFrame,
                x: str = "x", y: str = "y",
                buffer: float = 0.0, out: str = "inside") -> DataFrame:
    """Adds `out` = 1 when (x, y) lies within `buffer` of any fence
    rectangle (closed bounds), else 0. Vectorized over Arrow batches;
    the fence table rides in the UDF closure (broadcast once per
    executor)."""
    x0 = fences["rxmin"].to_numpy(np.float64) - buffer
    x1 = fences["rxmax"].to_numpy(np.float64) + buffer
    y0 = fences["rymin"].to_numpy(np.float64) - buffer
    y1 = fences["rymax"].to_numpy(np.float64) + buffer

    @F.pandas_udf(T.IntegerType())
    def _in(xs: pd.Series, ys: pd.Series) -> pd.Series:
        X = xs.to_numpy(np.float64)[:, None]
        Y = ys.to_numpy(np.float64)[:, None]
        hit = ((X >= x0) & (X <= x1) & (Y >= y0) & (Y <= y1)).any(axis=1)
        return pd.Series(hit.astype(np.int32))

    return df.withColumn(out, _in(F.col(x), F.col(y)))


def geofence_stream(stream: DataFrame,
                    watermark: str = "1 hour") -> DataFrame:
    """stream(ts, user_id, event_id, inside, …) → transition rows.
    Pings are buffered per user and finalized strictly in (ts,
    event_id) order once the watermark passes their ts — so a
    within-watermark late ping lands in its true position and the
    emitted transitions match the batch twin exactly. (A ping older
    than the watermark after its region was finalized folds in at the
    current head — the same inherent append-mode bound the
    sessionizer documents.)"""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        last = -1
        buf: list[tuple[int, int, int]] = []
        if state.exists:
            st = state.get
            last = int(st[0])
            buf = [(int(a), int(b), int(c))
                   for a, b, c in zip(st[1], st[2], st[3])]
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            ts = rows["ts"].dt.as_unit("us").astype("int64").to_numpy()
            eid = rows["event_id"].astype("int64").to_numpy()
            ins = rows["inside"].astype("int64").to_numpy()
            buf += list(zip(ts.tolist(), eid.tolist(), ins.tolist()))
        buf.sort()
        out, keep = [], []
        for t, e, i in buf:
            if t < wm_us:
                if (last == -1 and i == 1) or (last >= 0 and i != last):
                    out.append((user, t, e, "enter" if i else "exit"))
                last = i
            else:
                keep.append((t, e, i))
        if keep or last >= 0:
            state.update((last,
                          [k[0] for k in keep],
                          [k[1] for k in keep],
                          [k[2] for k in keep]))
        if keep:
            # wake once the earliest buffered ping becomes final;
            # never at/before the current watermark (invalid timeout)
            wm_ms = wm_us // 1000
            state.setTimeoutTimestamp(
                max(keep[0][0] // 1000 + 1, wm_ms + 1))
        if out:
            pdf = pd.DataFrame(
                out, columns=["user_id", "t", "event_id", "kind"])
            pdf["ts"] = pd.to_datetime(pdf["t"], unit="us")
            yield pdf[[f.name for f in GEOFENCE_SCHEMA.fields]]

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, GEOFENCE_SCHEMA, _STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout)
    )


def geofence_batch(df: DataFrame) -> DataFrame:
    """Deterministic batch twin over (user_id, ts, event_id, inside):
    LAG in (ts, event_id) order, keep flips (first ping emits only
    when inside)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("inside").over(w)
    d = df.withColumn("_prev", prev)
    keep = ((F.col("_prev").isNull() & (F.col("inside") == 1))
            | (F.col("_prev").isNotNull()
               & (F.col("_prev") != F.col("inside"))))
    return (d.filter(keep)
            .withColumn("kind", F.when(F.col("inside") == 1,
                                       F.lit("enter")).otherwise("exit"))
            .select("user_id", "ts", "event_id", "kind"))
