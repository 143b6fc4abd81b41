"""As-of (point-in-time) join — the temporal proximity join Spark has
no native operator for, and the backbone of leakage-free training-data
assembly (each example joins the LATEST feature row at or before its
timestamp, never a future one). Backward (the leakage-free default),
forward, and nearest directions, pandas-merge_asof-compatible.

Spark-first shape: tag both sides, UNION, one window over
(key, ts, side) with last(..., ignorenulls) filling each probe row
from the most recent right row at or before it — ONE shuffle on the
key, pure JVM window functions, no Python, no range explosion. This
is the classic sorted-merge as-of expressed declaratively; Catalyst
plans the union + window as a single sort per partition.

Scale notes (100 TB): the shuffle key is the join key (entity id) —
the same key any feature store shards by; per-key data is
time-sorted once; skewed keys take the usual salting/AQE mitigations.
A tolerance bound keeps stale matches out without a second pass
(the filled match timestamp rides along).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _micros(c):
    """Micros-since-epoch for TIMESTAMP or TIMESTAMP_NTZ operands —
    unix_micros rejects NTZ, so cast first. Engine sessions pin
    spark.sql.session.timeZone=UTC (session.py), making the NTZ cast
    offset-free; only time DIFFERENCES are consumed downstream."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              left_ts: str = "ts", right_ts: str = "ts",
              payload: tuple[str, ...] = ("value",),
              suffix: str = "_asof",
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              tie_breaker: str | None = None) -> DataFrame:
    """For every left row: the matching right row of the same `on` key
    per `direction` —
    - "backward" (default): most recent right_ts ≤ left_ts,
    - "forward":  earliest right_ts ≥ left_ts,
    - "nearest":  whichever of the two is closer in time (ties →
      the backward match, pandas merge_asof convention).
    All inclusive. Returns all left columns plus `<p><suffix>` per
    payload column and `<right_ts><suffix>` (the matched timestamp);
    no match (or a match further than `tolerance_seconds` away) →
    nulls, left rows never drop.

    The match is ATOMIC: one right row supplies the timestamp and every
    payload value (a single struct rides the window fill), so a NULL
    payload on the matched row comes through as NULL instead of leaking
    an older row's value (ADVICE r04).

    Right rows sharing an exact (key, right_ts): pass `tie_breaker`
    (a right-side column, e.g. an event id) and the row with the
    GREATEST tie-breaker value wins, in every direction — reproducible
    on replayed data (VERDICT r04 #4). Without it ties resolve
    arbitrarily (fine for unique-timestamp feeds)."""
    if direction == "nearest":
        back = asof_join(left, right, on, left_ts, right_ts, payload,
                         "_bwd", "backward", tolerance_seconds, tie_breaker)
        fwd_in = back.withColumnRenamed(f"{right_ts}_bwd", "_bts")
        for p in payload:
            fwd_in = fwd_in.withColumnRenamed(f"{p}_bwd", f"_b_{p}")
        both = asof_join(fwd_in, right, on, left_ts, right_ts, payload,
                         "_fwd", "forward", tolerance_seconds, tie_breaker)
        d_b = _micros(F.col(left_ts)) - _micros(F.col("_bts"))
        d_f = _micros(F.col(f"{right_ts}_fwd")) - _micros(F.col(left_ts))
        use_b = F.col("_bts").isNotNull() & (
            F.col(f"{right_ts}_fwd").isNull() | (d_b <= d_f))
        sel = [F.col(c) for c in left.columns]
        for p in payload:
            sel.append(F.when(use_b, F.col(f"_b_{p}"))
                        .otherwise(F.col(f"{p}_fwd")).alias(f"{p}{suffix}"))
        sel.append(F.when(use_b, F.col("_bts"))
                    .otherwise(F.col(f"{right_ts}_fwd"))
                    .alias(f"{right_ts}{suffix}"))
        return both.select(*sel)

    assert "_rts" not in payload, "payload column named _rts collides"
    lcols = left.columns
    # ONE struct per right row = the atomic match record: timestamp +
    # every payload value from the SAME row. Probe rows carry a typed
    # NULL struct, so last(ignorenulls) skips probes but never skips a
    # right row whose payload happens to be NULL.
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_ts).alias("_rts"),
                 *[F.col(p) for p in payload]).alias("_r"),
        (F.col(tie_breaker) if tie_breaker is not None else F.lit(0))
        .alias("_tb"),
    )
    l = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    l = l.withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType))
    l = l.withColumn("_tb", F.lit(None).cast(r.schema["_tb"].dataType))
    for c in lcols:
        if c not in (on,):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))
    # right rows (side 0) sort BEFORE left probes at equal ts in both
    # directions → inclusive semantics; among tied right rows the
    # greatest tie_breaker sorts LAST, so the window fill picks it
    if direction == "backward":
        order = [F.col("_ats").asc(), F.col("_side").asc(),
                 F.col("_tb").asc()]
    elif direction == "forward":
        order = [F.col("_ats").desc(), F.col("_side").asc(),
                 F.col("_tb").asc()]
    else:
        raise ValueError(f"unknown direction {direction!r}")
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.withColumn("_f", F.last(F.col("_r"), ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    f_ts = F.col("_f").getField("_rts")
    fresh = F.lit(True)
    if tolerance_seconds is not None:
        delta = _micros(F.col(left_ts)) - _micros(f_ts)
        if direction == "forward":
            delta = -delta
        fresh = f_ts.isNotNull() & (delta / 1e6 <= tolerance_seconds)
    sel = [F.col(c) for c in lcols]
    for p in payload:
        sel.append(F.when(fresh, F.col("_f").getField(p)).alias(f"{p}{suffix}"))
    sel.append(F.when(fresh, f_ts).alias(f"{right_ts}{suffix}"))
    return out.select(*sel)
