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


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              left_ts: str = "ts", right_ts: str = "ts",
              payload: tuple[str, ...] = ("value",),
              suffix: str = "_asof",
              direction: str = "backward",
              tolerance_seconds: float | None = None) -> DataFrame:
    """For every left row: the matching right row of the same `on` key
    per `direction` —
    - "backward" (default): most recent right_ts ≤ left_ts,
    - "forward":  earliest right_ts ≥ left_ts,
    - "nearest":  whichever of the two is closer in time (ties →
      the backward match, pandas merge_asof convention).
    All inclusive. Returns all left columns plus `<p><suffix>` per
    payload column and `<right_ts><suffix>` (the matched timestamp);
    no match (or a match further than `tolerance_seconds` away) →
    nulls, left rows never drop. Right rows sharing an exact
    (key, right_ts) tie arbitrarily (the fixture timestamps are
    microsecond-unique; dedup first if yours are not)."""
    if direction == "nearest":
        back = asof_join(left, right, on, left_ts, right_ts, payload,
                         "_bwd", "backward", tolerance_seconds)
        fwd_in = back.withColumnRenamed(f"{right_ts}_bwd", "_bts")
        for p in payload:
            fwd_in = fwd_in.withColumnRenamed(f"{p}_bwd", f"_b_{p}")
        both = asof_join(fwd_in, right, on, left_ts, right_ts, payload,
                         "_fwd", "forward", tolerance_seconds)
        d_b = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_bts"))
        d_f = F.unix_micros(F.col(f"{right_ts}_fwd")) \
            - F.unix_micros(F.col(left_ts))
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

    lcols = left.columns
    l = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    for p in payload:
        l = l.withColumn(f"_p_{p}", F.lit(None).cast(right.schema[p].dataType))
    l = l.withColumn("_rts", F.lit(None).cast(right.schema[right_ts].dataType))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(p).alias(f"_p_{p}") for p in payload],
        F.col(right_ts).alias("_rts"),
    )
    for c in lcols:
        if c not in (on,):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))
    # right rows (side 0) sort BEFORE left probes at equal ts in both
    # directions → inclusive semantics; _rts breaks right-side ties
    # deterministically
    if direction == "backward":
        order = [F.col("_ats").asc(), F.col("_side").asc(),
                 F.col("_rts").asc()]
    elif direction == "forward":
        order = [F.col("_ats").desc(), F.col("_side").asc(),
                 F.col("_rts").desc()]
    else:
        raise ValueError(f"unknown direction {direction!r}")
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u
    for p in payload:
        filled = filled.withColumn(
            f"_f_{p}", F.last(F.col(f"_p_{p}"), ignorenulls=True).over(w))
    filled = filled.withColumn(
        "_f_ts", F.last(F.col("_rts"), ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    fresh = F.lit(True)
    if tolerance_seconds is not None:
        delta = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_f_ts"))
        if direction == "forward":
            delta = -delta
        fresh = F.col("_f_ts").isNotNull() & (delta / 1e6 <= tolerance_seconds)
    sel = [F.col(c) for c in lcols]
    for p in payload:
        sel.append(F.when(fresh, F.col(f"_f_{p}")).alias(f"{p}{suffix}"))
    sel.append(F.when(fresh, F.col("_f_ts")).alias(f"{right_ts}{suffix}"))
    return out.select(*sel)
