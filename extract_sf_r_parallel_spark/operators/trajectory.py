"""Trajectory aggregation — per-entity GPS-track statistics.

The reference extracts per-location footprints from STATIC points
(C_…R:23-25: one x/y per survey station); the natural companion for
the graft's event stream is the moving-point view: order each
entity's pings by time and reduce the polyline they trace. This is
the standard telemetry/AIS/GPS rollup (path length, net displacement,
top speed) expressed as ONE keyed window + ONE aggregation — pure
JVM, no Python in the path.

Scale notes (100 TB): the only shuffle is the window/groupBy on the
entity key; both run at the same grain so Spark reuses the exchange.
Partial aggregation (map-side combine) applies to the final groupBy.
A single hot entity (fleet-tracker key holding 90 % of pings)
serializes one window sort — the same shape as the as-of join's hot
key, and the same mitigation applies: pre-split the timeline into
chunks and merge boundary segments (asof.py split_seconds shows the
carry construction); path/max/count are segment-local so the merge
is a trivial re-sum, unlike as-of's fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trajectory_stats", "stay_segments", "od_matrix"]


def trajectory_stats(df: DataFrame, key: str = "user_id",
                     ts: str = "ts", x: str = "x", y: str = "y",
                     tiebreak: str | None = None) -> DataFrame:
    """Per-`key` track statistics over pings ordered by (`ts`,
    `tiebreak`):

    - n_events:  ping count
    - path_len:  Σ segment lengths (metres)
    - net_disp:  straight-line first-ping → last-ping distance
    - max_seg:   longest single segment
    - dur_s:     last ts − first ts, seconds
    - avg_speed: path_len / dur_s (NULL when dur_s = 0)

    `tiebreak` makes the ordering total when timestamps repeat (pass a
    unique event id); without it, equal-ts segment pairing is
    nondeterministic and path_len may vary run to run.
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    wrev = Window.partitionBy(key).orderBy(
        *[c.desc() for c in
          ([F.col(ts)] + ([F.col(tiebreak)] if tiebreak else []))])

    dx = F.col(x) - F.lag(x).over(w)
    dy = F.col(y) - F.lag(y).over(w)
    seg = F.sqrt(dx * dx + dy * dy)
    t = (df
         .withColumn("_seg", seg)
         .withColumn("_rn", F.row_number().over(w))
         .withColumn("_rnd", F.row_number().over(wrev)))

    first = lambda c: F.max(F.when(F.col("_rn") == 1, F.col(c)))  # noqa: E731
    last = lambda c: F.max(F.when(F.col("_rnd") == 1, F.col(c)))  # noqa: E731
    ndx = last(x) - first(x)
    ndy = last(y) - first(y)
    dur = (F.unix_micros(last(ts).cast("timestamp"))
           - F.unix_micros(first(ts).cast("timestamp"))) / F.lit(1e6)
    path = F.sum("_seg")
    return t.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(path, F.lit(0.0)).alias("path_len"),
        F.sqrt(ndx * ndx + ndy * ndy).alias("net_disp"),
        F.max("_seg").alias("max_seg"),
        dur.alias("dur_s"),
        F.when(dur > 0, path / dur).alias("avg_speed"),
    )


def stay_segments(df: DataFrame, jump: float, min_pts: int = 2,
                  min_dur_s: float = 0.0, key: str = "user_id",
                  ts: str = "ts", x: str = "x", y: str = "y",
                  tiebreak: str | None = None) -> DataFrame:
    """Trajectory SEGMENTATION by spatial jump + STAY-POINT detection —
    the movement-analytics op (scikit-mobility `stay_locations`, the
    stop/move split of Spaccapietra's trajectory model): break each
    entity's ping sequence wherever the Chebyshev step to the previous
    ping exceeds `jump` metres, then call a segment a STAY when it
    holds ≥ `min_pts` pings spanning ≥ `min_dur_s` seconds.

    The predicate is the CONSECUTIVE-step test (break when the next
    ping leaves a `jump` box around the PREVIOUS ping), which is
    window-expressible: lag → break flag → running-sum segment id —
    two passes over ONE keyed window, no iteration. (The
    anchor-radius variant — distance to the segment's FIRST point —
    needs a sequential scan and lives in streaming sessionization
    territory; this is the standard batch approximation.)

    Chebyshev (max |dx|,|dy|) keeps the comparison exact on
    integer-valued coordinates — no sqrt in the PREDICATE, so the
    segmentation itself is bit-deterministic across engines.

    Returns per entity: n_segs, n_stays, stay_pts (Σ pings inside
    stays), stay_dur_s (Σ stay durations, exact microsecond integer
    arithmetic ÷ 1e6 — one IEEE division).

    Scale: identical shuffle story to trajectory_stats — one keyed
    window, then a groupBy at the same grain (exchange reuse); hot
    entities split-and-merge the same way."""
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    step = F.greatest(F.abs(F.col(x) - F.lag(x).over(w)),
                      F.abs(F.col(y) - F.lag(y).over(w)))
    brk = F.when(step.isNull() | (step > jump), 1).otherwise(0)
    segd = (df.withColumn("_brk", brk)
            .withColumn("_seg", F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    per_seg = (segd.groupBy(key, "_seg")
               .agg(F.count(F.lit(1)).alias("n_pts"),
                    (F.unix_micros(F.max(ts).cast("timestamp"))
                     - F.unix_micros(F.min(ts).cast("timestamp")))
                    .alias("dur_us")))
    # duration stays an INTEGER microsecond count until the very last
    # step — summing per-segment double seconds would make the result
    # accumulation-order-dependent and break cross-engine parity
    is_stay = ((F.col("n_pts") >= min_pts)
               & (F.col("dur_us") >= int(min_dur_s * 1e6)))
    return (per_seg.groupBy(key)
            .agg(F.count(F.lit(1)).alias("n_segs"),
                 F.count(F.when(is_stay, 1)).alias("n_stays"),
                 F.sum(F.when(is_stay, F.col("n_pts")).otherwise(0))
                 .alias("stay_pts"),
                 (F.sum(F.when(is_stay, F.col("dur_us")).otherwise(0))
                  / F.lit(1e6)).alias("stay_dur_s")))


def od_matrix(df: DataFrame, key: str = "user_id",
              ts: str = "ts", tx: str = "tx", ty: str = "ty",
              tiebreak: str | None = None) -> DataFrame:
    """ORIGIN–DESTINATION flow matrix (r07) — the transport-planning /
    mobility rollup (OD matrices are the primary product of every
    telco/floating-car-data pipeline): bucket pings to `tile`-metre
    grid cells, take each entity's consecutive tile transitions in
    time order, and count flows per (from-tile → to-tile) pair,
    SELF-LOOPS EXCLUDED (staying in a tile is not a trip).

    Input must already carry INTEGER tile coords (`tx`, `ty`) — keep
    the div-by-pitch upstream where the caller controls trunc-vs-floor
    on negatives. One keyed window (lag) + one groupBy on the tile
    pair; n_users is the distinct-entity count per flow (corridor
    reach, not just volume)."""
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    t = (df.select(key, ts, tx, ty,
                   *([tiebreak] if tiebreak else []))
         .withColumn("_fx", F.lag(tx).over(w))
         .withColumn("_fy", F.lag(ty).over(w))
         .filter(F.col("_fx").isNotNull()
                 & ((F.col("_fx") != F.col(tx))
                    | (F.col("_fy") != F.col(ty)))))
    return (t.groupBy(F.col("_fx").alias("from_tx"),
                      F.col("_fy").alias("from_ty"),
                      F.col(tx).alias("to_tx"),
                      F.col(ty).alias("to_ty"))
            .agg(F.count(F.lit(1)).alias("n_trips"),
                 F.countDistinct(key).alias("n_users")))
