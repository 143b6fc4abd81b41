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

__all__ = ["trajectory_stats"]


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
