"""Linear referencing — snap points to a route polyline and measure
the along-track position (sf/PostGIS `st_line_locate_point`, the
chainage/milepost op of every road/pipeline/seismic-line workflow;
the reference's seismic-line buffers are exactly such routes).

Bit-reproducibility without any rounding: for a point p and segment
(a, b), t = clamp(dot(p−a, b−a) / |b−a|², 0, 1), the foot q = a + t·(b−a),
dist = √|p−q|², chainage = cumlen(segment) + t·seglen. Every step is a
single correctly-rounded IEEE op over identical inputs. The cumulative
length is a WINDOW SUM in segment order; note that window-sum
ACCUMULATION order still differs across engines (DuckDB uses a
segment tree), so cross-engine bit-parity of chainage additionally
needs exact (integer-valued) segment lengths — otherwise round the
chainage. t/dist/idx are bit-exact regardless.

Scale shape: ONE route is small (≤ thousands of segments) → broadcast;
the point side never shuffles, and the per-point argmin is a single
aggregation over a lexicographic struct MIN (dist, then segment idx —
deterministic ties), not a window — so the only shuffle is the final
groupBy on the point id at point-count cardinality. Many-route
matching reuses the cell-index candidate join (operators/range_join)
upstream; this module is the refinement kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["locate_points", "with_cumlen"]


def with_cumlen(segments: DataFrame, idx: str = "idx",
                x0: str = "x0", y0: str = "y0",
                x1: str = "x1", y1: str = "y1") -> DataFrame:
    """Attach seglen = √((x1−x0)² + (y1−y0)²) and cumlen = length of
    the route BEFORE this segment (ordered window sum — deterministic
    accumulation order on both engines)."""
    seglen = F.sqrt((F.col(x1) - F.col(x0)) * (F.col(x1) - F.col(x0))
                    + (F.col(y1) - F.col(y0)) * (F.col(y1) - F.col(y0)))
    w = Window.orderBy(idx).rowsBetween(Window.unboundedPreceding, -1)
    return segments.withColumn("seglen", seglen) \
        .withColumn("cumlen", F.coalesce(F.sum("seglen").over(w),
                                         F.lit(0.0)))


def locate_points(points: DataFrame, segments: DataFrame,
                  maxdist: float, pid: str = "pid",
                  x: str = "x", y: str = "y") -> DataFrame:
    """Snap every point within `maxdist` of the route to its nearest
    segment (ties → smaller segment idx). Returns
    (pid, idx, t, dist, chainage)."""
    seg = with_cumlen(segments)
    p = points.select(pid, x, y).crossJoin(F.broadcast(seg))
    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    len2 = dx * dx + dy * dy
    t = F.least(F.greatest(
        ((F.col(x) - F.col("x0")) * dx + (F.col(y) - F.col("y0")) * dy)
        / len2, F.lit(0.0)), F.lit(1.0))
    qx = F.col("x0") + t * dx
    qy = F.col("y0") + t * dy
    dist = F.sqrt((F.col(x) - qx) * (F.col(x) - qx)
                  + (F.col(y) - qy) * (F.col(y) - qy))
    cand = p.select(
        pid, "idx",
        t.alias("t"), dist.alias("dist"),
        (F.col("cumlen") + t * F.col("seglen")).alias("chainage"))
    best = cand.groupBy(pid).agg(
        F.min(F.struct("dist", "idx", "t", "chainage")).alias("b"))
    return (best.select(pid, "b.idx", "b.t", "b.dist", "b.chainage")
            .filter(F.col("dist") < maxdist))
