"""Per-group geometric median — Weiszfeld iteration as a lazy plan.

The reference reduces each station's neighborhood with means and
minima (C_…R:118-125); the geometric median (the point minimizing the
sum of distances to a group's members) is the robust-statistics
sibling — the classic "where do we put the depot" reduction. There is
no closed form, so this is the engine's iterative-refinement pattern
(like the IVF quantizer's Lloyd steps): a FIXED number of Weiszfeld
updates, each one a broadcast join + aggregation, composed lazily so
the whole refinement is ONE Spark job when it materializes.

    est₀   = per-group mean
    estₖ₊₁ = Σ p·w / Σ w,   w = 1 / √(1 + |p − estₖ|²)

The +1 regularizer keeps the weight finite when the estimate lands
exactly on a member (the textbook 1/d blows up there) and makes the
update bit-reproducible across engines — the driver oracle unrolls
the same three iterations in SQL CTEs, DuckDB-side, and matches at
4 dp (only float accumulation order differs).

Scale notes (100 TB): the estimate table is one row per group —
always broadcast; each iteration shuffles the POINT side once on the
group key, and because every iteration groups by the same key,
Catalyst reuses the exchange. k iterations = k map-side-combinable
aggregations, no driver loop over data, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["geometric_median"]


def geometric_median(df: DataFrame, group: str = "gid",
                     x: str = "x", y: str = "y",
                     iters: int = 3) -> DataFrame:
    """One row per group: member count `n` and the Weiszfeld estimate
    (`med_x`, `med_y`) after `iters` updates from the group mean."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    pts = df.select(group, x, y)
    est = pts.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(x) / F.count(F.lit(1))).alias("ex"),
        (F.sum(y) / F.count(F.lit(1))).alias("ey"),
    )
    for _ in range(iters):
        j = pts.join(F.broadcast(est), group)
        dx = F.col(x) - F.col("ex")
        dy = F.col(y) - F.col("ey")
        w = F.lit(1.0) / F.sqrt(F.lit(1.0) + dx * dx + dy * dy)
        est = j.groupBy(group).agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(w * F.col(x)) / F.sum(w)).alias("ex"),
            (F.sum(w * F.col(y)) / F.sum(w)).alias("ey"),
        )
    return est.select(group, "n",
                      F.col("ex").alias("med_x"),
                      F.col("ey").alias("med_y"))
