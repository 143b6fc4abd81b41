"""Viewshed (terrain line-of-sight) — the raster family's `viewshed()`
op: which cells within a radius can an observer standing on the height
raster actually see?

Declarative line-walk, all integer, no iteration:

1. The R-disk around the observer is clipped out of the heights table
   (partition/file pruning does this for free on a spatially
   clustered layout — see operators/zorder.py) and broadcast.
2. Every target cell explodes over its DDA line samples t = 1..m−1
   (m = Chebyshev distance): sample t sits at
   P_t = O + sign·round(t·|d|/m), with round(k/m) computed as
   floor((2k + m)/(2m)) — exact for the positive integers involved, so
   a second engine reproduces every sampled cell bit-for-bit.
3. One broadcast equi join fetches each sample's height; a sample
   BLOCKS its target iff (h_P − h_obs)·m ≥ (h_T − h_obs)·t — the
   slope comparison cross-multiplied into exact int64 (t and m are
   both proportional to true distance along the ray, so the ratio
   test is the tangent test).
4. groupBy target: visible ⟺ no sample blocks. Adjacent cells (m=1)
   have no samples and are always visible. Cells absent from the
   raster never block (sparse na.rm semantics, like focal_stats).

Work is Σ_targets (m−1) ≤ (2R+1)²·R rows of pure Column arithmetic —
at 100 TB-scale rasters the disk clip bounds everything by R, not by
raster size, and nothing but the final per-target groupBy shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["viewshed"]


def viewshed(heights: DataFrame, ox: int, oy: int, radius: int,
             obs_height: int = 0, cx: str = "cx", cy: str = "cy",
             h: str = "h") -> DataFrame:
    """Per-cell visibility from the observer at grid cell (ox, oy)
    standing `obs_height` above the terrain. Returns every raster cell
    with Chebyshev distance 1..radius from the observer as
    (cx, cy, m, visible)."""
    cheb = F.greatest(F.abs(F.col(cx) - ox), F.abs(F.col(cy) - oy))
    disk = heights.select(cx, cy, h).filter(cheb <= radius)

    obs = disk.filter((F.col(cx) == ox) & (F.col(cy) == oy)) \
        .select((F.col(h) + obs_height).alias("h_obs"))
    tgt = (disk.filter(cheb > 0)
           .crossJoin(F.broadcast(obs))
           .withColumn("dx", F.col(cx) - ox)
           .withColumn("dy", F.col(cy) - oy)
           .withColumn("m", F.greatest(F.abs("dx"), F.abs("dy"))))

    steps = F.when(F.col("m") > 1,
                   F.sequence(F.lit(1), F.col("m") - 1)) \
        .otherwise(F.array().cast("array<int>"))
    ex = tgt.withColumn("t", F.explode_outer(steps))

    def _coord(origin: int, d: str):
        mag = F.floor((2 * F.col("t") * F.abs(d) + F.col("m"))
                      / (2.0 * F.col("m"))).cast("long")
        return origin + F.when(F.col(d) < 0, -1).otherwise(1) * mag

    ex = ex.withColumn("px", _coord(ox, "dx")) \
           .withColumn("py", _coord(oy, "dy"))
    samp = ex.join(
        F.broadcast(disk.select(F.col(cx).alias("px"),
                                F.col(cy).alias("py"),
                                F.col(h).alias("h_p"))),
        ["px", "py"], "left")
    blocked = ((F.col("h_p") - F.col("h_obs")) * F.col("m")
               >= (F.col(h) - F.col("h_obs")) * F.col("t"))
    return (samp.groupBy(cx, cy, "m")
            .agg((~F.coalesce(F.max(blocked), F.lit(False)))
                 .alias("visible")))
