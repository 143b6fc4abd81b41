"""Adaptive quadtree tiling — the skew-aware answer to the fixed
fishnet (geo/index.py hex cover, operators/zorder.py): cells split
until they hold ≤ `cap` points or hit `max_level`, so dense districts
get fine tiles and empty ocean stays coarse. This is the classic
adaptive spatial partitioner (PR quadtree; the same recursion behind
S2/H3 compaction and SedonaSQL's `ST_QuadTree` partitioning), and the
layout step a 100 TB spatial pipeline runs before writing balanced
partitions.

Spark-first design — the recursion is flattened into ONE declarative
pass, no driver loop:

- cells at every level nest exactly when the window halves cleanly
  (side_l = window >> l), so a point's level-l cell is
  (x div side_l, y div side_l) and ancestors are prefixes;
- per-level cell counts are monotone non-increasing down the chain
  (child ⊆ parent), so the quadtree leaf of a point is simply the
  SHALLOWEST level whose cell count is ≤ cap (or max_level) — a
  min-over-qualifying-levels, not an iterative split;
- the level×cell histogram is bounded by geometry (Σ_l 4^l rows,
  independent of data size), so the join back to points is a
  broadcast — the only shuffles are the histogram groupBy and the
  per-point min, both on keys Catalyst can combine map-side.

Reference parity: the reference fixes one grid for all of Alberta
(C_Extract-sf-R-parallel.R's single cell loop); this operator is the
scale-robust generalization the 10^12-image tier needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quadtree_leaves(points: DataFrame, window: int = 20000,
                    max_level: int = 5, cap: int = 50) -> DataFrame:
    """points(id, x, y) with integer coords in [0, window) →
    (lvl, cx, cy, side, n_points) — one row per OCCUPIED quadtree
    leaf. `window` must be divisible by 2**max_level so every level's
    integer side nests exactly."""
    if window % (1 << max_level):
        raise ValueError("window must be divisible by 2**max_level "
                         f"(got {window} / 2**{max_level})")
    lvls = points.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(max_level))).alias("lvl"),
        "x", "y")
    cells = lvls.select(
        "id", "lvl",
        F.expr(f"x div ({window} div shiftleft(1, lvl))").alias("cx"),
        F.expr(f"y div ({window} div shiftleft(1, lvl))").alias("cy"))
    hist = cells.groupBy("lvl", "cx", "cy").agg(
        F.count(F.lit(1)).alias("cnt"))
    qual = (cells.join(F.broadcast(hist), ["lvl", "cx", "cy"])
            .filter((F.col("cnt") <= cap) | (F.col("lvl") == max_level)))
    leaf = qual.groupBy("id").agg(F.min("lvl").alias("lvl"))
    return (cells.join(leaf, ["id", "lvl"])
            .groupBy("lvl", "cx", "cy")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .withColumn("side",
                        F.expr(f"{window} div shiftleft(1, lvl)")))
