"""kNN-over-ring-expansion (north-star operator): uncapped k-nearest
features per point, found by doubling the search radius until every
point has k candidates — the distributed generalization of the
reference's single-nearest capped search (C_…R:112-117, k=1,
fixed radius).

Soundness: if a point has ≥ k candidates with dist < r, then every
non-candidate feature has dist ≥ r > kth-candidate distance, so the
k smallest candidate distances ARE the true kNN. Points that fail get
retried at 2r (new Spark job per round — a handful of rounds, since
radius doubles; each round's join is the standard cell-indexed range
join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .range_join import range_join_pairs

__all__ = ["knn_join"]


def knn_join(
    points: DataFrame,
    polys: DataFrame,
    k: int = 1,
    r0: float = 1000.0,
    max_radius: float = 64000.0,
    point_id: str = "PKEY",
    feature_id: str = "feature_id",
    broadcast_polys: bool = False,
) -> DataFrame:
    """Returns (point_id, rk, feature_id, dist), rk ∈ 1..k (fewer rows
    if the whole dataset has < k features in range max_radius)."""
    remaining = points
    done: DataFrame | None = None
    r = r0
    while True:
        pairs = range_join_pairs(
            remaining.select(point_id, "x", "y"), polys, r,
            broadcast_polys=broadcast_polys,
        )
        w = Window.partitionBy(point_id).orderBy(F.col("dist"), F.col(feature_id))
        ranked = (
            # prune before the rank shuffle: 3 columns, not the pair row
            pairs.select(point_id, feature_id, "dist")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(point_id, "rk", feature_id, "dist")
        )
        if r >= max_radius:
            done = ranked if done is None else done.unionByName(ranked)
            break
        counts = ranked.groupBy(point_id).agg(F.max("rk").alias("_nk"))
        solved = ranked.join(
            counts.filter(F.col("_nk") >= k).select(point_id), point_id, "semi")
        done = solved if done is None else done.unionByName(solved)
        remaining = remaining.join(
            counts.filter(F.col("_nk") >= k).select(point_id), point_id, "anti")
        if remaining.isEmpty():
            break
        r *= 2.0
    return done
