"""Zonal statistics — aggregate a raster over vector zones, the
raster-family sibling the reference reaches via `extract()`-style
per-polygon summaries (C_Extract-from-sf-objects-parallel.R's whole
purpose is per-point-buffer footprint summaries; zonal stats is the
same reduction with the zone polygon, not the buffer, as the window).

Spark-first plan (SURVEY.md §2.4 raster↔vector row):

1. Each zone's bbox is exploded over the raster cells it covers —
   two `explode(sequence(...))` calls, pure Column arithmetic, so the
   fan-out is bounded by ceil(span/step)² per zone (guarded by
   `max_cells_per_zone` with a loud `raise_error`, the interval-join
   precedent: a silent 10⁶× explode is how 100 TB jobs die).
2. The cell-center-in-zone refinement runs BEFORE the join — a cheap
   predicate on the exploded rows, shrinking the join's build side.
3. One equi join on the packed cell key against the raster. With
   `broadcast_zones=True` (the common case: zones ≪ raster) the
   raster NEVER shuffles — the exploded zone-cell table broadcasts
   and the scan-side join + partial aggregation run map-side; the
   only shuffle is the final groupBy on zone_id, whose cardinality is
   the ZONE count, not the cell count.
4. LEFT join back to the zone table keeps empty zones with the
   reference's empty-group defaults (n_cells=0, sum 0, mean/max NULL
   — SURVEY §2 P9/A5).

The raster is sparse rows (cx, cy, v) — no dense array, no driver
materialization; at 100 TB the raster side is a parquet scan whose
partitioning survives untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zonal_stats", "zone_cells"]


def zone_cells(zones: DataFrame, step: float, *,
               zone_id: str = "fid",
               xmin: str = "rxmin", ymin: str = "rymin",
               xmax: str = "rxmax", ymax: str = "rymax",
               cx: str = "cx", cy: str = "cy",
               weighted: bool = False,
               max_cells_per_zone: int = 1 << 20) -> DataFrame:
    """Explode each zone bbox into the raster cells (grid pitch
    `step`) it covers. With `weighted=False` a cell belongs to the
    zone iff its CENTER lies inside (one row per (zone_id, cx, cy));
    with `weighted=True` every PARTIALLY covered cell is kept and the
    row carries `w` = the zone∩cell overlap AREA — the exactextract-
    style coverage weight (center sampling undercounts thin zones;
    area weighting is the classic fix). The AREA, not the fraction:
    with integer-valued zone bounds the area is an exact
    integer-valued double, so downstream SUMs stay order-free exact,
    while area/step² (step=25 ⇒ /625, not dyadic) would round and
    make every engine's sum order-dependent. Divide ONCE after
    aggregating. Degenerate/huge zones (> max_cells_per_zone covered
    cells) fail loudly instead of silently exploding the plan."""
    fx0 = F.floor(F.col(xmin) / step).cast("long")
    fx1 = F.floor(F.col(xmax) / step).cast("long")
    fy0 = F.floor(F.col(ymin) / step).cast("long")
    fy1 = F.floor(F.col(ymax) / step).cast("long")
    n_cells = (fx1 - fx0 + 1) * (fy1 - fy0 + 1)
    guarded = F.when(n_cells <= max_cells_per_zone, fx0).otherwise(
        F.raise_error(F.concat(
            F.lit(f"zonal_stats: zone covers > {max_cells_per_zone} "
                  "raster cells (zone_id="),
            F.col(zone_id).cast("string"),
            F.lit(") — raise max_cells_per_zone or coarsen step"))))
    z = zones.select(
        zone_id, xmin, ymin, xmax, ymax,
        F.explode(F.sequence(guarded, fx1)).alias(cx))
    z = z.select(
        zone_id, xmin, ymin, xmax, ymax, cx,
        F.explode(F.sequence(fy0, fy1)).alias(cy))
    if weighted:
        # overlap of [xmin,xmax]×[ymin,ymax] with the cell square —
        # exact when zone bounds and step are integer-valued
        ow = (F.least(F.col(xmax), (F.col(cx) + 1) * step)
              - F.greatest(F.col(xmin), F.col(cx) * step))
        oh = (F.least(F.col(ymax), (F.col(cy) + 1) * step)
              - F.greatest(F.col(ymin), F.col(cy) * step))
        return (z.withColumn("w", ow * oh)
                .filter(F.col("w") > 0)
                .select(zone_id, cx, cy, "w"))
    ctr_x = (F.col(cx) + 0.5) * step
    ctr_y = (F.col(cy) + 0.5) * step
    return z.filter(
        (F.col(xmin) <= ctr_x) & (ctr_x <= F.col(xmax)) &
        (F.col(ymin) <= ctr_y) & (ctr_y <= F.col(ymax))
    ).select(zone_id, cx, cy)


def zonal_stats(zones: DataFrame, raster: DataFrame, step: float, *,
                zone_id: str = "fid",
                xmin: str = "rxmin", ymin: str = "rymin",
                xmax: str = "rxmax", ymax: str = "rymax",
                cx: str = "cx", cy: str = "cy", value: str = "v",
                broadcast_zones: bool = True,
                weighted: bool = False,
                max_cells_per_zone: int = 1 << 20) -> DataFrame:
    """Per-zone raster aggregation. `weighted=False`: count / sum /
    mean / max of `raster`.`value` over the cells whose center falls
    inside each zone's bbox. `weighted=True`: exactextract-style —
    every partially covered cell contributes by its coverage
    (cov = Σarea/step², wsum = Σarea·v/step², wmean = Σarea·v/Σarea),
    which is what a thin zone needs (center sampling can miss it
    entirely). The sums run over exact integer-valued overlap AREAS
    and divide by step² ONCE at the end, so both engines aggregate
    order-free. Zones with no live raster cell keep the empty-group
    defaults."""
    zc = zone_cells(zones, step, zone_id=zone_id,
                    xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax,
                    cx=cx, cy=cy, weighted=weighted,
                    max_cells_per_zone=max_cells_per_zone)
    if broadcast_zones:
        zc = F.broadcast(zc)
    hits = zc.join(raster, [cx, cy])
    if weighted:
        s2 = float(step * step)
        agg = hits.groupBy(zone_id).agg(
            F.count(F.lit(1)).alias("n_cells"),
            (F.sum("w") / s2).alias("cov"),
            (F.sum(F.col("w") * F.col(value)) / s2).alias("wsum"),
            (F.sum(F.col("w") * F.col(value)) / F.sum("w")).alias("wmean"))
        return (zones.select(zone_id).join(agg, zone_id, "left")
                .select(zone_id,
                        F.coalesce("n_cells", F.lit(0)).alias("n_cells"),
                        F.coalesce("cov", F.lit(0.0)).alias("cov"),
                        F.coalesce("wsum", F.lit(0.0)).alias("wsum"),
                        "wmean"))
    agg = hits.groupBy(zone_id).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(value).alias("sum_v"),
        (F.sum(value).cast("double") / F.count(F.lit(1))).alias("mean_v"),
        F.max(value).alias("max_v"))
    return (zones.select(zone_id).join(agg, zone_id, "left")
            .select(zone_id,
                    F.coalesce("n_cells", F.lit(0)).alias("n_cells"),
                    F.coalesce("sum_v", F.lit(0)).alias("sum_v"),
                    "mean_v", "max_v"))
