"""Segment × segment intersection counting — the line-layer overlay
the reference's sf stack gets from GEOS (`st_intersects` /
`st_intersection` on LINESTRING layers; C_Extract-from-sf-objects-
parallel.R clips line layers against buffers the same way), and the
road/trajectory-crossing primitive of any movement-data pipeline.

Spark-first plan (the classic PBSM / partition-based spatial-merge
join, Patel & DeWitt SIGMOD'96):

1. per segment: integer bbox, explode the ≤4 grid cells the bbox
   touches (segments are short relative to the cell pitch, so the
   fan-out is a bounded literal, not a data-dependent blow-up);
2. ONE equi join on the cell key (sid_a < sid_b, different entity) —
   the only shuffle, AQE-balanced, never a cartesian;
3. duplicate-elimination WITHOUT a distinct: a candidate pair is
   scored only in the cell that contains its REFERENCE POINT
   (max of the two bbox lower-left corners — a point guaranteed
   inside the bbox intersection, hence in exactly one shared cell).
   This is the textbook PBSM dedup; no second shuffle;
4. exact refinement with INTEGER cross products (coordinates are
   integer-valued, |cross| ≤ ~4e6, products ≤ ~2e13 ≪ 2^63): strict
   proper crossing ⟺ the endpoints of each segment straddle the
   other's supporting line (c1·c2 < 0 ∧ c3·c4 < 0). Touching /
   collinear overlap is excluded by definition — deterministic and
   engine-exact, no epsilon anywhere.

At 100 TB: cell pitch keys the shuffle, so co-located short segments
join locally; skewed hot cells are AQE-splittable because the
refinement is per-row; the reference-point rule keeps the join
output linear in true candidates (no post-hoc distinct shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_crossings"]


def segment_crossings(segs: DataFrame, cell: int = 256,
                      block: int = 2048) -> DataFrame:
    """Count strict proper crossings between segments of DIFFERENT
    entities. `segs` columns: sid (unique id), ent (entity id), and
    integer-valued endpoints x1, y1, x2, y2 (longs). Segments must be
    shorter than `cell` so a bbox touches ≤ 2 cells per axis (the
    explode is then a bounded ≤4 fan-out). Returns per-(block ×
    block)-metre tile of the pair REFERENCE POINT (bx, by, n_cross).
    """
    s = segs.select(
        "sid", "ent", "x1", "y1", "x2", "y2",
        F.least("x1", "x2").alias("xlo"), F.greatest("x1", "x2").alias("xhi"),
        F.least("y1", "y2").alias("ylo"), F.greatest("y1", "y2").alias("yhi"))
    s = (s.withColumn("_cx", F.explode(F.sequence(
            F.expr(f"xlo div {cell}"), F.expr(f"xhi div {cell}"))))
         .withColumn("_cy", F.explode(F.sequence(
            F.expr(f"ylo div {cell}"), F.expr(f"yhi div {cell}")))))
    a = s.select(*[F.col(c).alias(f"a_{c}") for c in
                   ("sid", "ent", "x1", "y1", "x2", "y2",
                    "xlo", "xhi", "ylo", "yhi")], "_cx", "_cy")
    b = s.select(*[F.col(c).alias(f"b_{c}") for c in
                   ("sid", "ent", "x1", "y1", "x2", "y2",
                    "xlo", "xhi", "ylo", "yhi")],
                 F.col("_cx").alias("_bcx"), F.col("_cy").alias("_bcy"))
    j = a.join(b, (F.col("_cx") == F.col("_bcx"))
               & (F.col("_cy") == F.col("_bcy"))
               & (F.col("a_sid") < F.col("b_sid"))
               & (F.col("a_ent") != F.col("b_ent")))
    # bbox overlap filter, then PBSM reference-point dedup
    j = j.filter((F.col("a_xlo") <= F.col("b_xhi"))
                 & (F.col("b_xlo") <= F.col("a_xhi"))
                 & (F.col("a_ylo") <= F.col("b_yhi"))
                 & (F.col("b_ylo") <= F.col("a_yhi")))
    rx = F.greatest("a_xlo", "b_xlo")
    ry = F.greatest("a_ylo", "b_ylo")
    j = (j.withColumn("rx", rx).withColumn("ry", ry)
         .filter((F.expr(f"rx div {cell}") == F.col("_cx"))
                 & (F.expr(f"ry div {cell}") == F.col("_cy"))))

    def cross(px, py, qx, qy, rx_, ry_):
        return ((F.col(qx) - F.col(px)) * (F.col(ry_) - F.col(py))
                - (F.col(qy) - F.col(py)) * (F.col(rx_) - F.col(px)))

    c1 = cross("a_x1", "a_y1", "a_x2", "a_y2", "b_x1", "b_y1")
    c2 = cross("a_x1", "a_y1", "a_x2", "a_y2", "b_x2", "b_y2")
    c3 = cross("b_x1", "b_y1", "b_x2", "b_y2", "a_x1", "a_y1")
    c4 = cross("b_x1", "b_y1", "b_x2", "b_y2", "a_x2", "a_y2")
    j = j.filter((c1 * c2 < 0) & (c3 * c4 < 0))
    return (j.groupBy(F.expr(f"rx div {block}").alias("bx"),
                      F.expr(f"ry div {block}").alias("by"))
            .agg(F.count(F.lit(1)).alias("n_cross")))
