"""Integer-mass damped random walk over an arbitrary weighted edge
table — the shared kernel behind PageRank-style centrality
(plans/relational.q_pagerank_walk) and TextRank keyword scoring
(plans/textops.q_textrank). Public algorithm (Brin/Page 1998; Mihalcea
& Tarau 2004), engine-original formulation:

- ALL arithmetic is integer (start mass 10^6 per node; per-edge send =
  mass·c div tot; damping (85·in + 15·10^6) div 100), so N unrolled
  rounds replay EXACTLY in SQL — floor remainders evaporate
  identically on both engines and no float ever enters a comparison;
- each round is ONE edge join + ONE map-side-combinable grouped sum —
  the iterative-algorithm pattern (Lloyd IVF, Weiszfeld, BPE): driver
  orchestrates a constant number of rounds, data never collects;
- sink nodes (no out-edges) leak their damped mass by design —
  documented, identical on both engines.

Scale notes (100 TB graphs): the mass frame is one row per node; each
round shuffles edges once on src. Hot destination nodes are a grouped
SUM (map-side combinable); hot sources replicate with the usual salt
if needed. At a fixed round count the whole walk is a linear chain of
joins Catalyst pipelines normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["damped_walk", "BASE_MASS"]

BASE_MASS = 1_000_000


def damped_walk(edges: DataFrame, iters: int = 3,
                src: str = "src", dst: str = "dst",
                weight: str = "c") -> DataFrame:
    """Run `iters` damped integer-mass rounds over the weighted edge
    table; returns (node, mass). Nodes = every distinct src or dst."""
    g = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).alias("c"))
    tot = g.groupBy("src").agg(F.sum("c").alias("tot"))
    gt = g.join(tot, "src")
    nodes = (g.select(F.col("src").alias("node"))
             .unionByName(g.select(F.col("dst").alias("node"))).distinct())
    mass = nodes.withColumn("mass", F.lit(BASE_MASS).cast("long"))
    for _ in range(iters):
        inc = (gt.join(mass, gt.src == mass.node)
               .select(F.col("dst").alias("node"),
                       F.expr("mass * c div tot").alias("send"))
               .groupBy("node").agg(F.sum("send").alias("inc")))
        mass = (nodes.join(inc, "node", "left")
                .select("node",
                        F.expr(f"(85 * coalesce(inc, 0L) + 15 * {BASE_MASS})"
                               " div 100").alias("mass")))
    return mass
