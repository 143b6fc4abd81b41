"""Grid-density spatial clustering — DBSCAN's grid-relaxation (the
scalable formulation: CLIQUE/GriDBSCAN family): snap points to a cell
grid, call a cell *core* when it holds ≥ min_pts points, connect core
cells that touch (8-neighbourhood), and label each connected patch of
core cells a cluster. The reference's fishnet + per-cell point counts
(C_Extract-from-sf-objects-parallel.R's cell loop) is the first stage;
the graph stage reuses the engine's large-star/small-star connected
components (operators/dedup.py) — O(log n) shuffle rounds over cell
ids only, never over points.

Why grid-relaxed and not classic point-DBSCAN: the ε-neighbour graph
over points is O(n·k) edges and data-dependent; the core-cell graph is
bounded by the occupied-cell count (orders of magnitude smaller than
the point count at any density worth clustering), so the CC stage's
shuffles are tiny no matter how many points a 100 TB scan holds. The
per-point work is one cell assignment + one groupBy — the same
partial-aggregating shuffle as tile_counts.

Cell keys pack (cx, cy) into one BIGINT via (cx + 2^20)·2^21 +
(cy + 2^20) — plain multiply/add (no bit tricks) so an oracle can
replay it verbatim; valid for |coord| < 2^20 cells, asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components_star

__all__ = ["grid_cluster", "cell_key"]

_OFF = 1 << 20
_K = 1 << 21


def cell_key(cx, cy):
    """Pack a (possibly negative) cell coordinate pair into one
    BIGINT: (cx + 2^20)·2^21 + (cy + 2^20)."""
    return ((cx + _OFF) * _K + (cy + _OFF)).cast("long")


def _local_components(edge_rows) -> list[tuple[int, int]]:
    """Driver-local union-find over a collected edge list, labelling
    every node with its component's MINIMUM id — the same label rule
    as connected_components_star, so the two paths are
    interchangeable."""
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        r = a
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[a] != r:          # path compression
            parent[a], a = r, parent[a]
        return r

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return [(n, find(n)) for n in parent]


def grid_cluster(points: DataFrame, x: str = "x", y: str = "y",
                 cell: float = 625.0, min_pts: int = 20,
                 cc: str = "auto",
                 local_max_edges: int = 2_000_000) -> DataFrame:
    """Cluster the density surface of `points`: returns one row per
    cluster — (cluster: min packed cell key, n_cells, n_points,
    min/max cell coords). Non-core cells are noise and appear in no
    cluster (classic DBSCAN border handling at grid granularity).

    The core-cell graph is bounded by the OCCUPIED-CELL count, which
    is orders of magnitude below the point count at any density worth
    clustering — so even a 100 TB point scan usually yields a graph
    that fits on the driver. `cc` picks the component engine:
    "local" collects the edges and runs a min-label union-find (one
    tiny transport, the same envelope pattern as
    similarity.embedding_top_k); "star" runs the distributed
    large-star/small-star contraction (operators/dedup.py) with no
    driver materialization; "auto" counts edges (one ids-only job)
    and picks local under `local_max_edges`, star above."""
    cx = F.floor(F.col(x) / cell).cast("long")
    cy = F.floor(F.col(y) / cell).cast("long")
    # the packed key is only injective for |coord| < 2^20 cells — an
    # out-of-range cell would silently collide into a wrong cluster
    # key, so fail loudly instead (same guard style as
    # intervals.interval_join's replication bound)
    in_range = (F.abs(cx) < _OFF) & (F.abs(cy) < _OFF)
    guard = F.when(in_range, cx).otherwise(F.raise_error(F.concat(
        F.lit("grid_cluster: cell coordinate out of packable range "
              "(|coord| >= 2^20) at point ("),
        F.col(x).cast("string"), F.lit(", "),
        F.col(y).cast("string"),
        F.lit(f") with cell={cell}; use a coarser cell or re-origin "
              "the coordinates"))))
    counts = (points.select(guard.alias("cx"), cy.alias("cy"))
              .groupBy("cx", "cy")
              .agg(F.count(F.lit(1)).alias("n")))
    core = (counts.filter(F.col("n") >= min_pts)
            .withColumn("key", cell_key(F.col("cx"), F.col("cy"))))

    # core-cell adjacency: scatter each core cell onto its 9-cell
    # neighbourhood (literal offset explode, one fan-out — the same
    # stencil trick as operators/focal.py) and equi-join the targets
    # back against the core set; key inequality keeps each undirected
    # edge once. The join is on the packed key — a plain equi join the
    # optimizer can broadcast when the core set is small.
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if not (dx == 0 and dy == 0)])
    halo = (core.select("key", "cx", "cy")
            .withColumn("_o", F.explode(offs))
            .select(F.col("key").alias("id_a"),
                    cell_key(F.col("cx") + F.col("_o.dx"),
                             F.col("cy") + F.col("_o.dy")).alias("id_b")))
    edges = (halo.join(core.select(F.col("key").alias("id_b")), "id_b")
             .filter(F.col("id_a") < F.col("id_b")))

    if cc not in ("auto", "local", "star"):
        raise ValueError(f"cc must be auto|local|star, got {cc!r}")
    use_local = cc == "local"
    if cc == "auto":
        # one ids-only count; the star path would spend a comparable
        # job sizing its round budget anyway
        edges = edges.localCheckpoint(eager=True)
        use_local = edges.count() <= local_max_edges
    if use_local:
        spark = points.sparkSession
        rows = _local_components(
            [(r.id_a, r.id_b) for r in edges.collect()])
        schema = "key long, component long"
        labels = spark.createDataFrame(rows or [], schema)
    else:
        labels = connected_components_star(edges) \
            .withColumnRenamed("id", "key")
    labelled = (core.join(labels, "key", "left")
                .withColumn("cluster",
                            F.coalesce("component", F.col("key"))))
    return (labelled.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("n").alias("n_points"),
                 F.min("cx").alias("min_cx"), F.max("cx").alias("max_cx"),
                 F.min("cy").alias("min_cy"), F.max("cy").alias("max_cy")))
