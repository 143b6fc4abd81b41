"""Raster focal statistics + tile-pyramid rollup — the raster-algebra
siblings of the reference's fishnet loop (C_Extract-from-sf-objects-
parallel.R builds per-cell point counts; the R raster family's
`focal()` then smooths such grids with a moving window, and web-map
pipelines roll cell stats up a zoom pyramid). Both are expressed as
pure Column arithmetic over sparse (cell_x, cell_y, value) rows — no
dense array ever materializes, which is what makes them 100 TB ops:

- focal_stats: scatter each cell's value onto its (2r+1)² Chebyshev
  neighbourhood via one `explode(offsets)` (a 9× row fan-out for r=1,
  NOT a self-join — the offset table is a literal array, so the only
  shuffle is the final groupBy on the target cell, and map-side
  partial aggregation collapses the fan-out before it ships anywhere
  because neighbouring source cells land in the same scan partition
  under any spatially clustered layout — see operators/zorder.py).
  Semantics match R `focal(..., na.rm=TRUE)` on a sparse raster:
  absent cells contribute nothing, and only cells present in the
  input emit a row (inner join back to the input keys).

- pyramid_rollup: per-zoom `floor(cell / 2^(z_top - z))` re-keying,
  one groupBy per level, unioned — the slippy-map tile pyramid as a
  single declarative plan. Each level's shuffle is strictly smaller
  than the last; at scale the partial aggregation for level z feeds
  level z-1 within the same AQE-planned stage chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["focal_stats", "pyramid_rollup", "hillshade", "flow_d8",
           "flow_dirs", "flow_accum", "dist_transform", "cost_distance",
           "nms_peaks", "upsample2", "mode_resample", "moran_i",
           "raster_equalize", "contour_cases"]


def focal_stats(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
                value: str = "value", radius: int = 1) -> DataFrame:
    """Moving-window stats over a sparse integer raster: for every cell
    present in `cells`, aggregate `value` over the present cells of its
    (2·radius+1)² Chebyshev neighbourhood (self included). Returns the
    input keys plus focal_n / focal_sum / focal_mean / focal_max.

    Cells must be unique on (x, y) — the scatter assumes one source row
    per cell (pre-aggregate upstream otherwise)."""
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ])
    scattered = (
        cells.select(x, y, value)
        .withColumn("_o", F.explode(offs))
        .select((F.col(x) + F.col("_o.dx")).alias(x),
                (F.col(y) + F.col("_o.dy")).alias(y),
                F.col(value))
        .groupBy(x, y)
        .agg(F.count(F.lit(1)).alias("focal_n"),
             F.sum(value).alias("focal_sum"),
             (F.sum(value) / F.count(F.lit(1))).alias("focal_mean"),
             F.max(value).alias("focal_max"))
    )
    # scatter emits target cells that hold no source cell (the halo
    # around the occupied region) — keep only real cells, and carry
    # the cell's own value through for downstream use
    return cells.join(scattered, [x, y])


def pyramid_rollup(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
                   value: str = "value", levels: int = 4) -> DataFrame:
    """Roll a base raster up a power-of-two tile pyramid: level 0 is
    the input grid, level z re-keys each cell to floor(coord / 2^z) and
    sums `value` — the zoom-out aggregation every tile server runs.
    Returns (level, cell_x, cell_y, n_cells, total) for all levels,
    level 0 included (n_cells there counts base cells, i.e. 1 each
    pre-aggregated input row)."""
    out = None
    for z in range(levels):
        s = 1 << z
        lvl = (
            cells.groupBy(
                F.floor(F.col(x) / s).cast("long").alias(x),
                F.floor(F.col(y) / s).cast("long").alias(y))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum(value).alias("total"))
            .select(F.lit(z).alias("level"), x, y, "n_cells", "total")
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


def hillshade(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
              value: str = "value",
              light: tuple[int, int, int] = (2, 3, 6),
              block: int = 25) -> DataFrame:
    """Lambertian hillshade over a sparse height raster — the terrain
    rendering/analysis op of the R raster family (`hillShade()`),
    kept bit-reproducible across engines:

    - central differences gx = h(x+1,y) − h(x−1,y) (gy mirrored) via
      the SCATTER plan: each cell emits its ±value to the 4 stencil
      targets in one literal explode, ONE groupBy — no self-join; a
      target is interior iff all 4 contributions arrive (n = 4),
      matching the dense stencil exactly on a sparse table;
    - shade = (−lx·gx − ly·gy + 2·lz) / (|L|·sqrt(gx² + gy² + 4)).
      The default light (2,3,6) has |L| = 7 EXACTLY, the numerator is
      an exact integer-valued double, and sqrt/× /÷ are each single
      correctly-rounded IEEE ops — so two engines agree to the last
      bit with no rounding step;
    - per-(block × block) tile summary: n_interior, min/max shade.
      Min/max (order-free) rather than a float SUM, which would be
      accumulation-order-dependent and break cross-engine parity.
    """
    lx, ly, lz = light
    offs = F.array(
        F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit(-1).alias("gx"), F.lit(0).alias("gy")),
        F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit(1).alias("gx"), F.lit(0).alias("gy")),
        F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy"),
                 F.lit(0).alias("gx"), F.lit(-1).alias("gy")),
        F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy"),
                 F.lit(0).alias("gx"), F.lit(1).alias("gy")),
    )
    # source cell c contributes to target t = c − d with coefficient
    # +g (so that at t, the sum collects h(t+d)·g over the stencil)
    scattered = (
        cells.select(x, y, value)
        .withColumn("_o", F.explode(offs))
        .select((F.col(x) - F.col("_o.dx")).alias(x),
                (F.col(y) - F.col("_o.dy")).alias(y),
                (F.col("_o.gx") * F.col(value)).alias("_gx"),
                (F.col("_o.gy") * F.col(value)).alias("_gy"))
        .groupBy(x, y)
        .agg(F.count(F.lit(1)).alias("_n"),
             F.sum("_gx").alias("gx"), F.sum("_gy").alias("gy"))
        .filter(F.col("_n") == 4)
    )
    norm = float(_exact_norm(lx * lx + ly * ly + lz * lz))
    shade = ((-lx * F.col("gx") - ly * F.col("gy") + 2 * lz)
             / (norm * F.sqrt(F.col("gx") * F.col("gx")
                              + F.col("gy") * F.col("gy") + 4.0)))
    shaded = scattered.join(cells.select(x, y), [x, y]) \
        .withColumn("shade", shade)
    return (shaded.groupBy(
                F.floor(F.col(x) / block).cast("long").alias("bx"),
                F.floor(F.col(y) / block).cast("long").alias("by"))
            .agg(F.count(F.lit(1)).alias("n_interior"),
                 F.min("shade").alias("min_shade"),
                 F.max("shade").alias("max_shade")))


def _exact_norm(v: int) -> float:
    """sqrt of a small int; raises if the norm is not exact — the
    bit-reproducibility contract requires an exactly representable
    |L| (e.g. (2,3,6) → 7, (1,2,2) → 3, Pythagorean quadruples)."""
    r = int(v ** 0.5)
    if r * r != v:
        raise ValueError(
            f"hillshade: |light|² = {v} is not a perfect square; pick a "
            "Pythagorean-quadruple light vector (e.g. (2,3,6) or (1,2,2)) "
            "so the normalization is exact across engines")
    return float(r)


# (dx, dy, dist², direction code) — D8 codes clockwise from East.
_D8 = [
    (1, 0, 1, 1), (1, 1, 2, 2), (0, 1, 1, 3), (-1, 1, 2, 4),
    (-1, 0, 1, 5), (-1, -1, 2, 6), (0, -1, 1, 7), (1, -1, 2, 8),
]


def flow_dirs(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
              value: str = "value") -> DataFrame:
    """D8 flow direction — hydrology's first derivative of a DEM
    (R raster/terra `terrain(opt="flowdir")`): each interior cell
    drains toward the steepest-descent neighbour among its 8, slope =
    drop / distance with distance ∈ {1, √2}; cells with no positive
    drop are pits/flats (code 0). Returns per-(block × block) tile
    counts by direction code — the drainage-pattern summary.

    Cross-engine determinism: drops are integer-valued doubles,
    √2 and the division are each one correctly-rounded IEEE op, so
    both engines compare IDENTICAL doubles; ties broken by the
    smallest direction code on both sides (max over (slope, −dir)
    here, `ORDER BY s DESC, dir` in the oracle).

    Plan: one literal 9-offset explode re-keys every cell onto the
    targets it neighbours PLUS itself (the dir-0 self-emission
    carries the centre height, so no self-join and no big sort ever
    happens), then ONE groupBy resolves the argmax with four
    primitive aggregates (count, centre height, per-distance-class
    packed (nv, dir) minima) — per-cell partial state is 4 longs
    regardless of raster size, map-side combinable, and the only
    shuffle is the scatter's. Only targets receiving all 9
    contributions emit (interior cells; the sparse edge never
    produces a half-windowed direction)."""
    offs = F.array(*([
        F.struct(F.lit(0).alias("dx"), F.lit(0).alias("dy"),
                 F.lit(0).alias("k"), F.lit(0).alias("dir"))] + [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(k).alias("k"), F.lit(d).alias("dir"))
        for dx, dy, k, d in _D8]))
    scattered = (
        cells.select(x, y, value)
        .withColumn("_o", F.explode(offs))
        .select((F.col(x) - F.col("_o.dx")).alias(x),
                (F.col(y) - F.col("_o.dy")).alias(y),
                F.col("_o.k").alias("_k"), F.col("_o.dir").alias("_dir"),
                F.col(value).alias("_nv")))
    # r08 (guide §2.3 "aggregate before you shuffle"): the argmax is
    # resolved with FOUR primitive aggregates instead of a
    # collect_list + higher-order fold — the partial state per target
    # cell is then 4 longs rather than the full 9-row contribution
    # list, so map-side combine actually shrinks the shuffle and the
    # aggregation stays in fast HashAggregate (the struct-list version
    # ran in ObjectHashAggregate with list-valued partial states).
    # Per distance class k ∈ {1, 2}, argmax by (slope desc, dir asc)
    # ≡ argmin by (nv asc, dir asc) because slope = (vc − nv)/√k is
    # strictly decreasing in nv with vc and k fixed; (nv, dir) packs
    # losslessly into one long as (nv << 4) | dir (dir ∈ 1..8 occupies
    # the low nibble; arithmetic shift keeps the order for negative
    # heights, |value| < 2^59 — far beyond any DEM). The cross-class
    # winner then compares the two decoded slopes exactly as the fold
    # did: identical doubles, identical ties (smaller dir).
    packed = F.shiftleft(F.col("_nv").cast("long"), 4) + F.col("_dir")
    per_cell = (
        scattered.groupBy(x, y)
        .agg(F.count(F.lit(1)).alias("_n"),
             F.max(F.when(F.col("_dir") == 0, F.col("_nv"))).alias("_vc"),
             F.min(F.when(F.col("_k") == 1, packed)).alias("_p1"),
             F.min(F.when(F.col("_k") == 2, packed)).alias("_p2"))
        .filter(F.col("_n") == 9))
    nv1 = F.shiftright(F.col("_p1"), 4)
    nv2 = F.shiftright(F.col("_p2"), 4)
    d1 = F.col("_p1").bitwiseAND(F.lit(15))
    d2 = F.col("_p2").bitwiseAND(F.lit(15))
    # slope doubles exactly as the fold computed them: k=1 divides by
    # sqrt(1.0) = 1.0 (exact identity), k=2 by sqrt(2.0) — one
    # correctly-rounded IEEE op each, so cross-engine parity holds
    s1 = (F.col("_vc") - nv1).cast("double") / F.sqrt(F.lit(1.0))
    s2 = (F.col("_vc") - nv2).cast("double") / F.sqrt(F.lit(2.0))
    use2 = (s2 > s1) | ((s2 == s1) & (d2 < d1))
    best_s = F.when(use2, s2).otherwise(s1)
    best_d = F.when(use2, d2).otherwise(d1)
    return per_cell.select(
        x, y,
        F.when(best_s > 0, best_d.cast("int")).otherwise(F.lit(0))
        .alias("dir"))


def flow_d8(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
            value: str = "value", block: int = 25) -> DataFrame:
    """Per-(block × block) tile counts by D8 direction code — the
    drainage-pattern summary over flow_dirs (see its docstring for
    the scatter plan and the cross-engine determinism argument)."""
    return (flow_dirs(cells, x, y, value).groupBy(
                F.floor(F.col(x) / block).cast("long").alias("bx"),
                F.floor(F.col(y) / block).cast("long").alias("by"),
                "dir")
            .agg(F.count(F.lit(1)).alias("n")))


def flow_accum(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
               value: str = "value", rounds: int = 2,
               block: int = 25) -> DataFrame:
    """k-step D8 flow ACCUMULATION (r07) — hydrology's second
    derivative: route unit mass down the flow_dirs graph for `rounds`
    unrolled steps, acc_{r+1}(c) = 1 + Σ_{upstream u → c} acc_r(u).
    After k rounds acc(c) counts the cells whose ≤k-step flow path
    reaches c (k-step upslope contributing area; full convergence
    would iterate to the longest flow path — same plan, more rounds,
    the documented iterative-algorithm pattern shared with PageRank).
    Every cell has at most ONE out-edge, so each round is exactly one
    equi join + one map-side-combinable grouped sum + one left join
    back to the cell frame — no fan-out blow-up. Mass flowing onto
    non-interior cells leaves the accounted grid (identical on both
    engines: the left join back to the interior frame drops it).
    Returns per-tile (bx, by, sum_acc, max_acc)."""
    dirs = flow_dirs(cells, x, y, value)
    dxm = F.create_map(*[F.lit(v) for dx, dy, k, d in _D8
                         for v in (d, dx)])
    dym = F.create_map(*[F.lit(v) for dx, dy, k, d in _D8
                         for v in (d, dy)])
    edges = (dirs.filter(F.col("dir") > 0)
             .select(F.col(x).alias("ex"), F.col(y).alias("ey"),
                     (F.col(x) + dxm[F.col("dir")]).alias("tx"),
                     (F.col(y) + dym[F.col("dir")]).alias("ty")))
    base = dirs.select(F.col(x).alias("bx_"), F.col(y).alias("by_"))
    acc = base.select(F.col("bx_").alias("ax"), F.col("by_").alias("ay"),
                      F.lit(1).cast("long").alias("acc"))
    for _ in range(rounds):
        inflow = (edges.join(acc, (edges.ex == acc.ax)
                             & (edges.ey == acc.ay))
                  .groupBy("tx", "ty")
                  .agg(F.sum("acc").alias("inflow")))
        acc = (base.join(inflow, (base.bx_ == inflow.tx)
                         & (base.by_ == inflow.ty), "left")
               .select(F.col("bx_").alias("ax"), F.col("by_").alias("ay"),
                       (F.lit(1) + F.coalesce("inflow", F.lit(0)))
                       .cast("long").alias("acc")))
    return (acc.groupBy(F.expr(f"ax div {block}").alias("tbx"),
                        F.expr(f"ay div {block}").alias("tby"))
            .agg(F.sum("acc").alias("sum_acc"),
                 F.max("acc").alias("max_acc"))
            .withColumnRenamed("tbx", "bx").withColumnRenamed("tby", "by"))


def dist_transform(cells: DataFrame, thresh: int, x: str = "cell_x",
                   y: str = "cell_y", value: str = "value",
                   rounds: int = 3, block: int = 25) -> DataFrame:
    """k-bounded city-block DISTANCE TRANSFORM (r07) — the raster
    proximity operator (R terra `distance()`, GDAL proximity): per
    cell, the L1 distance to the nearest "feature" cell (value ≥
    thresh), capped at `rounds` (cells farther than the cap report
    the sentinel rounds+1 — "beyond the horizon", exactly what a
    bounded buffer query needs). Min-plus relaxation over the
    4-neighbour grid, unrolled `rounds` times:

        d₀(c)   = 0 if feature else cap
        dᵣ₊₁(c) = min(dᵣ(c), 1 + min₄ dᵣ(n))

    Each round is one explode(4 offsets) scatter + one map-side-
    combinable grouped MIN + one join back onto the cell frame — the
    flow_accum iterative shape with MIN replacing SUM. The fan-out is
    a literal-array explode, never a self-join, and partial
    aggregation collapses it before the shuffle under any spatially
    clustered layout. Distances are exact within the cap: round r
    settles every cell at distance ≤ r, so `rounds` iterations settle
    the full capped field (the bounded-Bellman-Ford argument).
    Returns per-(block × block) tile (bx, by, sum_d, n_reached) —
    capped-distance mass and the count of cells within the horizon."""
    cap = rounds + 1
    base = cells.select(
        F.col(x).alias("dx_"), F.col(y).alias("dy_"),
        F.when(F.col(value) >= thresh, 0).otherwise(cap)
        .cast("long").alias("d"))
    offs = F.array(*[F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
                     for ox, oy in ((1, 0), (-1, 0), (0, 1), (0, -1))])
    cur = base
    for _ in range(rounds):
        nbr = (cur.select(F.explode(offs).alias("o"), "dx_", "dy_", "d")
               .groupBy((F.col("dx_") + F.col("o.ox")).alias("tx"),
                        (F.col("dy_") + F.col("o.oy")).alias("ty"))
               .agg(F.min(F.col("d") + 1).alias("nd")))
        cur = (cur.join(nbr, (F.col("dx_") == nbr.tx)
                        & (F.col("dy_") == nbr.ty), "left")
               .select("dx_", "dy_",
                       F.least("d", F.coalesce("nd", F.lit(cap)))
                       .alias("d")))
    return (cur.groupBy(F.expr(f"dx_ div {block}").alias("bx"),
                        F.expr(f"dy_ div {block}").alias("by"))
            .agg(F.sum("d").alias("sum_d"),
                 F.count(F.when(F.col("d") <= rounds, 1))
                 .alias("n_reached")))


def cost_distance(cells: DataFrame, src_thresh: int, x: str = "cell_x",
                  y: str = "cell_y", value: str = "value",
                  rounds: int = 3, block: int = 25) -> DataFrame:
    """k-bounded COST-DISTANCE surface (r07) — the weighted sibling of
    dist_transform (R terra `costDist()`, GRASS r.cost, ArcGIS Cost
    Distance): per cell, the cheapest accumulated traversal cost from
    any source cell (value ≥ src_thresh), stepping 4-connected, where
    entering cell c costs cost(c) = value(c) % 9 + 1 ∈ [1, 9]. The
    min-plus (tropical) relaxation, unrolled `rounds` times:

        d₀(c)   = 0 if source else CAP
        dᵣ₊₁(c) = min(dᵣ(c), min₄ dᵣ(n) + cost(c))

    with CAP = 9·rounds + 1 (one more than any reachable cost within
    `rounds` hops — the "beyond the horizon" sentinel). Each round is
    one literal-array explode scatter + one map-side-combinable
    grouped MIN + one join back onto the cell frame — never a
    self-join, same 100 TB shape as flow_accum/dist_transform. Round
    r settles every cell whose cheapest path uses ≤ r steps, so the
    k-bounded field is exact (bounded Bellman-Ford over the tropical
    semiring). Returns per-(block × block) tile (bx, by, sum_d,
    n_reached)."""
    cap = 9 * rounds + 1
    base = cells.select(
        F.col(x).alias("cx_"), F.col(y).alias("cy_"),
        (F.col(value) % 9 + 1).cast("long").alias("cost"),
        F.when(F.col(value) >= src_thresh, 0).otherwise(cap)
        .cast("long").alias("d"))
    offs = F.array(*[F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
                     for ox, oy in ((1, 0), (-1, 0), (0, 1), (0, -1))])
    cur = base
    for _ in range(rounds):
        nbr = (cur.select(F.explode(offs).alias("o"), "cx_", "cy_", "d")
               .groupBy((F.col("cx_") + F.col("o.ox")).alias("tx"),
                        (F.col("cy_") + F.col("o.oy")).alias("ty"))
               .agg(F.min("d").alias("nd")))
        # least(d, nbr_min + own cost); a CAP-valued neighbour can only
        # produce ≥ CAP, which least() discards against d ≤ CAP
        cur = (cur.join(nbr, (F.col("cx_") == nbr.tx)
                        & (F.col("cy_") == nbr.ty), "left")
               .select("cx_", "cy_", "cost",
                       F.least("d", F.coalesce(F.col("nd") + F.col("cost"),
                                               F.lit(cap))).alias("d")))
    return (cur.groupBy(F.expr(f"cx_ div {block}").alias("bx"),
                        F.expr(f"cy_ div {block}").alias("by"))
            .agg(F.sum("d").alias("sum_d"),
                 F.count(F.when(F.col("d") < cap, 1)).alias("n_reached")))


def nms_peaks(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
              value: str = "value", block: int = 25) -> DataFrame:
    """3×3 NON-MAXIMUM SUPPRESSION (r07) — the peak/keypoint selection
    step every detector runs after a response map (Harris corners,
    SIFT DoG, terrain summit extraction): keep cells whose value is a
    STRICT maximum over their 8-neighbourhood. One literal explode of
    the 8 offsets scatters each cell's value onto its neighbours, one
    map-side-combinable grouped MAX gives every target its
    neighbourhood max, one join back compares — never a self-join. A
    cell is interior iff all 8 contributions arrived (n = 8), which
    detects the raster edge on a sparse table without knowing the
    extent. Returns per-(block × block) tile (bx, by, n_interior,
    n_peaks, sum_peak_v)."""
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if (dx, dy) != (0, 0)])
    nbr = (cells.select(x, y, value)
           .withColumn("_o", F.explode(offs))
           .groupBy((F.col(x) + F.col("_o.dx")).alias("tx"),
                    (F.col(y) + F.col("_o.dy")).alias("ty"))
           .agg(F.max(value).alias("nbr_max"),
                F.count(F.lit(1)).alias("n_nbr")))
    j = (cells.join(nbr, (F.col(x) == nbr.tx) & (F.col(y) == nbr.ty))
         .filter(F.col("n_nbr") == 8))
    return (j.groupBy(F.expr(f"{x} div {block}").alias("bx"),
                      F.expr(f"{y} div {block}").alias("by"))
            .agg(F.count(F.lit(1)).alias("n_interior"),
                 F.count(F.when(F.col(value) > F.col("nbr_max"), 1))
                 .alias("n_peaks"),
                 F.sum(F.when(F.col(value) > F.col("nbr_max"),
                              F.col(value)).otherwise(0))
                 .alias("sum_peak_v")))


def upsample2(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
              value: str = "value", block: int = 50) -> DataFrame:
    """Exact 2× BILINEAR DISAGGREGATION (r07) — R terra
    `disagg(..., method="bilinear")` / GDAL `-r bilinear -tr pitch/2`:
    resample the grid to double resolution with half-pixel-centre
    alignment, sx = tx/2 − 0.25. Per axis the two source weights are
    always {¾, ¼}, so the 2-D stencil weights are {9, 3, 3, 1}/16 —
    kept as INTEGERS scaled by 16 (v16 = 16 × bilinear value), making
    the op bit-exact across engines with zero float ops. SCATTER plan:
    each source cell emits its 16 weighted contributions (4 targets
    per axis: 2x−1 w1, 2x w3, 2x+1 w3, 2x+2 w1) through one literal
    explode, one map-side-combinable grouped SUM assembles each
    target; a target is interior iff all 4 sources arrived, detected
    by Σweights = 16 ⟺ n = 4 — no extent knowledge needed. Returns
    per-(block × block)-of-the-FINE-grid tile (bx, by, n_cells,
    sum_v16)."""
    per_axis = ((-1, 1), (0, 3), (1, 3), (2, 1))  # (target − 2·src, w)
    offs = F.array(*[F.struct(F.lit(ax).alias("ax"), F.lit(ay).alias("ay"),
                              F.lit(wx * wy).alias("w"))
                     for ax, wx in per_axis for ay, wy in per_axis])
    return (cells.select(x, y, value)
            .withColumn("_o", F.explode(offs))
            .groupBy((F.col(x) * 2 + F.col("_o.ax")).alias("tx"),
                     (F.col(y) * 2 + F.col("_o.ay")).alias("ty"))
            .agg(F.sum(F.col(value) * F.col("_o.w")).alias("v16"),
                 F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == 4)
            .groupBy(F.expr(f"tx div {block}").alias("bx"),
                     F.expr(f"ty div {block}").alias("by"))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("v16").alias("sum_v16")))


def moran_i(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
            value: str = "value", decimals: int = 9) -> DataFrame:
    """Global MORAN'S I (r07) — the canonical spatial-autocorrelation
    statistic (R spdep `moran.test`, ArcGIS Spatial Autocorrelation,
    PySAL `esda.Moran`) with rook (4-neighbour) binary weights:

        I = (n / W) · Σᵢⱼ wᵢⱼ (xᵢ−x̄)(xⱼ−x̄) / Σᵢ (xᵢ−x̄)²

    Exact-integer formulation: scale deviations by n so they stay
    integral — c(i) = n·xᵢ − S with S = Σx (so c = n·(xᵢ−x̄)); the
    n² scale factors cancel in the ratio. num = Σ_pairs c(i)·c(j)
    over DIRECTED rook pairs, den = Σ c², and
    I = (num·n) / (den·W) — num/den/W/n are emitted as exact BIGINTs
    (the auditable components), I as a rounded double.

    int64 bounds: callers must keep n·max|x| ≤ ~1e7 and
    n·(n·max|x|)² within 2^63 — the 100×100/values<1000 driver grid
    gives |num| ≤ 4e18, den ≤ 1e18 (documented at the call site).

    Plan shape (100 TB): one global agg for (n, S) broadcast back; the
    pair sum is the same literal 4-offset explode scatter as
    dist_transform — each cell's c scattered onto its rook
    neighbours, ONE equi join back onto the cell frame (never a
    self-join on inequality), map-side-combinable sums throughout.
    Returns ONE row (n, s_sum, w_pairs, num, den, moran)."""
    base = cells.select(F.col(x).alias("cx_"), F.col(y).alias("cy_"),
                        F.col(value).cast("long").alias("v"))
    tot = base.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("v").alias("s_sum"))
    c = (base.crossJoin(F.broadcast(tot))
         .select("cx_", "cy_", "n", "s_sum",
                 (F.col("n") * F.col("v") - F.col("s_sum")).alias("c")))
    offs = F.array(*[F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
                     for ox, oy in ((1, 0), (-1, 0), (0, 1), (0, -1))])
    scat = (c.select(F.explode(offs).alias("o"), "cx_", "cy_",
                     F.col("c").alias("c_src"))
            .select((F.col("cx_") + F.col("o.ox")).alias("tx"),
                    (F.col("cy_") + F.col("o.oy")).alias("ty"), "c_src"))
    pairs = (c.join(scat, (F.col("cx_") == F.col("tx"))
                    & (F.col("cy_") == F.col("ty")))
             .agg(F.count(F.lit(1)).alias("w_pairs"),
                  F.sum(F.col("c") * F.col("c_src")).alias("num")))
    den = c.agg(F.sum(F.col("c") * F.col("c")).alias("den"),
                F.first("n").alias("n"), F.first("s_sum").alias("s_sum"))
    return (den.crossJoin(pairs)
            .select("n", "s_sum", "w_pairs", "num", "den",
                    F.round((F.col("num").cast("double") * F.col("n"))
                            / (F.col("den").cast("double")
                               * F.col("w_pairs")), decimals)
                    .alias("moran")))


def raster_equalize(cells: DataFrame, levels: int = 1000,
                  x: str = "cell_x", y: str = "cell_y",
                  value: str = "value", block: int = 25) -> DataFrame:
    """RASTER-WIDE HISTOGRAM EQUALIZATION (r07) — the mosaic
    contrast normalization (GDAL gdal_translate -scale over a global
    histogram, GRASS r.colors -e): one LUT for the WHOLE distributed
    raster, unlike operators/multimodal.hist_equalize_stats which
    equalizes each small image against its own histogram. Build the
    global value histogram, its CDF, and remap every pixel through
    the integer LUT

        eq(v) = (cdf(v) − cdf_min) · (L−1) div (n − cdf_min)

    (cdf_min = count of the smallest PRESENT level — the standard
    formula's guard so the darkest level maps to 0). All operands
    non-negative ⇒ Spark's truncating `div` ≡ DuckDB's flooring `//`.

    Plan shape (100 TB): the histogram is ONE map-side-combinable
    groupBy on the value (≤ `levels` rows regardless of raster size);
    the CDF window runs over that ≤`levels`-row frame — a
    single-partition window over the VALUE DOMAIN, not the data, so
    it is driver-size-independent; the LUT is then a BROADCAST join
    back onto the pixel stream (the big side never shuffles). Returns
    per-(block × block) tile (bx, by, n_cells, sum_eq, max_eq)."""
    from pyspark.sql import Window as W
    hist = (cells.groupBy(F.col(value).alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    cdf = hist.withColumn(
        "cdf", F.sum("cnt").over(
            W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)))
    tot = cdf.agg(F.min("cdf").alias("cdf_min"),
                  F.max("cdf").alias("n_tot"))
    lut = (cdf.crossJoin(F.broadcast(tot))
           .select(F.col("v").alias("_lv"), F.when(
               F.col("n_tot") > F.col("cdf_min"),
               F.expr(f"(cdf - cdf_min) * {levels - 1} "
                      f"div (n_tot - cdf_min)"))
               .otherwise(F.lit(0)).cast("long").alias("eq")))
    return (cells.join(F.broadcast(lut), F.col(value) == F.col("_lv"))
            .groupBy(F.expr(f"{x} div {block}").alias("bx"),
                     F.expr(f"{y} div {block}").alias("by"))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("eq").alias("sum_eq"),
                 F.max("eq").alias("max_eq")))


def mode_resample(cells: DataFrame, x: str = "cell_x", y: str = "cell_y",
                  value: str = "value", factor: int = 4,
                  block: int = 25) -> DataFrame:
    """MAJORITY (modal) resampling (r07) — the categorical-raster
    aggregation (R terra `aggregate(..., fun="modal")`, GDAL
    `-r mode`): downscale by `factor`, each coarse cell taking the
    most frequent fine value underneath it, ties broken to the
    SMALLEST value (deterministic, matching terra's lowest-class
    convention). Two shuffles total: one groupBy counting
    (coarse cell, value) — map-side combinable — and one
    window/argmax per coarse cell (expressed as max_by over the
    lexicographic (count, −value) pair, no row_number shuffle-sort).
    Returns per-(block × block)-of-the-COARSE-grid tile (bx, by,
    n_blocks, sum_mode, max_mode)."""
    counted = (cells.groupBy(
        F.expr(f"{x} div {factor}").alias("gx"),
        F.expr(f"{y} div {factor}").alias("gy"),
        F.col(value).alias("v"))
        .agg(F.count(F.lit(1)).alias("c")))
    modes = (counted.groupBy("gx", "gy")
             .agg(F.max(F.struct(F.col("c"), (-F.col("v")).alias("nv")))
                  .alias("best"))
             .select("gx", "gy", (-F.col("best.nv")).alias("mode_v")))
    return (modes.groupBy(F.expr(f"gx div {block}").alias("bx"),
                          F.expr(f"gy div {block}").alias("by"))
            .agg(F.count(F.lit(1)).alias("n_blocks"),
                 F.sum("mode_v").alias("sum_mode"),
                 F.max("mode_v").alias("max_mode")))


def contour_cases(cells: DataFrame, iso: int, x: str = "cell_x",
                  y: str = "cell_y", value: str = "value",
                  block: int = 25) -> DataFrame:
    """Marching-squares contour classification — the cell-local half
    of `rasterToContour()`: each 2×2 corner square gets the 4-bit case
    index Σ 2^i·[corner_i ≥ iso] (corners 0..3 counter-clockwise from
    the square's lower-left at (x, y)), which fully determines the
    contour segments crossing the square. Returns per-(block × block)
    tile counts by case — cases 0 and 15 are contour-free, so
    n(1..14) per tile is the iso-line density map, and the per-case
    histogram is exactly what a vectorizer needs to size its output.

    All integer (threshold bits and powers of two — nothing to
    round). Plan: the same single-shuffle scatter as hillshade/flow —
    each cell emits its bit to the ≤ 4 squares it corners, one
    groupBy sums the case index, squares with all 4 corners present
    (n = 4) emit."""
    corners = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(w).alias("w"))
        # corner i of square s is the cell at s + (dx, dy); the cell
        # therefore scatters to square s = cell − (dx, dy) with 2^i
        for dx, dy, w in [(0, 0, 1), (1, 0, 2), (1, 1, 4), (0, 1, 8)]])
    bit = (F.col(value) >= iso).cast("int")
    squares = (
        cells.select(x, y, bit.alias("_b"))
        .withColumn("_c", F.explode(corners))
        .select((F.col(x) - F.col("_c.dx")).alias(x),
                (F.col(y) - F.col("_c.dy")).alias(y),
                (F.col("_b") * F.col("_c.w")).alias("_t"))
        .groupBy(x, y)
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_t").alias("mcase"))
        .filter(F.col("_n") == 4))
    return (squares.groupBy(
                F.floor(F.col(x) / block).cast("long").alias("bx"),
                F.floor(F.col(y) / block).cast("long").alias("by"),
                "mcase")
            .agg(F.count(F.lit(1)).alias("n")))
