"""Per-group convex hull — Andrew's monotone chain, hierarchically.

The reference dissolves and buffers footprint polygons (D_…R union /
gBuffer calls); the hull is the remaining classic reduction over a
point cloud it never needed because sf ships one. Built from scratch
here as a GROUP-wise reduction with an exact-integer kernel.

Semantics: hull vertices are the STRICTLY convex extremes — collinear
mid-points on a hull edge are dropped (matches the maximal-edge
characterization the DuckDB oracle tests: an ordered pair (a, b) is a
hull edge iff every other point lies strictly left of a→b, or on the
open segment between them).

Scale notes (100 TB): the hull is an associative reduction —
hull(P ∪ Q) = hull(hull(P) ∪ hull(Q)) — so a group with billions of
points never meets one task. `pre_reduce_salt` runs a first chain per
(group, salt) shard (output ≤ hull-size rows per shard, typically
tens), then the exact chain per group over the union of shard hulls.
Both stages are applyInPandas at their natural shuffle grain; the
kernel is vectorized NumPy on int64 (exact for |coord| < ~3·10⁹ —
cross products stay under 2⁶³).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hull_vertices_np", "convex_hull_stats", "hull_points"]


def _akl_toussaint_keep(pts: np.ndarray) -> np.ndarray:
    """Akl–Toussaint prefilter (r08, guide §1.2 "per-task work"):
    boolean mask of points that MIGHT be hull vertices. The 8
    directional extremes (E, NE, N, …) are hull points; listed in
    support-angle order they form a convex polygon contained in the
    hull, so anything strictly inside it is strictly inside the hull
    and can be dropped before the O(n) Python chain loop. The
    strict-inside test runs in float64 with a conservative error
    margin (points within `margin` of an edge are KEPT), so a discard
    is always sound; the exact chain then sees ~hull-sized survivors
    instead of the full cloud."""
    xs = pts[:, 0].astype(np.float64)
    ys = pts[:, 1].astype(np.float64)
    ring: list[tuple[float, float]] = []
    for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1),
                   (-1, 0), (-1, -1), (0, -1), (1, -1)):
        i = int(np.argmax(dx * xs + dy * ys))
        p = (xs[i], ys[i])
        if not ring or p != ring[-1]:
            ring.append(p)
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    if len(ring) < 4:  # all extremes coincide — nothing to prune
        return np.ones(len(pts), dtype=bool)
    r = max(np.abs(xs).max(), np.abs(ys).max(),
            max(abs(c) for p in ring for c in p), 1.0)
    margin = 256.0 * r * r * 2.0 ** -52  # ≥ float64 cross-product error
    inside = np.ones(len(pts), dtype=bool)
    for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
        cr = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
        inside &= cr > margin
    return ~inside


def hull_vertices_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the strictly convex hull vertices, counter-clockwise
    starting from the lexicographic minimum. Exact int64 arithmetic
    when inputs are integer-valued."""
    pts = np.stack([np.asarray(x, dtype=np.int64),
                    np.asarray(y, dtype=np.int64)], axis=1)
    if len(pts) > 32:
        pts = pts[_akl_toussaint_keep(pts)]
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    n = len(pts)
    if n <= 2:
        return pts
    assert np.abs(pts).max() < 3_000_000_000, \
        "hull kernel needs |coord| < 3e9 for exact int64 cross products"

    def chain(order):
        out: list[int] = []
        for i in order:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                ax, ay = pts[out[-1]]
                cross = (ax - ox) * (pts[i, 1] - oy) \
                    - (ay - oy) * (pts[i, 0] - ox)
                if cross <= 0:  # clockwise or collinear → not strictly convex
                    out.pop()
                else:
                    break
            out.append(i)
        return out[:-1]  # endpoint repeats as the other chain's start

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    return pts[lower + upper]


def _stats_fn(gcols):
    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        hv = hull_vertices_np(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        xs, ys = hv[:, 0], hv[:, 1]
        nxt = np.roll(np.arange(len(hv)), -1)
        area2 = int((xs * ys[nxt] - xs[nxt] * ys).sum()) if len(hv) >= 3 else 0
        seg = np.sqrt(((xs - xs[nxt]) ** 2 + (ys - ys[nxt]) ** 2)
                      .astype(np.float64))
        perim = float(seg.sum()) if len(hv) >= 3 else (
            2.0 * float(seg[0]) if len(hv) == 2 else 0.0)
        # exact polygon-centroid numerators: Σ(xi+xj)·cross_ij — per
        # DIRECTED edge, so the sum needs no vertex ordering beyond
        # the ring's own (cf. the maximal-edge oracle, which finds the
        # same directed edges unordered). centroid = num / (3·area2).
        # Python ints (hull rings are tiny), so the triple product
        # can NOT wrap int64 the way a numpy multiply would.
        cx_num = cy_num = 0
        if len(hv) >= 3:
            for i, j in enumerate(nxt):
                cr = int(xs[i]) * int(ys[j]) - int(xs[j]) * int(ys[i])
                cx_num += (int(xs[i]) + int(xs[j])) * cr
                cy_num += (int(ys[i]) + int(ys[j])) * cr
            if max(abs(cx_num), abs(cy_num)) >= 2 ** 63:
                raise ValueError(
                    "hull centroid numerator exceeds int64 — coords too "
                    "large for the exact path (needs |coord|³·n < 2^63)")
        row = {c: pdf[c].iloc[0] for c in gcols}
        row.update({"hull_n": len(hv), "area2": area2,
                    "perim": round(perim, 4),
                    "cx_num": cx_num, "cy_num": cy_num})
        return pd.DataFrame([row])
    return _one


def _hull_pts_fn(gcols):
    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        hv = hull_vertices_np(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        out = pd.DataFrame({"x": hv[:, 0].astype(np.float64),
                            "y": hv[:, 1].astype(np.float64)})
        for c in gcols:
            out[c] = pdf[c].iloc[0]
        return out[[*gcols, "x", "y"]]
    return _one


def hull_points(df: DataFrame, group: str = "gid",
                pre_reduce_salt: int | None = None) -> DataFrame:
    """Hull VERTEX rows (group, x, y) — the pre-reduced point set when
    `pre_reduce_salt` is set, the final hull otherwise. df needs
    double-typed integer-valued x/y columns.

    r08 (guide §2.4 "remove shuffles outright"): the pre-reduce no
    longer shuffles the full cloud into (group, salt) shards — the
    hull is associative, so a PARTITION-LOCAL chain per (scan
    partition, group) via mapInPandas reduces each Arrow batch to
    ≤ hull-size rows per group with ZERO shuffle; only the tiny
    partial-hull union moves to the final per-group chain. The salt
    integer now only gates whether pre-reduction happens (any value
    > 1 enables it) — exactness is unchanged (hull(P ∪ Q) =
    hull(hull(P) ∪ hull(Q)), pinned by tests comparing both paths)."""
    gt = dict(df.dtypes)[group]
    schema = ", ".join([f"{group} {gt}", "x double", "y double"])
    if pre_reduce_salt and pre_reduce_salt > 1:
        def _partial(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                outs = []
                for g, sub in pdf.groupby(group, sort=False):
                    hv = hull_vertices_np(sub["x"].to_numpy(),
                                          sub["y"].to_numpy())
                    out = pd.DataFrame({
                        "x": hv[:, 0].astype(np.float64),
                        "y": hv[:, 1].astype(np.float64)})
                    out[group] = g
                    outs.append(out[[group, "x", "y"]])
                yield pd.concat(outs, ignore_index=True)
        return df.select(group, "x", "y").mapInPandas(_partial, schema)
    return df.groupBy(group).applyInPandas(_hull_pts_fn([group]), schema)


def convex_hull_stats(df: DataFrame, group: str = "gid",
                      pre_reduce_salt: int | None = None) -> DataFrame:
    """Per-group hull summary: hull_n (strict vertex count), area2
    (exact-integer doubled shoelace area, CCW-positive), perim
    (rounded 4 dp). With `pre_reduce_salt`, a shard-local chain first
    shrinks each group to ≤ salt × hull-size points (exactness is the
    hull's associativity; pinned by tests comparing salted vs not)."""
    pts = df
    if pre_reduce_salt and pre_reduce_salt > 1:
        pts = hull_points(df, group, pre_reduce_salt)
    gt = dict(df.dtypes)[group]
    return pts.groupBy(group).applyInPandas(
        _stats_fn([group]),
        f"{group} {gt}, hull_n int, area2 long, perim double, "
        "cx_num long, cy_num long")
