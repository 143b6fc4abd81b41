"""Douglas–Peucker polyline simplification — the sf `st_simplify`
family op (reference family: R sf/rgeos simplification before plotting
or joining; see SURVEY.md §2.3 geometry ops). Vertices arrive as rows
(line_id, idx, x, y); each polyline is simplified independently by an
Arrow-batched `applyInPandas` kernel (one group = one polyline — the
multimodal.py altitude: per-row Python over *geometries*, vectorized
NumPy inside), keeping a vertex iff Douglas–Peucker retains it at
tolerance eps.

All split decisions are EXACT integer arithmetic on integer-valued
coordinates: a vertex is beyond tolerance iff cross² > eps²·len²
where cross = (x1−x0)(y0−yp) − (x0−xp)(y1−y0) — no square roots, no
float rounding, so an independent SQL engine replays every decision
bit-for-bit (plans/spatial_queries.py builds that oracle by unrolling
the split recursion to a fixed depth). Ties in the farthest-vertex
argmax break to the SMALLEST index; degenerate chords (coincident
endpoints — closed rings) fall back to squared point distance to the
chord anchor.

Scale: polylines are the unit of parallelism — a 100 TB layer of
millions of features fans out one group per feature after a single
hash shuffle on line_id, and the kernel is O(n log n) expected per
feature. (Monster single features with ~10⁸ vertices would want the
segment-relaxation DataFrame formulation instead; real vector layers
are bounded per feature, so the grouped kernel is the right default —
the same judgement call sf/GEOS makes.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["dp_keep_mask", "simplify_lines"]


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Douglas–Peucker keep mask over one polyline's ordered vertices.
    Exact int64 arithmetic; returns bool array (endpoints always
    kept). Also used directly by tests as the serial reference."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    # cross is a sum of two (Δ·coord) products, so |cross| ≤
    # 2·max|Δ|·max|coord|; metric = cross² must stay inside int64 or
    # numpy wraps SILENTLY while the DuckDB oracle's BIGINT multiply
    # raises (ADVICE r05). Guard the bound here — 2·span·|coord| <
    # 2^31 keeps cross² < 2^62 — and fall back to exact Python-int
    # (object dtype) arithmetic when a monster line exceeds it, so
    # the "exact integer arithmetic" guarantee holds at every scale.
    span = int(max(xs.max() - xs.min(), ys.max() - ys.min(), 1))
    bound = int(max(np.abs(xs).max(), np.abs(ys).max(), 1))
    if 2 * span * bound >= 1 << 31:
        xs = xs.astype(object)
        ys = ys.astype(object)
    eps2 = int(round(eps * eps))
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        dx, dy = x1 - x0, y1 - y0
        len2 = int(dx * dx + dy * dy)
        seg_x = xs[i0 + 1:i1]
        seg_y = ys[i0 + 1:i1]
        if len2 == 0:
            # degenerate chord: squared distance to the anchor point
            d2 = (seg_x - x0) ** 2 + (seg_y - y0) ** 2
            beyond = d2 > eps2
            metric = d2
        else:
            cross = dx * (y0 - seg_y) - (x0 - seg_x) * dy
            metric = cross * cross
            beyond = metric > eps2 * len2
        if not beyond.any():
            continue
        j = i0 + 1 + int(np.argmax(metric))  # argmax ties -> min index
        keep[j] = True
        stack.append((i0, j))
        stack.append((j, i1))
    return keep


def simplify_lines(vertices: DataFrame, eps: float,
                   line_col: str = "line_id", idx_col: str = "idx",
                   x: str = "x", y: str = "y") -> DataFrame:
    """Simplify every polyline in `vertices` (rows keyed by line_col,
    ordered by idx_col) at tolerance eps; returns the kept vertex rows
    with the original columns."""
    schema = T.StructType([
        vertices.schema[line_col],
        vertices.schema[idx_col],
        vertices.schema[x],
        vertices.schema[y],
    ])

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col)
        m = dp_keep_mask(pdf[x].to_numpy(), pdf[y].to_numpy(), eps)
        return pdf.loc[m, [line_col, idx_col, x, y]]

    return (vertices.select(line_col, idx_col, x, y)
            .groupBy(line_col).applyInPandas(_one, schema))
