"""Serial oracle: a literal pure-NumPy/pandas reimplementation of the
reference's per-point loop (areadist.age, /root/reference/1_scripts/
C_…R:135-197; areadist C_…R:84-130; areadist.wet D_…R:20-66).

Deliberately different execution shape from the engine: brute force
over ALL polygons per point (no cell index, no candidate pruning, no
Spark) — the same role the author's commented-out serial prototype
played (C_…R:35-81). tests/test_areadist_spark.py asserts the
distributed plan matches this row-for-row (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .geo import kernels as K
from .operators.areadist import PI_LITERAL, _union_area_raster

__all__ = ["areadist_oracle"]


def areadist_oracle(
    points: pd.DataFrame,
    polys: pd.DataFrame,
    *,
    radii: tuple[float, ...] = (150.0, 565.0),
    maxdist: float = 1000.0,
    temporal: bool = True,
    age: bool = True,
    layer_col: str = "layer",
    validity_filter: bool = True,
    dissolve: str = "auto",
    pi_literal: float = PI_LITERAL,
) -> pd.DataFrame:
    """One row per (point, layer), mirroring the R loop step-for-step."""
    rows = []
    pl = polys
    if validity_filter:
        keep = [
            all(K.ring_is_valid(p) for p in K.feature_parts(g))
            for g in pl["geom"]
        ]
        pl = pl[np.array(keep)]
    for layer, lp in pl.groupby(layer_col, sort=True):
        rings = [K.feature_parts(g) for g in lp["geom"]]
        pyears = lp["YEAR"].to_numpy()
        real = pyears[pyears > 0]
        oldest = int(real.min()) if len(real) else None  # C_…R:231
        for _, pt in points.iterrows():
            x, y, year = float(pt["x"]), float(pt["y"]), int(pt["YEAR"])
            if temporal:
                sel = pyears < year  # C_…R:144-145
            else:
                sel = np.ones(len(rings), dtype=bool)
            cand = [rings[i] for i in np.flatnonzero(sel)]
            cyears = pyears[sel]
            row = {"PKEY": pt["PKEY"], "SS": pt["SS"], "YEAR": year,
                   "layer": layer}
            # nearest distance, capped (C_…R:177-182)
            if cand:
                d = K.pairs_point_polygon_distance(
                    np.full(len(cand), x), np.full(len(cand), y), cand)
                row["NEAR_DIST"] = float(min(d.min(), maxdist))
            else:
                d = np.zeros(0)
                row["NEAR_DIST"] = float(maxdist)
            for r in radii:
                # dist ≥ r ⇒ exactly 0 (empty st_intersection), same
                # clamp as the engine kernel
                areas = np.array([
                    K.circle_feature_area(x, y, r, rg) if d[i] < r else 0.0
                    for i, rg in enumerate(cand)
                ]) if cand else np.zeros(0)
                if dissolve == "raster":
                    hit = [cand[i] for i in np.flatnonzero(areas > 0)]
                    a_dissolved = _union_area_raster(x, y, r, hit) if hit else 0.0
                elif dissolve == "auto":
                    # rings with a>0 are necessarily closed (open
                    # polylines have zero clip area)
                    hit_i = np.flatnonzero(areas > 0)
                    hit = [cand[i] for i in hit_i]
                    try:
                        a_dissolved = K.union_circle_area(
                            x, y, r, hit, cyears[hit_i]) if hit else 0.0
                    except K.DissolveFallback:
                        a_dissolved = _union_area_raster(x, y, r, hit)
                else:
                    a_dissolved = float(areas.sum())  # disjoint ⇒ union
                row[f"AREA{int(r)}"] = a_dissolved
                row[f"PROP{int(r)}"] = a_dissolved / (pi_literal * r * r)
                if age:
                    m = areas > 0
                    if oldest is None:
                        # no real construction year anywhere in the
                        # layer: YEAR=0 ages are undefined → those
                        # candidates contribute nothing to MEANAGE
                        # (null-contribution semantics, ADVICE r01)
                        m = m & (cyears > 0)
                    if m.any():
                        yy = cyears[m].astype(np.float64)
                        if oldest is not None:
                            yy = np.where(yy == 0, oldest, yy)  # C_…R:150
                        ages = year - yy
                        row[f"MEANAGE_{int(r)}"] = float(
                            (ages * areas[m]).sum() / areas[m].sum())  # C_…R:159
                    else:
                        row[f"MEANAGE_{int(r)}"] = np.nan
            rows.append(row)
    return pd.DataFrame(rows)
