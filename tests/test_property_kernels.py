"""Hypothesis property tests for the geometry kernels (SURVEY §5):
randomized adversaries for the math that everything else sits on. No
Spark — pure NumPy, fast."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_sf_r_parallel_spark.geo import index as I
from extract_sf_r_parallel_spark.geo import kernels as K

coord = st.integers(min_value=0, max_value=2000)
half = st.integers(min_value=1, max_value=150)
radius = st.sampled_from([30.0, 150.0, 565.0])


def _rect(cx, cy, hw, hh):
    return np.array([
        [cx - hw, cy - hh], [cx + hw, cy - hh], [cx + hw, cy + hh],
        [cx - hw, cy + hh], [cx - hw, cy - hh]], dtype=np.float64)


def _closed_form_circle_rect(px, py, x0, y0, x1, y1, r):
    """Independent circular-segment decomposition (the DuckDB oracle's
    formula, in Python)."""
    def G(t):
        return (t * math.sqrt(max(r * r - t * t, 0.0))
                + r * r * math.asin(min(max(t / r, -1.0), 1.0))) / 2.0

    def A0(w, h):
        c = math.sqrt(max(r * r - h * h, 0.0))
        return w * h if w <= c else c * h + G(w) - G(c)

    def B(X, Y):
        sx = -1.0 if X < 0 else (1.0 if X > 0 else 0.0)
        sy = -1.0 if Y < 0 else (1.0 if Y > 0 else 0.0)
        return sx * sy * A0(min(abs(X), r), min(abs(Y), r))

    return (B(x1 - px, y1 - py) - B(x0 - px, y1 - py)
            - B(x1 - px, y0 - py) + B(x0 - px, y0 - py))


@settings(max_examples=300, deadline=None)
@given(coord, coord, coord, coord, half, half, radius)
def test_circle_rect_area_matches_closed_form(px, py, cx, cy, hw, hh, r):
    ring = _rect(cx, cy, hw, hh)
    got = K.circle_polygon_area(px, py, r, ring)
    want = _closed_form_circle_rect(px, py, cx - hw, cy - hh,
                                    cx + hw, cy + hh, r)
    assert got == np.float64(want) or abs(got - want) < 1e-7
    assert 0.0 <= got <= min(math.pi * r * r, 4.0 * hw * hh) + 1e-7


@settings(max_examples=200, deadline=None)
@given(coord, coord, half, half, coord, coord, half, half)
def test_convex_clip_area_bounds(ax, ay, ahw, ahh, bx, by, bhw, bhh):
    A = _rect(ax, ay, ahw, ahh)
    B = _rect(bx, by, bhw, bhh)
    inter = K.convex_clip(A, B)
    area = abs(K.ring_area(inter)) if len(inter) >= 3 else 0.0
    # exact for axis-aligned rects (collinear clip edges can introduce
    # ~1-ulp vertex noise → 1e-9 absolute, far below oracle rounding)
    w = max(0.0, min(ax + ahw, bx + bhw) - max(ax - ahw, bx - bhw))
    h = max(0.0, min(ay + ahh, by + bhh) - max(ay - ahh, by - bhh))
    assert abs(area - w * h) < 1e-9
    # self-intersection is identity (area-wise)
    self_a = abs(K.ring_area(K.convex_clip(A, A)))
    assert abs(self_a - 4.0 * ahw * ahh) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coord, coord, half, half),
                min_size=2, max_size=8),
       coord, coord)
def test_union_circle_area_vs_raster(rects, px, py):
    rings = [_rect(cx, cy, hw, hh) for cx, cy, hw, hh in rects]
    years = np.zeros(len(rings), dtype=np.int64)
    r = 250.0
    try:
        exact = K.union_circle_area(px, py, r, rings, years)
    except K.DissolveFallback:
        return  # entangled component: the raster path owns it
    total = sum(K.circle_polygon_area(px, py, r, rg) for rg in rings)
    assert exact <= total + 1e-7                # union ≤ Σ
    biggest = max((K.circle_polygon_area(px, py, r, rg) for rg in rings),
                  default=0.0)
    assert exact >= biggest - 1e-7              # union ≥ any member
    from extract_sf_r_parallel_spark.operators.areadist import (
        _union_area_raster,
    )
    approx = _union_area_raster(px, py, r, rings, grid=400)
    # raster error ~ boundary length × cell size
    cell = 2.0 * r / 400
    perim = sum(4.0 * (2 * hw + 2 * hh) for _, _, hw, hh in rects) / 2
    tol = perim * cell + 2 * math.pi * r * cell + 1.0
    assert abs(exact - approx) <= tol


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-120.0, max_value=-110.0),
       st.floats(min_value=49.0, max_value=61.0))
def test_tmerc_roundtrip_property(lon, lat):
    """Round-trip error follows the Redfearn dl⁶ truncation: sub-mm
    within ±2° of the central meridian (where the fixture window
    lives), growing to ~cm at the reference extent's ±5° fringe."""
    x, y = K.tmerc_forward(np.array([lon]), np.array([lat]))
    lon2, lat2 = K.tmerc_inverse(x, y)
    dl = abs(lon + 115.0)
    bound = 2e-8 + 4e-7 * (dl / 5.0) ** 6  # measured envelope × ~1.7
    assert abs(lon2[0] - lon) < bound and abs(lat2[0] - lat) < bound


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0, max_value=500000, allow_nan=False),
       st.floats(min_value=0, max_value=500000, allow_nan=False),
       st.integers(min_value=0, max_value=9))
def test_cell_id_is_stable_under_center_roundtrip(x, y, code):
    c = I.xy_to_cell(np.array([x]), np.array([y]), code)
    cx, cy = I.cell_to_center(c)
    c2 = I.xy_to_cell(cx, cy, code)
    assert c2[0] == c[0]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coord, coord, st.floats(8.0, 30.0),
                          st.integers(5, 9), st.integers(0, 10**6)),
                min_size=2, max_size=5),
       coord, coord)
def test_union_circle_area_nonconvex_vs_raster(stars, px, py):
    """r03: NON-CONVEX members must stay on the exact path (ear-clip
    pieces) and agree with the raster estimate within its resolution."""
    rng_rings = []
    for cx, cy, rad, k, seed in stars:
        g = np.random.default_rng(seed)
        ang = (np.arange(k) + 0.8 * g.random(k)) * (2 * np.pi / k)
        rr = rad * (0.4 + 0.6 * g.random(k))
        ring = np.stack([cx + rr * np.cos(ang), cy + rr * np.sin(ang)], 1)
        rng_rings.append(np.vstack([ring, ring[:1]]))
    years = np.zeros(len(rng_rings), dtype=np.int64)
    r = 250.0
    try:
        exact = K.union_circle_area(px, py, r, rng_rings, years)
    except K.DissolveFallback:
        return  # degenerate star (self-intersecting jitter): raster path
    total = sum(K.circle_polygon_area(px, py, r, rg) for rg in rng_rings)
    assert exact <= total + 1e-7
    biggest = max(K.circle_polygon_area(px, py, r, rg) for rg in rng_rings)
    assert exact >= biggest - 1e-7
    from extract_sf_r_parallel_spark.operators.areadist import (
        _union_area_raster,
    )
    approx = _union_area_raster(px, py, r, rng_rings, grid=400)
    cell = 2.0 * r / 400
    perim = sum(2 * np.pi * 30.0 for _ in rng_rings) + 2 * np.pi * r
    assert abs(exact - approx) < perim * cell * 3
