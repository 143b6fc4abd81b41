"""r08: the Akl–Toussaint prefilter inside hull_vertices_np must be
invisible in the result — the hull over the filtered cloud equals the
hull over the full cloud for adversarial shapes (collinear runs,
all-on-circle, duplicate-heavy grids)."""

import numpy as np

from extract_sf_r_parallel_spark.operators.hull import (
    _akl_toussaint_keep,
    hull_vertices_np,
)


def _chain_ref(x, y):
    """The pre-r08 chain without the prefilter (reference twin)."""
    pts = np.stack([np.asarray(x, dtype=np.int64),
                    np.asarray(y, dtype=np.int64)], axis=1)
    pts = np.unique(pts, axis=0)
    n = len(pts)
    if n <= 2:
        return pts

    def chain(order):
        out = []
        for i in order:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                ax, ay = pts[out[-1]]
                cross = (ax - ox) * (pts[i, 1] - oy) \
                    - (ay - oy) * (pts[i, 0] - ox)
                if cross <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out[:-1]

    return pts[chain(range(n)) + chain(range(n - 1, -1, -1))]


def test_prefilter_never_drops_hull_vertices():
    rng = np.random.default_rng(3)
    for t in range(300):
        n = int(rng.integers(1, 600))
        mode = t % 4
        if mode == 0:
            x = rng.integers(0, 20000, n)
            y = rng.integers(0, 20000, n)
        elif mode == 1:  # collinear-heavy
            x = rng.integers(0, 50, n)
            y = x * 2 + rng.integers(0, 2, n)
        elif mode == 2:  # every point on a circle (nothing prunable)
            a = rng.uniform(0, 2 * np.pi, n)
            x = (10000 + 5000 * np.cos(a)).astype(np.int64)
            y = (10000 + 5000 * np.sin(a)).astype(np.int64)
        else:  # duplicate-heavy grid
            x = rng.integers(0, 30, n)
            y = rng.integers(0, 30, n)
        got = hull_vertices_np(x.astype(float), y.astype(float))
        want = _chain_ref(x.astype(float), y.astype(float))
        assert np.array_equal(got, want), (t, mode)


def test_prefilter_keeps_boundary_points():
    # points ON hull edges (collinear with the extremes) must be kept
    # by the mask — they are not strictly inside
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10],
                    [5, 0], [0, 5], [10, 5], [5, 10],  # edge midpoints
                    [5, 5]], dtype=np.int64)            # interior
    keep = _akl_toussaint_keep(pts)
    assert keep[:8].all()          # corners + edge midpoints survive
    assert not keep[8]             # the interior point is pruned
