"""Viewshed: flat terrain sees everything, a wall shadows exactly the
cells behind it, and the declarative plan must match an imperative
per-ray NumPy walk on random terrain."""

import numpy as np
import pandas as pd
import pytest

from extract_sf_r_parallel_spark.operators.viewshed import viewshed


def _df(spark, H):
    n = H.shape[0]
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return spark.createDataFrame(pd.DataFrame({
        "cx": xs.ravel().astype(np.int64),
        "cy": ys.ravel().astype(np.int64),
        "h": H.ravel().astype(np.int64)}))


def _brute(H, ox, oy, radius, obs_h):
    """Imperative reference: walk every ray sample-by-sample."""
    n = H.shape[0]
    h0 = H[ox, oy] + obs_h
    out = {}
    for tx in range(max(0, ox - radius), min(n, ox + radius + 1)):
        for ty in range(max(0, oy - radius), min(n, oy + radius + 1)):
            dx, dy = tx - ox, ty - oy
            m = max(abs(dx), abs(dy))
            if m == 0:
                continue
            vis = True
            for t in range(1, m):
                px = ox + (1 if dx >= 0 else -1) * ((2 * t * abs(dx) + m) // (2 * m))
                py = oy + (1 if dy >= 0 else -1) * ((2 * t * abs(dy) + m) // (2 * m))
                if (H[px, py] - h0) * m >= (H[tx, ty] - h0) * t:
                    vis = False
                    break
            out[(tx, ty)] = vis
    return out


def test_flat_terrain_all_visible(spark):
    H = np.zeros((21, 21), dtype=np.int64)
    got = viewshed(_df(spark, H), 10, 10, 8, obs_height=5).toPandas()
    assert len(got) == 17 * 17 - 1
    assert got.visible.all()


def test_wall_shadows_cells_behind_it(spark):
    H = np.zeros((21, 21), dtype=np.int64)
    H[13, :] = 100                      # wall east of the observer
    got = viewshed(_df(spark, H), 10, 10, 8, obs_height=5) \
        .toPandas().set_index(["cx", "cy"])
    # the wall row itself is visible, everything beyond it is not
    assert got.loc[(13, 10)].visible
    assert not got.loc[(14, 10)].visible and not got.loc[(18, 10)].visible
    # behind the observer stays visible
    assert got.loc[(5, 10)].visible


def test_matches_imperative_walk_on_random_terrain(spark):
    rng = np.random.default_rng(11)
    H = rng.integers(0, 60, (31, 31)).astype(np.int64)
    got = viewshed(_df(spark, H), 15, 15, 10, obs_height=8).toPandas()
    want = _brute(H, 15, 15, 10, 8)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert r.visible == want[(r.cx, r.cy)], (r.cx, r.cy)
