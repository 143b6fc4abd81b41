"""Linear referencing: the broadcast snap must match a NumPy
brute-force projection, clamp at segment endpoints, break ties on the
smaller segment idx, and produce chainage consistent with the route's
cumulative geometry."""

import numpy as np
import pandas as pd
import pytest

from extract_sf_r_parallel_spark.operators.linear_ref import (
    locate_points,
    with_cumlen,
)


@pytest.fixture(scope="module")
def route(spark):
    # an L-shaped route: east 3 segments then north 2
    verts = np.array([[0, 0], [10, 0], [20, 0], [30, 0],
                      [30, 10], [30, 20]], dtype=float)
    seg = pd.DataFrame({
        "idx": np.arange(5, dtype=np.int64),
        "x0": verts[:-1, 0], "y0": verts[:-1, 1],
        "x1": verts[1:, 0], "y1": verts[1:, 1]})
    return spark.createDataFrame(seg), verts


def _brute(verts, px, py):
    best = None
    cum = 0.0
    for i in range(len(verts) - 1):
        a, b = verts[i], verts[i + 1]
        d = b - a
        ln2 = float(d @ d)
        t = min(max(((np.array([px, py]) - a) @ d) / ln2, 0.0), 1.0)
        q = a + t * d
        dist = float(np.hypot(px - q[0], py - q[1]))
        if best is None or dist < best[0] - 1e-12:
            best = (dist, i, t, cum + t * np.sqrt(ln2))
        cum += np.sqrt(ln2)
    return best


def test_matches_brute_force(spark, route):
    seg, verts = route
    rng = np.random.default_rng(5)
    pts = pd.DataFrame({
        "pid": np.arange(60, dtype=np.int64),
        "x": rng.uniform(-5, 40, 60), "y": rng.uniform(-5, 25, 60)})
    got = locate_points(spark.createDataFrame(pts), seg, 1e9) \
        .toPandas().set_index("pid")
    for r in pts.itertuples():
        dist, idx, t, chain = _brute(verts, r.x, r.y)
        g = got.loc[r.pid]
        assert g.idx == idx
        assert g.dist == pytest.approx(dist, abs=1e-9)
        assert g.t == pytest.approx(t, abs=1e-12)
        assert g.chainage == pytest.approx(chain, abs=1e-9)


def test_endpoint_clamp_and_tiebreak(spark, route):
    seg, _ = route
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 2, 3],
        # 1: beyond the route start -> t=0 on segment 0
        # 2: exactly at the shared vertex (10,0) -> equidistant to
        #    segments 0 and 1 -> tie breaks to idx 0, t=1
        # 3: beyond the end -> t=1 on the last segment
        "x": [-5.0, 10.0, 30.0], "y": [0.0, 0.0, 99.0]}))
    got = locate_points(pts, seg, 1e9).toPandas().set_index("pid")
    assert (got.loc[1].idx, got.loc[1].t) == (0, 0.0)
    assert (got.loc[2].idx, got.loc[2].t) == (0, 1.0)
    assert got.loc[2].chainage == 10.0
    assert (got.loc[3].idx, got.loc[3].t) == (4, 1.0)
    assert got.loc[3].chainage == 50.0


def test_maxdist_filters(spark, route):
    seg, _ = route
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [1, 2], "x": [5.0, 5.0], "y": [1.0, 500.0]}))
    got = locate_points(pts, seg, 10.0).toPandas()
    assert got.pid.tolist() == [1]


def test_cumlen_window(spark, route):
    seg, verts = route
    cl = with_cumlen(seg).toPandas().sort_values("idx")
    want = np.concatenate([[0.0], np.cumsum(
        np.hypot(*(verts[1:] - verts[:-1]).T))])[:-1]
    assert np.allclose(cl.cumlen.to_numpy(), want)
