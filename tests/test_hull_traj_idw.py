"""Round-6 operators: convex hull, trajectory stats, IDW, Sobel.

Kernel-level properties plus Spark-plan equivalences; the driver rows
(convex_hull, traj_stats, idw_interp, sobel_stats, spatial_antijoin)
pin the cross-engine exactness separately.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.hull import (
    convex_hull_stats,
    hull_vertices_np,
)
from extract_sf_r_parallel_spark.operators.interpolate import idw_interpolate
from extract_sf_r_parallel_spark.operators.trajectory import trajectory_stats


# --------------------------------------------------------------- hull kernel
def _brute_hull_edges(pts):
    """O(n³) maximal-edge test (the oracle's algorithm, in Python):
    directed edge (a, b) is on the hull iff every other point is
    strictly left of a→b or strictly inside the open segment."""
    edges = []
    n = len(pts)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            ax, ay = pts[i]
            bx, by = pts[j]
            ok = True
            for k in range(n):
                if k in (i, j):
                    continue
                cx, cy = pts[k]
                cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
                if cross > 0:
                    continue
                if cross == 0:
                    if ax != bx and min(ax, bx) < cx < max(ax, bx):
                        continue
                    if ax == bx and min(ay, by) < cy < max(ay, by):
                        continue
                ok = False
                break
            if ok:
                edges.append((i, j))
    return edges


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hull_kernel_matches_brute_edges(seed):
    rng = np.random.default_rng(seed)
    pts = rng.integers(-50, 50, size=(40, 2))
    pts = np.unique(pts, axis=0)
    hv = hull_vertices_np(pts[:, 0], pts[:, 1])
    edges = _brute_hull_edges(pts.tolist())
    assert len(hv) == len(edges)
    # same vertex SET
    hull_set = {tuple(p) for p in hv.tolist()}
    edge_set = {tuple(pts[i]) for i, _ in edges}
    assert hull_set == edge_set
    # CCW shoelace positive
    xs, ys = hv[:, 0], hv[:, 1]
    nxt = np.roll(np.arange(len(hv)), -1)
    assert (xs * ys[nxt] - xs[nxt] * ys).sum() > 0


def test_hull_collinear_and_degenerate():
    # square with collinear midpoints → 4 strict vertices
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2],
                    [1, 0], [2, 1], [1, 2], [0, 1], [1, 1]])
    hv = hull_vertices_np(pts[:, 0], pts[:, 1])
    assert len(hv) == 4 and {tuple(p) for p in hv.tolist()} == {
        (0, 0), (2, 0), (2, 2), (0, 2)}
    # all collinear → the 2 endpoints
    pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]])
    assert len(hull_vertices_np(pts[:, 0], pts[:, 1])) == 2
    # duplicates collapse
    assert len(hull_vertices_np(np.array([5, 5, 5]),
                                np.array([7, 7, 7]))) == 1


def test_hull_salted_equals_unsalted(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "gid": rng.integers(0, 5, 400),
        "x": rng.integers(0, 10_000, 400).astype(float),
        "y": rng.integers(0, 10_000, 400).astype(float),
    })
    df = spark.createDataFrame(pdf)
    plain = convex_hull_stats(df, "gid").toPandas() \
        .sort_values("gid").reset_index(drop=True)
    salted = convex_hull_stats(df, "gid", pre_reduce_salt=7).toPandas() \
        .sort_values("gid").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)
    assert (plain["hull_n"] >= 3).all() and (plain["area2"] > 0).all()


def test_hull_coord_bound_guard():
    with pytest.raises(AssertionError, match="3e9"):
        hull_vertices_np(np.array([0, 4_000_000_000, 1]),
                         np.array([0, 1, 2]))


# --------------------------------------------------------------- trajectory
def test_trajectory_closed_form(spark):
    t0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame([
        # user 1: right 3, up 4 (len 3+4=7, net 5), 10 s apart
        {"user_id": 1, "event_id": 1, "ts": t0, "x": 0.0, "y": 0.0},
        {"user_id": 1, "event_id": 2, "ts": t0 + pd.Timedelta(seconds=10),
         "x": 3.0, "y": 0.0},
        {"user_id": 1, "event_id": 3, "ts": t0 + pd.Timedelta(seconds=20),
         "x": 3.0, "y": 4.0},
        # user 2: single ping
        {"user_id": 2, "event_id": 4, "ts": t0, "x": 9.0, "y": 9.0},
        # user 3: duplicate ts — tiebreak on event_id orders 5 then 6
        {"user_id": 3, "event_id": 6, "ts": t0, "x": 10.0, "y": 0.0},
        {"user_id": 3, "event_id": 5, "ts": t0, "x": 0.0, "y": 0.0},
    ])
    got = trajectory_stats(
        spark.createDataFrame(pdf), tiebreak="event_id"
    ).toPandas().set_index("user_id").sort_index()
    assert got.loc[1, "path_len"] == 7.0
    assert got.loc[1, "net_disp"] == 5.0
    assert got.loc[1, "max_seg"] == 4.0
    assert got.loc[1, "dur_s"] == 20.0
    assert got.loc[1, "avg_speed"] == 7.0 / 20.0
    assert got.loc[2, "path_len"] == 0.0 and got.loc[2, "n_events"] == 1
    assert pd.isna(got.loc[2, "avg_speed"]) and got.loc[2, "dur_s"] == 0.0
    # tiebreak: 5 → 6 means the segment runs (0,0)→(10,0)
    assert got.loc[3, "path_len"] == 10.0 and got.loc[3, "dur_s"] == 0.0


# --------------------------------------------------------------------- IDW
def test_idw_closed_form_and_empty(spark):
    probes = spark.createDataFrame(pd.DataFrame({
        "probe_id": [1, 2, 3],
        "x": [0.0, 1000.0, 90_000.0],   # probe 3 is far from everything
        "y": [0.0, 0.0, 90_000.0],
    }))
    obs = spark.createDataFrame(pd.DataFrame({
        "x": [0.0, 3.0, 600.0],
        "y": [0.0, 4.0, 800.0],
        "v": [10.0, 20.0, 40.0],
    }))
    got = idw_interpolate(probes, obs, radius=100.0, value="v") \
        .toPandas().set_index("probe_id").sort_index()
    # probe 1: obs at d²=0 (w=1), d²=25 (w=1/26); obs 3 outside R
    w2 = 1.0 / 26.0
    assert got.loc[1, "n_obs"] == 2
    assert got.loc[1, "est"] == pytest.approx(
        (10.0 + 20.0 * w2) / (1.0 + w2), rel=1e-12)
    assert got.loc[2, "n_obs"] == 0 and pd.isna(got.loc[2, "est"])
    assert got.loc[3, "n_obs"] == 0


def test_idw_cell_join_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    probes = pd.DataFrame({
        "probe_id": range(60),
        "x": rng.integers(0, 5000, 60).astype(float),
        "y": rng.integers(0, 5000, 60).astype(float)})
    obs = pd.DataFrame({
        "x": rng.integers(0, 5000, 500).astype(float),
        "y": rng.integers(0, 5000, 500).astype(float),
        "v": rng.normal(size=500)})
    got = idw_interpolate(spark.createDataFrame(probes),
                          spark.createDataFrame(obs), 400.0, value="v") \
        .toPandas().set_index("probe_id").sort_index()
    # NumPy brute force
    d2 = ((probes["x"].to_numpy()[:, None] - obs["x"].to_numpy()) ** 2
          + (probes["y"].to_numpy()[:, None] - obs["y"].to_numpy()) ** 2)
    m = d2 <= 400.0 ** 2
    w = np.where(m, 1.0 / (1.0 + d2), 0.0)
    n_obs = m.sum(axis=1)
    with np.errstate(invalid="ignore"):
        est = (w @ obs["v"].to_numpy()) / w.sum(axis=1)
    assert (got["n_obs"].to_numpy() == n_obs).all()
    ok = n_obs > 0
    np.testing.assert_allclose(got["est"].to_numpy()[ok], est[ok],
                               rtol=1e-9)
    assert got["est"][~pd.Series(ok, index=got.index)].isna().all()


# -------------------------------------------------------- geometric median
def test_geometric_median_matches_numpy_weiszfeld(spark):
    from extract_sf_r_parallel_spark.operators.median import geometric_median
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "gid": rng.integers(0, 4, 300),
        "x": rng.integers(0, 20_000, 300).astype(float),
        "y": rng.integers(0, 20_000, 300).astype(float)})
    got = geometric_median(spark.createDataFrame(pdf), iters=3) \
        .toPandas().set_index("gid").sort_index()
    for gid, grp in pdf.groupby("gid"):
        p = grp[["x", "y"]].to_numpy()
        e = p.mean(axis=0)
        dists = [np.sqrt(((p - e) ** 2).sum(axis=1)).sum()]
        for _ in range(3):
            w = 1.0 / np.sqrt(1.0 + ((p - e) ** 2).sum(axis=1))
            e = (p * w[:, None]).sum(axis=0) / w.sum()
            dists.append(np.sqrt(((p - e) ** 2).sum(axis=1)).sum())
        assert got.loc[gid, "med_x"] == pytest.approx(e[0], rel=1e-9)
        assert got.loc[gid, "med_y"] == pytest.approx(e[1], rel=1e-9)
        assert got.loc[gid, "n"] == len(grp)
        # Weiszfeld descends the sum-of-distances objective
        assert dists[-1] < dists[0]


def test_geometric_median_zero_iters_is_mean(spark):
    from extract_sf_r_parallel_spark.operators.median import geometric_median
    pdf = pd.DataFrame({"gid": [1, 1, 1, 2],
                        "x": [0.0, 3.0, 6.0, 5.0],
                        "y": [0.0, 0.0, 0.0, 7.0]})
    got = geometric_median(spark.createDataFrame(pdf), iters=0) \
        .toPandas().set_index("gid")
    assert got.loc[1, "med_x"] == 3.0 and got.loc[1, "med_y"] == 0.0
    assert got.loc[2, "med_x"] == 5.0 and got.loc[2, "med_y"] == 7.0
    with pytest.raises(ValueError, match="iters"):
        geometric_median(spark.createDataFrame(pdf), iters=-1)


# -------------------------------------------------------------------- Sobel
def test_sobel_matches_direct_convolution(spark):
    from extract_sf_r_parallel_spark.data import codec, synth
    from extract_sf_r_parallel_spark.operators.multimodal import sobel_stats

    pdf = synth.images_pdf(9)
    got = sobel_stats(spark.createDataFrame(pdf)).toPandas() \
        .set_index("image_id").sort_index()
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    for r in pdf.itertuples():
        v = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)[..., 0] \
            .astype(np.int64)
        h, w = v.shape
        gx = np.zeros((h - 2, w - 2), dtype=np.int64)
        gy = np.zeros((h - 2, w - 2), dtype=np.int64)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                blk = v[1 + dr:h - 1 + dr, 1 + dc:w - 1 + dc]
                gx += blk * kx[dr + 1, dc + 1]
                gy += blk * kx.T[dr + 1, dc + 1]
        g = np.abs(gx) + np.abs(gy)
        assert got.loc[r.image_id, "edge_energy"] == g.sum()
        assert got.loc[r.image_id, "max_grad"] == g.max()


# ------------------------------------------------------------ hull centroid
def test_hull_centroid_closed_forms(spark):
    # unit squares / triangles with known centroids, two groups
    rows = []
    for gid, pts, _cent in [
        (0, [(0, 0), (6, 0), (6, 6), (0, 6), (3, 3)], (3.0, 3.0)),
        (1, [(0, 0), (9, 0), (0, 9), (1, 1), (2, 3)], (3.0, 3.0)),
    ]:
        rows += [(gid, float(px), float(py)) for px, py in pts]
    df = spark.createDataFrame(rows, "gid int, x double, y double")
    st = convex_hull_stats(df, group="gid").toPandas().set_index("gid")
    for gid, pts, cent in [(0, None, (3.0, 3.0)), (1, None, (3.0, 3.0))]:
        a2 = st.loc[gid, "area2"]
        assert a2 > 0
        assert st.loc[gid, "cx_num"] / (3.0 * a2) == cent[0]
        assert st.loc[gid, "cy_num"] / (3.0 * a2) == cent[1]


def test_hull_centroid_salted_equals_plain(spark):
    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({
        "gid": rng.integers(0, 5, 600),
        "x": rng.integers(0, 10_000, 600).astype(float),
        "y": rng.integers(0, 10_000, 600).astype(float)})
    df = spark.createDataFrame(pdf)
    plain = convex_hull_stats(df, group="gid").toPandas() \
        .sort_values("gid").reset_index(drop=True)
    salted = convex_hull_stats(df, group="gid", pre_reduce_salt=7) \
        .toPandas().sort_values("gid").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)
