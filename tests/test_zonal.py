"""Zonal statistics: the exploded-cover + join plan must match a
brute-force NumPy per-zone scan, keep empty zones with defaults, and
fail loudly on a zone whose cover exceeds the fan-out guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from extract_sf_r_parallel_spark.operators.zonal import zonal_stats

STEP = 10.0


@pytest.fixture(scope="module")
def fixtures(spark):
    rng = np.random.default_rng(7)
    n = 30  # 30x30 cells, pitch 10 -> window [0, 300)
    cells = pd.DataFrame({
        "cx": np.repeat(np.arange(n), n).astype(np.int64),
        "cy": np.tile(np.arange(n), n).astype(np.int64),
        "v": rng.integers(0, 100, n * n).astype(np.int64),
    })
    # drop ~30% of cells -> sparse raster
    cells = cells[rng.random(len(cells)) > 0.3].reset_index(drop=True)
    zx = rng.uniform(-20, 300, 40)
    zy = rng.uniform(-20, 300, 40)
    zw = rng.uniform(0.5, 80, 40)
    zh = rng.uniform(0.5, 80, 40)
    zones = pd.DataFrame({
        "fid": np.arange(40, dtype=np.int64),
        "rxmin": zx, "rymin": zy,
        "rxmax": zx + zw, "rymax": zy + zh,
    })
    return cells, zones


def _brute(cells, zones):
    out = {}
    ctr_x = (cells.cx.to_numpy() + 0.5) * STEP
    ctr_y = (cells.cy.to_numpy() + 0.5) * STEP
    v = cells.v.to_numpy()
    for z in zones.itertuples():
        m = ((z.rxmin <= ctr_x) & (ctr_x <= z.rxmax) &
             (z.rymin <= ctr_y) & (ctr_y <= z.rymax))
        k = int(m.sum())
        out[z.fid] = (k, int(v[m].sum()) if k else 0,
                      float(v[m].sum()) / k if k else None,
                      int(v[m].max()) if k else None)
    return out


def test_matches_brute_force(spark, fixtures):
    cells, zones = fixtures
    got = zonal_stats(spark.createDataFrame(zones),
                      spark.createDataFrame(cells), STEP).toPandas()
    want = _brute(cells, zones)
    assert len(got) == len(zones)
    for r in got.itertuples():
        k, s, m, mx = want[r.fid]
        assert r.n_cells == k and r.sum_v == s
        if k:
            assert r.mean_v == m and r.max_v == mx
        else:
            assert pd.isna(r.mean_v) and pd.isna(r.max_v)


def test_empty_zone_defaults(spark, fixtures):
    cells, _ = fixtures
    zones = spark.createDataFrame(pd.DataFrame({
        "fid": [1], "rxmin": [1000.0], "rymin": [1000.0],
        "rxmax": [1001.0], "rymax": [1001.0]}))
    row = zonal_stats(zones, spark.createDataFrame(cells),
                      STEP).collect()[0]
    assert (row.n_cells, row.sum_v, row.mean_v, row.max_v) == (0, 0, None, None)


def test_fanout_guard_raises(spark, fixtures):
    cells, _ = fixtures
    zones = spark.createDataFrame(pd.DataFrame({
        "fid": [1], "rxmin": [0.0], "rymin": [0.0],
        "rxmax": [1e6], "rymax": [1e6]}))
    with pytest.raises(Exception, match="zonal_stats: zone covers"):
        zonal_stats(zones, spark.createDataFrame(cells), STEP,
                    max_cells_per_zone=100).collect()


def test_plan_broadcasts_zones_not_raster(spark, fixtures):
    cells, zones = fixtures
    df = zonal_stats(spark.createDataFrame(zones),
                     spark.createDataFrame(cells), STEP)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # raster side never shuffles


def test_weighted_matches_brute_force(spark, fixtures):
    """Coverage-weighted zonal: exact overlap-area weights vs a direct
    NumPy computation; total coverage of an in-window zone equals its
    own area / step^2."""
    cells, zones = fixtures
    got = zonal_stats(spark.createDataFrame(zones),
                      spark.createDataFrame(cells), STEP,
                      weighted=True).toPandas().set_index("fid")
    cx = cells.cx.to_numpy()
    cy = cells.cy.to_numpy()
    v = cells.v.to_numpy().astype(float)
    for z in zones.itertuples():
        ow = np.minimum(z.rxmax, (cx + 1) * STEP) - np.maximum(z.rxmin, cx * STEP)
        oh = np.minimum(z.rymax, (cy + 1) * STEP) - np.maximum(z.rymin, cy * STEP)
        w = np.where((ow > 0) & (oh > 0), ow * oh, 0.0)
        r = got.loc[z.fid]
        assert r["n_cells"] == int((w > 0).sum())
        assert r["cov"] == pytest.approx(w.sum() / STEP**2, rel=1e-12)
        assert r["wsum"] == pytest.approx((w * v).sum() / STEP**2, rel=1e-12)
        if w.sum() > 0:
            assert r["wmean"] == pytest.approx((w * v).sum() / w.sum(),
                                               rel=1e-12)
        else:
            assert pd.isna(r["wmean"])


def test_weighted_catches_thin_zone_center_misses(spark, fixtures):
    """A zone thinner than the grid pitch that straddles no cell
    center: center sampling sees nothing, area weighting sees its true
    (small) coverage."""
    cells, _ = fixtures
    # dense raster for this one: fill in every cell so the thin zone
    # surely overlaps live cells
    full = pd.DataFrame({
        "cx": np.repeat(np.arange(30), 30).astype(np.int64),
        "cy": np.tile(np.arange(30), 30).astype(np.int64),
        "v": np.ones(900, dtype=np.int64)})
    thin = spark.createDataFrame(pd.DataFrame({
        "fid": [1], "rxmin": [101.0], "rymin": [0.0],
        "rxmax": [103.0], "rymax": [300.0]}))  # 2 wide, between centers
    rast = spark.createDataFrame(full)
    center = zonal_stats(thin, rast, STEP).collect()[0]
    weighted = zonal_stats(thin, rast, STEP, weighted=True).collect()[0]
    assert center.n_cells == 0
    assert weighted.n_cells == 30
    assert weighted.cov == pytest.approx(2.0 * 300 / STEP**2)
