"""Grid-density clustering: labels must match a serial flood fill on
hand-built density patterns, and noise (sub-threshold) cells never
join a cluster."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.cluster import grid_cluster


def _points_at(cells, per_cell, cell=10.0):
    """per_cell points jittered inside each listed cell."""
    rng = np.random.default_rng(41)
    rows = []
    for cx, cy in cells:
        for _ in range(per_cell):
            rows.append((cx * cell + rng.uniform(0.1, cell - 0.1),
                         cy * cell + rng.uniform(0.1, cell - 0.1)))
    return pd.DataFrame(rows, columns=["x", "y"])


@pytest.mark.parametrize("cc", ["local", "star"])
def test_two_blobs_and_noise(spark, cc):
    # blob A: L-shaped 3-cell patch; blob B: diagonal-touching pair
    # (8-neighbourhood joins diagonals); one dense isolated cell;
    # a sprinkle of sub-threshold noise cells
    blob_a = [(0, 0), (1, 0), (1, 1)]
    blob_b = [(5, 5), (6, 6)]
    solo = [(9, 0)]
    pdf = pd.concat([
        _points_at(blob_a + blob_b + solo, per_cell=5),
        _points_at([(3, 3), (7, 1), (0, 9)], per_cell=2),  # noise
    ])
    out = grid_cluster(spark.createDataFrame(pdf), cell=10.0,
                       min_pts=5, cc=cc).toPandas().sort_values("cluster")
    assert len(out) == 3
    assert sorted(out.n_cells.tolist()) == [1, 2, 3]
    assert out.n_points.sum() == 6 * 5  # noise points excluded
    a = out[out.n_cells == 3].iloc[0]
    assert (a.min_cx, a.max_cx, a.min_cy, a.max_cy) == (0, 1, 0, 1)


@pytest.mark.parametrize("cc", ["local", "star"])
def test_snake_chain_is_one_cluster(spark, cc):
    # a 12-cell zigzag chain — the long-diameter shape star-contraction
    # CC must still collapse to ONE label
    chain = [(i, i % 2) for i in range(12)]
    pdf = _points_at(chain, per_cell=4)
    out = grid_cluster(spark.createDataFrame(pdf), cell=10.0,
                       min_pts=4, cc=cc).toPandas()
    assert len(out) == 1
    assert out.iloc[0].n_cells == 12
    assert out.iloc[0].n_points == 48


def test_no_core_cells_yields_empty(spark):
    pdf = _points_at([(0, 0), (4, 4)], per_cell=2)
    out = grid_cluster(spark.createDataFrame(pdf), cell=10.0,
                       min_pts=10)
    assert out.count() == 0


def test_negative_coordinates_pack_safely(spark):
    pdf = _points_at([(-3, -3), (-2, -3)], per_cell=5)
    out = grid_cluster(spark.createDataFrame(pdf), cell=10.0,
                       min_pts=5).toPandas()
    assert len(out) == 1
    assert out.iloc[0].n_cells == 2
    assert out.iloc[0].min_cx == -3
