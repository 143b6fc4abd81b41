"""Focal statistics + pyramid rollup: the sparse scatter plan must
match a dense NumPy convolution (the classic raster formulation), and
every pyramid level must re-sum to the base level exactly."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.focal import (
    focal_stats,
    pyramid_rollup,
)


@pytest.fixture(scope="module")
def cells_pdf():
    rng = np.random.default_rng(21)
    # ~60% occupancy on a 12x12 grid, values 1..99
    pts = rng.random((12, 12)) < 0.6
    xs, ys = np.nonzero(pts)
    return pd.DataFrame({
        "cell_x": xs.astype(np.int32),
        "cell_y": ys.astype(np.int32),
        "value": rng.integers(1, 100, len(xs)),
    })


def _dense_focal(pdf, radius):
    """Dense-raster reference: NaN-aware moving window (na.rm=TRUE)."""
    nx, ny = pdf.cell_x.max() + 1, pdf.cell_y.max() + 1
    grid = np.full((nx + 2 * radius, ny + 2 * radius), np.nan)
    grid[pdf.cell_x + radius, pdf.cell_y + radius] = pdf.value
    rows = {}
    for _, r in pdf.iterrows():
        w = grid[r.cell_x:r.cell_x + 2 * radius + 1,
                 r.cell_y:r.cell_y + 2 * radius + 1]
        rows[(r.cell_x, r.cell_y)] = (
            int(np.sum(~np.isnan(w))), float(np.nansum(w)),
            float(np.nanmax(w)))
    return rows


@pytest.mark.parametrize("radius", [1, 2])
def test_focal_matches_dense_convolution(spark, cells_pdf, radius):
    got = focal_stats(spark.createDataFrame(cells_pdf),
                      radius=radius).toPandas()
    want = _dense_focal(cells_pdf, radius)
    assert len(got) == len(cells_pdf)
    for _, r in got.iterrows():
        n, s, mx = want[(r.cell_x, r.cell_y)]
        assert r.focal_n == n
        assert r.focal_sum == s
        assert r.focal_max == mx
        assert r.focal_mean == pytest.approx(s / n)


def test_focal_isolated_cell_sees_only_itself(spark):
    pdf = pd.DataFrame({"cell_x": [0, 10], "cell_y": [0, 10],
                        "value": [7, 3]})
    got = focal_stats(spark.createDataFrame(pdf)) \
        .orderBy("cell_x").toPandas()
    assert got.focal_n.tolist() == [1, 1]
    assert got.focal_sum.tolist() == [7, 3]
    assert got.focal_mean.tolist() == [7.0, 3.0]


def test_pyramid_levels_conserve_total(spark, cells_pdf):
    got = pyramid_rollup(spark.createDataFrame(cells_pdf),
                         levels=4).toPandas()
    base_total = cells_pdf.value.sum()
    per_level = got.groupby("level").total.sum()
    assert (per_level == base_total).all()
    # each level at least quarters the cell count (monotone coarsening)
    n = got.groupby("level").size()
    assert (n.diff().dropna() <= 0).all()
    # level-3 coords are the base coords >> 3
    lv3 = got[got.level == 3]
    want = {(x // 8, y // 8) for x, y in
            zip(cells_pdf.cell_x, cells_pdf.cell_y)}
    assert set(zip(lv3.cell_x, lv3.cell_y)) == want


def test_hillshade_flat_and_plane(spark):
    """Flat terrain shades to 12/14 everywhere (gx=gy=0); a uniform
    x-slope plane h=5x gives gx=10, gy=0 -> shade known in closed
    form; borders (missing stencil neighbours) are excluded."""
    import pandas as pd

    n = 10
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    flat = pd.DataFrame({"cell_x": xs.ravel(), "cell_y": ys.ravel(),
                         "value": np.zeros(n * n, dtype=np.int64)})
    from extract_sf_r_parallel_spark.operators.focal import hillshade
    out = hillshade(spark.createDataFrame(flat), block=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_interior == (n - 2) ** 2
    assert r.min_shade == r.max_shade == 12.0 / (7 * 2.0)

    plane = flat.assign(value=(5 * xs.ravel()).astype(np.int64))
    r = hillshade(spark.createDataFrame(plane), block=100).collect()[0]
    want = (-2 * 10 + 12) / (7 * np.sqrt(10 * 10 + 4.0))
    assert r.min_shade == r.max_shade == want


def test_hillshade_rejects_inexact_light_norm(spark):
    import pandas as pd

    from extract_sf_r_parallel_spark.operators.focal import hillshade
    df = spark.createDataFrame(pd.DataFrame(
        {"cell_x": [0], "cell_y": [0], "value": [0]}))
    with pytest.raises(ValueError, match="perfect square"):
        hillshade(df, light=(1, 1, 1))


# ---------------------------------------------------------- contour cases
def test_contour_cases_match_direct(spark):
    import numpy as np
    import pandas as pd
    from extract_sf_r_parallel_spark.operators.focal import contour_cases

    rng = np.random.default_rng(9)
    h = rng.integers(0, 10, (9, 9)).astype(np.int64)
    rows = [(xx, yy, int(h[yy, xx])) for yy in range(9) for xx in range(9)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    got = contour_cases(df, iso=5, x="cx", y="cy", value="v",
                        block=3).toPandas()
    exp = {}
    for yy in range(8):           # squares need all 4 corners in-grid
        for xx in range(8):
            case = (int(h[yy, xx] >= 5) + 2 * int(h[yy, xx + 1] >= 5)
                    + 4 * int(h[yy + 1, xx + 1] >= 5)
                    + 8 * int(h[yy + 1, xx] >= 5))
            key = (xx // 3, yy // 3, case)
            exp[key] = exp.get(key, 0) + 1
    assert {(r.bx, r.by, r.mcase): r.n for r in got.itertuples()} == exp
    assert got.n.sum() == 64      # every interior square classified once


def test_contour_uniform_grid_single_case(spark):
    import pandas as pd
    from extract_sf_r_parallel_spark.operators.focal import contour_cases
    rows = [(xx, yy, 7) for yy in range(5) for xx in range(5)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    above = contour_cases(df, iso=3, x="cx", y="cy", value="v",
                          block=100).toPandas()
    assert set(above.mcase) == {15} and above.n.sum() == 16
    below = contour_cases(df, iso=9, x="cx", y="cy", value="v",
                          block=100).toPandas()
    assert set(below.mcase) == {0}
