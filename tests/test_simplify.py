"""Douglas–Peucker: kernel vs closed-form cases and an independent
float recursion; the Spark operator vs the serial kernel; split-depth
pin for the driver fixture (the unrolled oracle carries 16 levels —
prove 13 suffice, so 16 is margin, not luck); idempotence."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_sf_r_parallel_spark.operators.simplify import (
    dp_keep_mask,
    simplify_lines,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _dp_float(xs, ys, eps):
    """Independent reference: textbook recursive DP with float
    perpendicular distances."""
    keep = np.zeros(len(xs), bool)
    keep[0] = keep[-1] = True

    def rec(i0, i1):
        if i1 - i0 < 2:
            return
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        L = np.hypot(x1 - x0, y1 - y0)
        best, bd = -1, -1.0
        for j in range(i0 + 1, i1):
            if L == 0:
                d = np.hypot(xs[j] - x0, ys[j] - y0)
            else:
                d = abs((x1 - x0) * (y0 - ys[j])
                        - (x0 - xs[j]) * (y1 - y0)) / L
            if d > bd:
                best, bd = j, d
        if bd > eps:
            keep[best] = True
            rec(i0, best)
            rec(best, i1)

    rec(0, len(xs) - 1)
    return keep


def test_collinear_collapses_to_endpoints():
    xs = np.arange(10) * 7.0
    ys = xs * 3.0
    m = dp_keep_mask(xs, ys, eps=1)
    assert m.sum() == 2 and m[0] and m[-1]


def test_single_spike_kept():
    xs = np.arange(9) * 10.0
    ys = np.zeros(9)
    ys[4] = 50.0
    m = dp_keep_mask(xs, ys, eps=30)
    assert m.tolist() == [True, False, False, False, True,
                          False, False, False, True]


def test_degenerate_closed_chord():
    # first == last point (ring): distance falls back to the anchor
    xs = np.array([0.0, 30.0, 30.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 30.0, 30.0, 0.0])
    m = dp_keep_mask(xs, ys, eps=5)
    assert m.all()  # every corner is ~30+ from the anchor


def test_matches_float_recursion():
    rng = np.random.default_rng(51)
    for _ in range(20):
        n = rng.integers(5, 40)
        xs = rng.integers(0, 1000, n).astype(float)
        ys = rng.integers(0, 1000, n).astype(float)
        # eps=37.5: non-integer, so exact int compare can't tie with
        # the float reference's strict inequality
        assert (dp_keep_mask(xs, ys, 37.5)
                == _dp_float(xs, ys, 37.5)).all()


def test_spark_operator_matches_serial(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        _SIMPLIFY_EPS,
        line_vertices_df,
    )
    v = line_vertices_df(spark, SF001).toPandas()
    got = simplify_lines(
        line_vertices_df(spark, SF001), eps=_SIMPLIFY_EPS
    ).toPandas().sort_values(["line_id", "idx"]).reset_index(drop=True)
    parts = []
    for lid, g in v.sort_values("idx").groupby("line_id"):
        m = dp_keep_mask(g.x.to_numpy(), g.y.to_numpy(), _SIMPLIFY_EPS)
        parts.append(g[m])
    want = pd.concat(parts).sort_values(["line_id", "idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns])
    assert 0 < len(got) < len(v)


def test_oracle_depth_13_suffices_at_sf001_and_sf01():
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        _SIMPLIFY_DEPTH,
        _simplify_oracle,
    )
    assert _SIMPLIFY_DEPTH == 16
    for sf in (SF001, SF01):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
        d13 = con.sql(_simplify_oracle(depth=13)).df()
        d16 = con.sql(_simplify_oracle(depth=16)).df()
        assert len(d13) == len(d16)  # nothing splits below level 13


def test_idempotent(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        line_vertices_df,
    )
    once = simplify_lines(line_vertices_df(spark, SF001), eps=600)
    twice = simplify_lines(once, eps=600)
    assert twice.count() == once.count()
