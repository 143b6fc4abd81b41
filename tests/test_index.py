"""Property tests for the hex cell index (SURVEY.md §7 step 2)."""

import numpy as np
import pytest

from extract_sf_r_parallel_spark.geo import index as I
from extract_sf_r_parallel_spark.geo import kernels as K


def test_pack_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.uniform(300000, 900000, 5000)
    y = rng.uniform(5.9e6, 6.5e6, 5000)
    for code in (0, 6, 9):
        cell = I.xy_to_cell(x, y, code)
        c2, q, r = I.cell_to_axial(cell)
        assert (c2 == code).all()
        repacked = I.xy_to_cell(*I.cell_to_center(cell), code)
        assert (repacked == cell).all()


def test_center_within_circumradius():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 100000, 20000)
    y = rng.uniform(0, 100000, 20000)
    code = 5  # edge 512
    cell = I.xy_to_cell(x, y, code)
    cx, cy = I.cell_to_center(cell)
    d = np.hypot(x - cx, y - cy)
    assert d.max() <= I.edge_for_code(code) + 1e-6  # circumradius = edge


def test_total_single_valued_on_boundary():
    # a boundary-ish point maps to exactly one cell (J1 divergence note)
    cell = I.xy_to_cell(np.array([0.0]), np.array([0.0]), 3)
    assert cell.shape == (1,)


def test_kring_size():
    c = int(I.xy_to_cell(np.array([5000.0]), np.array([5000.0]), 4)[0])
    for k in (0, 1, 2, 3):
        assert len(I.kring(c, k)) == 1 + 3 * k * (k + 1)


def test_kring_for_radius_covers_disk():
    """Any point within `radius` of a point in cell c lies in one of the
    kring_for_radius(c) cells — the candidate-pruning soundness property
    that makes the capped distance exact (C_…R:112-117 semantics)."""
    rng = np.random.default_rng(3)
    code = 6  # edge 1024 ≥ maxdist
    radius = 1000.0
    px = rng.uniform(0, 50000, 300)
    py = rng.uniform(0, 50000, 300)
    pc = I.xy_to_cell(px, py, code)
    rings = I.kring_for_radius(pc, radius)
    # random displaced points within radius
    ang = rng.uniform(0, 2 * np.pi, 300)
    rad = rng.uniform(0, radius, 300)
    qx, qy = px + rad * np.cos(ang), py + rad * np.sin(ang)
    qc = I.xy_to_cell(qx, qy, code)
    for i in range(300):
        assert qc[i] in rings[i]


def test_kring_for_radius_covers_disk_high_ratios():
    """The ADVICE r01 regression: at radius/edge ratios ≫ 1 the old
    k = ceil(radius/(√3·e))+1 bound under-covered the disk (~7% misses
    at ratio ≈ 19). Exercise ratios 10–40 against edge 32."""
    rng = np.random.default_rng(13)
    code = 1  # edge 32
    for ratio in (10.0, 19.0, 27.0, 40.0):
        radius = 32.0 * ratio
        px = rng.uniform(0, 20000, 400)
        py = rng.uniform(0, 20000, 400)
        pc = I.xy_to_cell(px, py, code)
        rings = I.kring_for_radius(pc, radius)
        ang = rng.uniform(0, 2 * np.pi, 400)
        # bias displacement toward the boundary (the failure zone)
        rad = radius * np.sqrt(rng.uniform(0.8, 1.0, 400))
        qx, qy = px + rad * np.cos(ang), py + rad * np.sin(ang)
        qc = I.xy_to_cell(qx, qy, code)
        miss = sum(1 for i in range(400) if qc[i] not in rings[i])
        assert miss == 0, f"ratio {ratio}: {miss}/400 target cells missed"


def test_cover_bbox_superset():
    """Every point inside the bbox maps to a cell in the cover."""
    rng = np.random.default_rng(4)
    code = 4
    for _ in range(50):
        x0, y0 = rng.uniform(0, 30000, 2)
        w, h = rng.uniform(10, 8000, 2)
        cover = set(I.cover_bbox(x0, y0, x0 + w, y0 + h, code).tolist())
        sx = rng.uniform(x0, x0 + w, 200)
        sy = rng.uniform(y0, y0 + h, 200)
        cells = I.xy_to_cell(sx, sy, code)
        assert set(cells.tolist()) <= cover


def test_cell_vertices_area():
    c = int(I.xy_to_cell(np.array([1234.0]), np.array([5678.0]), 2)[0])
    ring = I.cell_ring_vertices(c)
    e = I.edge_for_code(2)
    assert abs(K.ring_area(ring)) == pytest.approx(3 * np.sqrt(3) / 2 * e * e, rel=1e-9)


def test_code_for_radius():
    assert I.edge_for_code(I.code_for_radius(1000.0)) == 1024.0
    assert I.edge_for_code(I.code_for_radius(150.0)) == 256.0
