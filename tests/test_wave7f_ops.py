"""Brute-force pins for the r07 wave-J operators: lbp_stats vs a
per-pixel Python LBP loop, raster_line's DDA vs a serial float
midpoint rasterizer, tpi_class vs a NumPy 3×3 neighbor-sum over the
full 800×800 DEM, and jaccard_nodes vs a dict-of-sets recomputation
at sf0.001."""

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import (
    LBP_OFFS, lbp_stats)

SF = "/root/testdata/sf0.001"


# --- LBP --------------------------------------------------------------------

def test_lbp_matches_perpixel_loop(spark):
    rng = np.random.default_rng(53)
    v = rng.integers(0, 256, (9, 13), dtype=np.int64)
    img = np.repeat(v[..., None], 3, axis=2).astype(np.uint8)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(13), "h": np.int32(9), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = lbp_stats(spark.createDataFrame(pdf)).toPandas().iloc[0]
    codes = []
    for r in range(1, 8):
        for c in range(1, 12):
            code = 0
            for k, (dr, dc) in enumerate(LBP_OFFS):
                if v[r + dr, c + dc] >= v[r, c]:
                    code |= 1 << k
            codes.append(code)
    codes = np.array(codes)
    rot = ((codes << 1) | (codes >> 7)) & 255
    trans = np.array([bin(x).count("1") for x in codes ^ rot])
    assert got.n_interior == len(codes)
    assert got.sum_code == codes.sum()
    assert got.n_uniform == int((trans <= 2).sum())
    assert (got.n_q0, got.n_q1, got.n_q2, got.n_q3) == (
        int((codes < 64).sum()),
        int(((codes >= 64) & (codes < 128)).sum()),
        int(((codes >= 128) & (codes < 192)).sum()),
        int((codes >= 192).sum()))


# --- DDA line rasterization -------------------------------------------------

def _dda_cells(x0, y0, x1, y1):
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    out = set()
    for t in range(n + 1):
        # round-half-up linear interpolation == the engine's closed form
        x = x0 + (2 * t * (x1 - x0) + n + 40000 * n) // (2 * n) - 20000
        y = y0 + (2 * t * (y1 - y0) + n + 40000 * n) // (2 * n) - 20000
        assert abs(x - (x0 + t * (x1 - x0) / n)) <= 0.5 + 1e-9
        assert abs(y - (y0 + t * (y1 - y0) / n)) <= 0.5 + 1e-9
        out.add((x // 100, y // 100))
    return out


def test_raster_line_histogram_matches_serial(spark):
    got = E.queries()["raster_line"](spark, SF).toPandas()
    W = 20000
    cov: dict = {}
    for s in range(400):
        x0 = ((s * 48271 + 13) % 999983) % W
        y0 = ((s * 69621 + 7) % 999979) % W
        x1 = ((s * 16807 + 3) % 999983) % W
        y1 = ((s * 65539 + 11) % 999979) % W
        for cell in _dda_cells(x0, y0, x1, y1):
            cov[cell] = cov.get(cell, 0) + 1
    want: dict = {}
    for (gx, gy), k in cov.items():
        n, cs = want.get(k, (0, 0))
        want[k] = (n + 1, cs + gx * 31 + gy)
    assert {r.coverage: (r.n_cells, r.checksum)
            for r in got.itertuples()} == want


# --- TPI --------------------------------------------------------------------

def test_tpi_class_matches_numpy(spark):
    got = E.queries()["tpi_class"](spark, SF).toPandas()
    n = 800
    cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    v = ((cx.astype(np.int64) * 2654435761 + cy * 40503 + 7)
         % 4294967291) % 1000
    s8 = np.zeros_like(v)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if (dx, dy) != (0, 0):
                s8[1:-1, 1:-1] += v[1 + dx:n - 1 + dx, 1 + dy:n - 1 + dy]
    tpi8 = (8 * v - s8)[1:-1, 1:-1]
    bx = (cx[1:-1, 1:-1] // 25).ravel()
    by = (cy[1:-1, 1:-1] // 25).ravel()
    t = tpi8.ravel()
    df = pd.DataFrame({"bx": bx, "by": by, "t": t})
    want = df.groupby(["bx", "by"]).agg(
        n_interior=("t", "size"), sum_tpi8=("t", "sum"),
        n_ridge=("t", lambda s: int((s > 800).sum())),
        n_valley=("t", lambda s: int((s < -800).sum())))
    g = got.set_index(["bx", "by"]).sort_index()
    assert g.shape[0] == want.shape[0] == 1024
    pd.testing.assert_frame_equal(
        g[["n_interior", "sum_tpi8", "n_ridge", "n_valley"]]
        .astype("int64"), want.sort_index().astype("int64"))


# --- node Jaccard -----------------------------------------------------------

def test_jaccard_nodes_matches_sets(spark):
    got = E.queries()["jaccard_nodes"](spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    d = li.drop_duplicates()
    pair_cnt: dict = {}
    for _, basket in d.groupby("l_orderkey")["l_partkey"]:
        bs = sorted(basket)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pair_cnt[(bs[i], bs[j])] = pair_cnt.get(
                    (bs[i], bs[j]), 0) + 1
    nbrs: dict = {}
    for (a, b), c in pair_cnt.items():
        if c >= 2:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = len(nbrs[a] & nbrs[b])
            if common:
                want[(a, b)] = (common, len(nbrs[a]), len(nbrs[b]),
                                3 * common >= len(nbrs[a] | nbrs[b]))
    assert {(r.a, r.b): (r.common, r.deg_a, r.deg_b, r.strong)
            for r in got.itertuples()} == want
