"""D8 flow direction: the scatter+argmax plan must match a direct
per-cell NumPy sweep — steepest descent, √2-normalized diagonals,
smallest-code ties, pit/flat code 0."""

import numpy as np
import pandas as pd

from extract_sf_r_parallel_spark.operators.focal import (_D8, flow_accum,
                                                         flow_d8)


def brute_d8(h: np.ndarray) -> np.ndarray:
    """Direction grid for interior cells (−1 elsewhere)."""
    H, W = h.shape
    out = np.full((H, W), -1, dtype=int)
    for yy in range(1, H - 1):
        for xx in range(1, W - 1):
            slopes = [((h[yy, xx] - h[yy + dy, xx + dx])
                       / np.sqrt(float(k)), d) for dx, dy, k, d in _D8]
            best = max(s for s, _ in slopes)
            out[yy, xx] = 0 if best <= 0 else min(
                d for s, d in slopes if s == best)
    return out


def _run(spark, h: np.ndarray, block: int):
    H, W = h.shape
    rows = [(xx, yy, int(h[yy, xx])) for yy in range(H) for xx in range(W)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    return flow_d8(df, x="cx", y="cy", value="v", block=block).toPandas()


def test_flow_matches_brute_force_random(spark):
    rng = np.random.default_rng(3)
    h = rng.integers(0, 50, (12, 12)).astype(np.int64)
    got = _run(spark, h, block=4)
    want = brute_d8(h)
    exp = {}
    for yy in range(1, 11):
        for xx in range(1, 11):
            key = (xx // 4, yy // 4, want[yy, xx])
            exp[key] = exp.get(key, 0) + 1
    got_map = {(r.bx, r.by, r.dir): r.n for r in got.itertuples()}
    assert got_map == exp


def test_tilted_plane_drains_one_way(spark):
    # h = x → steepest descent is due West (dir 5) everywhere interior
    h = np.tile(np.arange(10, dtype=np.int64) * 7, (10, 1))
    got = _run(spark, h, block=100)
    assert set(got.dir) == {5}
    assert got.n.sum() == 8 * 8


def test_pit_and_flat_code_zero(spark):
    h = np.full((5, 5), 9, dtype=np.int64)   # flat → code 0
    got = _run(spark, h, block=100)
    assert set(got.dir) == {0} and got.n.sum() == 9
    h2 = h.copy()
    h2[2, 2] = 1                             # pit cell still code 0
    got2 = _run(spark, h2, block=100)
    pit_rows = got2[got2.dir == 0]
    assert pit_rows.n.sum() == 1             # only the pit stays 0


def brute_accum(h: np.ndarray, rounds: int) -> np.ndarray:
    """k-step accumulation over brute_d8 directions (interior only)."""
    H, W = h.shape
    want = brute_d8(h)
    step = {d: (dx, dy) for dx, dy, _, d in _D8}
    acc = np.where(want >= 0, 1, 0).astype(np.int64)
    for _ in range(rounds):
        nxt = np.where(want >= 0, 1, 0).astype(np.int64)
        for yy in range(1, H - 1):
            for xx in range(1, W - 1):
                d = want[yy, xx]
                if d > 0:
                    dx, dy = step[d]
                    ty, tx = yy + dy, xx + dx
                    if want[ty, tx] >= 0:    # mass onto edge cells leaves
                        nxt[ty, tx] += acc[yy, xx]
        acc = nxt
    return np.where(want >= 0, acc, 0)


def test_flow_accum_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    h = rng.integers(0, 40, (11, 11)).astype(np.int64)
    rows = [(xx, yy, int(h[yy, xx])) for yy in range(11) for xx in range(11)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["cx", "cy", "v"]))
    got = flow_accum(df, x="cx", y="cy", value="v",
                     rounds=2, block=4).toPandas()
    want = brute_accum(h, rounds=2)
    exp = {}
    for yy in range(1, 10):
        for xx in range(1, 10):
            k = (xx // 4, yy // 4)
            s, m = exp.get(k, (0, 0))
            exp[k] = (s + want[yy, xx], max(m, want[yy, xx]))
    got_map = {(r.bx, r.by): (r.sum_acc, r.max_acc)
               for r in got.itertuples()}
    assert got_map == exp
    # a tilted plane: every interior cell drains west; after 2 rounds
    # acc = min(3, cells to its east within the interior strip)
    h2 = np.tile(np.arange(8, dtype=np.int64) * 5, (8, 1))
    rows2 = [(xx, yy, int(h2[yy, xx])) for yy in range(8) for xx in range(8)]
    df2 = spark.createDataFrame(pd.DataFrame(rows2, columns=["cx", "cy", "v"]))
    got2 = flow_accum(df2, x="cx", y="cy", value="v",
                      rounds=2, block=100).toPandas()
    # interior cols x=1..6, 6 rows: acc by col = [3,3,3,3,2,1] per row
    assert int(got2.sum_acc.iloc[0]) == 6 * (3 + 3 + 3 + 3 + 2 + 1)
    assert int(got2.max_acc.iloc[0]) == 3
