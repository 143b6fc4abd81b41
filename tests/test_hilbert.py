"""Hilbert curve: the unrolled Spark fold must equal the serial xy2d
walk, and the curve itself must be a unit-step Hamiltonian path (the
locality property Z-order lacks — the whole reason to offer it)."""

import pandas as pd
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.hilbert import (
    cluster_by_hilbert, with_hilbert_code)


def serial_xy2d(order: int, x: int, y: int) -> int:
    d, s = 0, order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_serial_walk(spark):
    bits, n = 4, 16
    cells = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pd.DataFrame(cells, columns=["x", "y"]))
    # extent = n → identity quantization (cell coords are the grid)
    got = {(int(r.x), int(r.y)): r.hd
           for r in with_hilbert_code(df, extent=float(n),
                                      bits=bits).collect()}
    for x in range(n):
        for y in range(n):
            assert got[(x, y)] == serial_xy2d(n, x, y), (x, y)


def test_hilbert_is_unit_step_hamiltonian(spark):
    bits, n = 4, 16
    cells = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pd.DataFrame(cells, columns=["x", "y"]))
    rows = with_hilbert_code(df, extent=float(n), bits=bits).collect()
    walk = sorted(((r.hd, int(r.x), int(r.y)) for r in rows))
    # bijective onto [0, n²)
    assert [w[0] for w in walk] == list(range(n * n))
    # consecutive codes are 4-adjacent cells — the no-jump property
    for (d0, x0, y0), (d1, x1, y1) in zip(walk, walk[1:]):
        assert abs(x1 - x0) + abs(y1 - y0) == 1, (d0, d1)


def test_cluster_by_hilbert_sorts_within_partitions(spark):
    df = spark.range(4096).select(
        (F.col("id") % 64 * 300.0).alias("x"),
        (F.expr("id div 64") * 300.0).alias("y"))
    out = cluster_by_hilbert(df, n_partitions=8)
    parts = out.select("hd").rdd.glom().collect()
    flat_bounds = []
    for p in parts:
        vals = [r.hd for r in p]
        assert vals == sorted(vals)
        if vals:
            flat_bounds.append((vals[0], vals[-1]))
    # range partitioning: partition code ranges don't interleave
    flat_bounds.sort()
    for (lo1, hi1), (lo2, hi2) in zip(flat_bounds, flat_bounds[1:]):
        assert hi1 <= lo2


def test_geohash_matches_python_reference(spark):
    """The unrolled SQL interleave must equal an independent bit-loop
    geohash (longitude-first, 5 bits/char base32) on a point sample."""
    from extract_sf_r_parallel_spark.operators.geohash import (
        GEOHASH_ALPHABET,
        with_geohash,
    )

    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        [(0, 0), (19999, 19999), (10000, 5000), (123, 17456),
         (19995, 2), (7777, 7777)])]
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    got = {r.pid: r.gh for r in with_geohash(df).collect()}

    def ref(x, y):
        qx = int(x) * 32768 // 20000
        qy = int(y) * 32768 // 20000
        code = 0
        for m in range(15):             # lon bit, then lat bit, MSB first
            code = (code << 1) | ((qx >> (14 - m)) & 1)
            code = (code << 1) | ((qy >> (14 - m)) & 1)
        return "".join(GEOHASH_ALPHABET[(code >> (30 - 5 * (k + 1))) & 31]
                       for k in range(6))

    for pid, x, y in pts:
        assert got[pid] == ref(x, y), (pid, x, y)
    # nesting: same 4-char prefix ⇔ same 20-bit cell
    a = ref(10000, 5000)
    b = ref(10000 + 1, 5000)            # 1 unit apart → same coarse cell
    assert a[:4] == b[:4]
