"""Z-order clustering: the Column-expression Morton code must match a
NumPy reference bit-for-bit, and cluster_by_zorder must leave every
partition covering a non-overlapping z-range (the property min/max
file pruning relies on)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_code,
)


def _np_morton(x, y, extent=20000, bits=16):
    s = 1 << bits
    ix = (x.astype(np.int64) * s) // extent
    iy = (y.astype(np.int64) * s) // extent
    z = np.zeros_like(ix)
    for b in range(bits):
        z |= ((ix >> b) & 1) << (2 * b)
        z |= ((iy >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_code_matches_numpy(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "x": rng.integers(0, 20000, 500).astype(float),
        "y": rng.integers(0, 20000, 500).astype(float),
    })
    got = spark.createDataFrame(pdf) \
        .withColumn("z", zorder_code(F.col("x"), F.col("y"))) \
        .toPandas()
    want = _np_morton(got["x"].to_numpy(), got["y"].to_numpy())
    assert (got["z"].to_numpy() == want).all()


def test_zorder_locality_beats_row_order(spark):
    """Adjacent z codes are spatially close: the mean bbox diagonal of
    64-row z-sorted chunks must be far below that of id-ordered chunks
    (the pruning advantage, quantified)."""
    rng = np.random.default_rng(12)
    n = 4096
    pdf = pd.DataFrame({
        "pid": np.arange(n),
        "x": rng.integers(0, 20000, n).astype(float),
        "y": rng.integers(0, 20000, n).astype(float),
    })
    z = _np_morton(pdf["x"].to_numpy(), pdf["y"].to_numpy())

    def mean_diag(order):
        d = []
        for i in range(0, n, 64):
            c = pdf.iloc[order[i:i + 64]]
            d.append(np.hypot(c.x.max() - c.x.min(), c.y.max() - c.y.min()))
        return float(np.mean(d))

    assert mean_diag(np.argsort(z)) < 0.25 * mean_diag(np.arange(n))


def test_cluster_by_zorder_partitions_non_overlapping(spark):
    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({
        "x": rng.integers(0, 20000, 2000).astype(float),
        "y": rng.integers(0, 20000, 2000).astype(float),
    })
    out = cluster_by_zorder(spark.createDataFrame(pdf), n_partitions=8)
    parts = out.select(F.spark_partition_id().alias("p"), "z") \
        .groupBy("p").agg(F.min("z").alias("lo"), F.max("z").alias("hi")) \
        .toPandas().sort_values("lo").reset_index(drop=True)
    assert len(parts) > 1
    for i in range(1, len(parts)):
        assert parts.loc[i, "lo"] > parts.loc[i - 1, "hi"]


def test_quantize_float_coords_property(spark):
    """Float-coordinate pre-scale (the off-synthetic-grid path): the
    Spark grid index must equal Python floor((x−o)/s) for random
    floats including negatives, the composed
    zorder_code(quantize(...), extent=2^bits) must equal the NumPy
    Morton interleave of those indices, the DuckDB replay string must
    agree, and out-of-grid coords must fail loudly."""
    import duckdb
    import pytest
    from pyspark.errors import SparkRuntimeException

    from extract_sf_r_parallel_spark.operators.zorder import (
        quantize,
        quantize_sql,
        zorder_code,
    )
    rng = np.random.default_rng(23)
    bits = 10
    x0, y0, step = -350.75, 1200.125, 3.7
    pdf = pd.DataFrame({
        "x": x0 + rng.uniform(0, (1 << bits) * step, 800),
        "y": y0 + rng.uniform(0, (1 << bits) * step, 800),
    })
    got = spark.createDataFrame(pdf).select(
        "x", "y",
        quantize(F.col("x"), x0, step, bits).alias("ix"),
        quantize(F.col("y"), y0, step, bits).alias("iy"),
        zorder_code(quantize(F.col("x"), x0, step, bits),
                    quantize(F.col("y"), y0, step, bits),
                    extent=float(1 << bits), bits=bits).alias("z"),
    ).toPandas()
    ix = np.floor((got["x"].to_numpy() - x0) / step).astype(np.int64)
    iy = np.floor((got["y"].to_numpy() - y0) / step).astype(np.int64)
    assert (got["ix"].to_numpy() == ix).all()
    assert (got["iy"].to_numpy() == iy).all()
    z = np.zeros_like(ix)
    for b in range(bits):
        z |= ((ix >> b) & 1) << (2 * b)
        z |= ((iy >> b) & 1) << (2 * b + 1)
    assert (got["z"].to_numpy() == z).all()

    # DuckDB replay parity on the same rows
    con = duckdb.connect()
    con.register("pts", pdf)
    d = con.sql(f"SELECT {quantize_sql('x', x0, step)} AS ix, "
                f"{quantize_sql('y', y0, step)} AS iy FROM pts").df()
    wx = np.floor((pdf["x"].to_numpy() - x0) / step).astype(np.int64)
    wy = np.floor((pdf["y"].to_numpy() - y0) / step).astype(np.int64)
    assert (d["ix"].to_numpy() == wx).all()
    assert (d["iy"].to_numpy() == wy).all()

    # out-of-grid → loud failure, not silent aliasing
    bad = spark.createDataFrame(pd.DataFrame({"x": [x0 - 10.0]}))
    with pytest.raises(SparkRuntimeException, match="outside"):
        bad.select(quantize(F.col("x"), x0, step, bits).alias("i")).collect()
