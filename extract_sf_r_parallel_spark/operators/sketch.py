"""HyperLogLog distinct-count sketch, from scratch (Flajolet et al.
2007, the public algorithm behind every engine's approx_count_distinct
— reimplemented here so the register state itself is an inspectable,
mergeable, engine-portable table instead of an opaque binary).

Spark-first shape: ONE projection builds (register, rho) from a
deterministic md5-derived 60-bit hash — `conv(substr(md5(id:salt),
1, 15), 16, 10)` — then ONE map-side-combinable groupBy takes the
per-register max. No UDFs; `bin()` gives the exact bit length (and
therefore the leading-zero count) in pure JVM expressions, and DuckDB's
identical `bin()` lets the driver oracle replay every register
bit-for-bit (probed: md5, conv/'0x'-cast, and bin agree between
engines).

The sketch is a TABLE of (register, max_rho) — occupied registers
only. That makes it:
- mergeable: union two sketches and re-take max(rho) per register
  (monotone semilattice — associative, commutative, idempotent), so
  per-partition / per-day sketches roll up without rescanning;
- tiny: ≤ 2^p rows regardless of input size (p=9 → ≤512 rows for a
  ~4.6% standard error), so the rollup is a broadcast-scale frame.

Scale notes (100 TB): the scan is embarrassingly parallel, the only
shuffle moves ≤2^p rows per partition after partial aggregation, and
the estimate itself is a driver-side fold over ≤512 rows. This is the
pattern for distinct-users-per-day over a trillion events.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_merge", "hll_estimate"]

_HASH_BITS = 60  # 15 md5 hex chars — fits a signed 64-bit long


def _hash60(col: Column, salt: str) -> Column:
    h = F.md5(F.concat(col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hll_registers(df: DataFrame, col: str, p: int = 9,
                  salt: str = "hll") -> DataFrame:
    """The HLL register table for `col`: (register, max_rho), occupied
    registers only. register = hash mod 2^p; rho = 1 + leading zeros
    of the remaining (60-p)-bit word (rho = w+1 exactly when the word
    is all zeros)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_registers: p={p} out of [4, 16]")
    m = 1 << p
    wbits = _HASH_BITS - p
    h = F.col("_hll_h")
    reg = (h % m).alias("register")
    w = F.expr(f"_hll_h div {m}")
    rho = (F.when(w == 0, F.lit(wbits + 1))
           .otherwise(wbits + 1 - F.length(F.bin(w)))).alias("rho")
    return (df.select(_hash60(F.col(col), salt).alias("_hll_h"))
            .select(reg, rho)
            .groupBy("register").agg(F.max("rho").alias("max_rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables built with the same (p, salt): union +
    per-register max. Exactly the sketch of the unioned inputs."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: list[tuple[int, int]], p: int = 9) -> float:
    """Driver-side Flajolet estimate from the (register, max_rho)
    rows — ≤2^p of them, so this is O(1) work. Applies the standard
    small-range linear-counting correction."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    occupied = dict(registers)
    z = sum(2.0 ** -occupied.get(j, 0) for j in range(m))
    e = alpha * m * m / z
    zeros = m - len(occupied)
    if e <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e
