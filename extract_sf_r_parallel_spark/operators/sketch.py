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

__all__ = ["hll_registers", "hll_merge", "hll_estimate",
           "bloom_bits", "bloom_probe", "cms_grid", "cms_estimate",
           "hist_bins", "hist_quantiles"]

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


# --------------------------------------------------------------------
# Bloom filter — the semi-join pre-filter: build a tiny bitset over the
# small side's keys, broadcast it, and drop non-members of the 100 TB
# side at the SCAN, before any shuffle. Same register-table design as
# the HLL above: the filter IS a table of set bit positions (≤ k·n
# rows, deduped), OR-mergeable by plain union+distinct, and every bit
# is md5-derived so a SQL oracle replays membership exactly —
# INCLUDING the false positives, which are deterministic given
# (m, k, salt).
# --------------------------------------------------------------------

def _bloom_pos(col: Column, i: int, m: int, salt: str) -> Column:
    h = F.md5(F.concat(col.cast("string"), F.lit(f":{salt}{i}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m


def bloom_bits(df: DataFrame, col: str, m: int = 4096, k: int = 3,
               salt: str = "bloom") -> DataFrame:
    """The set-bit table of a Bloom filter over `col`: one row per
    distinct set position (`bit` ∈ [0, m)). Build is k projections +
    one distinct — map-side combinable, output ≤ m rows regardless of
    input size."""
    parts = [df.select(_bloom_pos(F.col(col), i, m, salt).alias("bit"))
             for i in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_probe(probe: DataFrame, bits: DataFrame, col: str,
                m: int = 4096, k: int = 3,
                salt: str = "bloom", out: str = "in_bloom") -> DataFrame:
    """Flag each probe row: `out` = true iff ALL k of its bit positions
    are set (member OR false positive — never a false negative). The
    bits table broadcasts (≤ m rows); each position check is one
    broadcast LEFT join, so the probe side never shuffles."""
    marked = bits.withColumn("_set", F.lit(1))
    res = probe
    flags = []
    for i in range(k):
        b = marked.withColumnRenamed("bit", f"_b{i}") \
                  .withColumnRenamed("_set", f"_s{i}")
        res = res.withColumn(f"_p{i}", _bloom_pos(F.col(col), i, m, salt))
        res = res.join(F.broadcast(b), res[f"_p{i}"] == b[f"_b{i}"], "left")
        flags.append(F.col(f"_s{i}").isNotNull())
    cond = flags[0]
    for f in flags[1:]:
        cond = cond & f
    drop = [c for i in range(k) for c in (f"_p{i}", f"_b{i}", f"_s{i}")]
    return res.withColumn(out, cond).drop(*drop)


# --------------------------------------------------------------------
# Count–Min sketch — the frequency twin of the Bloom filter: a
# depth×width counter grid, est(x) = min over rows of grid[i][h_i(x)]
# (always ≥ the true count). ADDITIVE — two sketches merge by
# elementwise sum — so per-partition/per-day sketches roll up without
# rescanning, the property that makes it the heavy-hitter screen at
# 100 TB. The grid is exact integer counts over md5-derived columns,
# so the oracle rebuilds every cell.
# --------------------------------------------------------------------

def cms_grid(df: DataFrame, col: str, width: int = 256, depth: int = 4,
             salt: str = "cms") -> DataFrame:
    """The CMS counter grid over `col`: (sk_row, cell, cnt) for occupied
    cells — ≤ depth·width rows regardless of input size. One explode
    over `depth` literal rows + one map-side-combinable groupBy."""
    rows = None
    for i in range(depth):
        p = df.select(F.lit(i).alias("sk_row"),
                      (_bloom_pos(F.col(col), i, width, salt)).alias("cell"))
        rows = p if rows is None else rows.unionByName(p)
    return rows.groupBy("sk_row", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(grid: list[tuple[int, int, int]], key,
                 width: int = 256, depth: int = 4,
                 salt: str = "cms") -> int:
    """Driver-side point estimate from collected grid rows: min over
    the key's depth cells (0 if any cell is unoccupied)."""
    import hashlib
    occupied = {(r, c): n for r, c, n in grid}
    est = None
    for i in range(depth):
        h = hashlib.md5(f"{key}:{salt}{i}".encode()).hexdigest()
        cell = int(h[:15], 16) % width
        v = occupied.get((i, cell), 0)
        est = v if est is None else min(est, v)
    return est or 0


def hist_bins(df: DataFrame, value: str, keys: tuple[str, ...],
              bin_width: float = 2.0, n_bins: int = 256) -> DataFrame:
    """The fourth sketch next to HLL / Bloom / Count-Min: a mergeable
    equi-width HISTOGRAM for quantile queries — ≤`n_bins` rows per key
    group, additive merge (map-side combinable), the bounded-state
    answer to "p50/p90/p99 of a trillion values" where an exact sort
    is off the table. Bin = floor(value / bin_width) clamped to
    [0, n_bins): clamping (not dropping) keeps n exact so ranks stay
    exact; only the answer's resolution is approximate — error is
    bounded by one bin width by construction, never by data skew.
    Returns (keys…, bin, c)."""
    b = F.least(
        F.greatest(F.floor(F.col(value) / bin_width).cast("int"), F.lit(0)),
        F.lit(n_bins - 1))
    return (df.groupBy(*keys, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("c")))


def hist_quantiles(bins: DataFrame, keys: tuple[str, ...],
                   bin_width: float = 2.0,
                   quantiles: tuple[tuple[str, int, int], ...] = (
                       ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)),
                   ) -> DataFrame:
    """Answer quantile queries from a (keys…, bin, c) histogram: the
    sketch answer for quantile num/den is the LOWER EDGE of the bin
    containing the ceil(n·num/den)-th value — all integer arithmetic
    (rank = (n·num + den − 1) div den), so the SQL oracle replays it
    exactly. One cumulative window + one grouped conditional-min."""
    from pyspark.sql import Window as W

    kcols = list(keys)
    w = W.partitionBy(*kcols).orderBy("bin")
    wn = W.partitionBy(*kcols)
    cum = (bins.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(wn)))
    aggs = [F.max("n").alias("n")]
    for name, num, den in quantiles:
        rank = F.expr(f"(n * {num} + {den - 1}) div {den}")
        aggs.append(
            (F.min(F.when(F.col("cum") >= rank, F.col("bin")))
             * F.lit(bin_width)).alias(f"{name}_lo"))
    return cum.groupBy(*kcols).agg(*aggs)
