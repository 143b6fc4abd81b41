"""Distributed global-order primitives — rank / ntile / running sum
under a TOTAL order without a single-partition window (VERDICT r07
wrong-#1 / next-#3).

An unpartitioned `Window.orderBy(...)` plans as ONE sort task holding
the whole frame: correct and cheap on a 25-row nation rollup, a
straggler (or an OOM) on a 10⁸-row per-customer rollup at 100 TB. The
scale-safe shape used here is the classic three-step:

1. `repartitionByRange(P, order…)` — range-disjoint partitions in the
   total order, then `localCheckpoint()` to PIN both the rows and the
   partitioning (the offsets job and the main job must see the same
   split; checkpointing also stops the upstream rollup from being
   recomputed by both jobs);
2. one tiny per-partition (count, sum) collect — P rows, plan-time
   metadata exactly like domain_mix's histogram walk;
3. per-partition `row_number`/running-`sum` windows (each partition is
   one range slice, so the window shuffle is by partition id — P
   balanced groups, never one task) plus the broadcast prefix offsets.

Exactness: the total order must be TOTAL (callers append a unique
tiebreak key, same as the oracles); ranks are then unique and the
running sum over int64 is the same exact integer regardless of which
partition boundary split the order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "with_global_cumsum", "ntile_from_rank"]


def _pinned_range_parts(df: DataFrame, order_cols: list[Column],
                        n_parts: int | None):
    p = n_parts or df.sparkSession.sparkContext.defaultParallelism
    rp = df.repartitionByRange(p, *order_cols).localCheckpoint()
    return rp.withColumn("_pid", F.spark_partition_id())


def _prefix_offsets(withpid: DataFrame, sum_col: str | None):
    """Per-partition (count, sum) → exclusive prefix offsets, collected
    driver-side (P rows — plan metadata, not data)."""
    aggs = [F.count(F.lit(1)).alias("_c")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_s"))
    rows = sorted((r["_pid"], r) for r in
                  withpid.groupBy("_pid").agg(*aggs).collect())
    out, c_off, s_off = [], 0, 0
    for pid, r in rows:
        out.append((pid, c_off, s_off))
        c_off += r["_c"]
        s_off += (r["_s"] or 0) if sum_col is not None else 0
    spark = withpid.sparkSession
    off = spark.createDataFrame(out, "_pid int, _coff long, _soff long")
    return F.broadcast(off), c_off


def with_global_rank(df: DataFrame, order_cols: list[Column],
                     out: str = "_rank",
                     n_parts: int | None = None) -> tuple[DataFrame, int]:
    """df + int64 `out` = 1-based rank under the total order; also
    returns the exact row count (free from the offsets pass)."""
    withpid = _pinned_range_parts(df, order_cols, n_parts)
    off, n = _prefix_offsets(withpid, None)
    w = W.partitionBy("_pid").orderBy(*order_cols)
    ranked = (withpid.join(off, "_pid")
              .withColumn(out, (F.row_number().over(w).cast("long")
                                + F.col("_coff")))
              .drop("_pid", "_coff", "_soff"))
    return ranked, n


def with_global_cumsum(df: DataFrame, order_cols: list[Column],
                       sum_col: str, out: str = "_cum",
                       n_parts: int | None = None) -> DataFrame:
    """df + int64 `out` = running SUM(sum_col) under the total order
    (inclusive of the current row) — exact int64 arithmetic."""
    withpid = _pinned_range_parts(df, order_cols, n_parts)
    off, _ = _prefix_offsets(withpid, sum_col)
    w = (W.partitionBy("_pid").orderBy(*order_cols)
         .rowsBetween(W.unboundedPreceding, 0))
    return (withpid.join(off, "_pid")
            .withColumn(out, F.sum(sum_col).over(w) + F.col("_soff"))
            .drop("_pid", "_coff", "_soff"))


def ntile_from_rank(rank: Column, n: int, tiles: int) -> Column:
    """SQL NTILE(tiles) from a unique 1-based rank over `n` rows: the
    first (n mod tiles) buckets take ceil(n/tiles) rows, the rest
    floor(n/tiles) — exactly the Spark/DuckDB NTILE rule (pinned by
    tests/test_global_order.py against F.ntile). Pure Column
    arithmetic, so the assignment needs no window at all once the
    rank exists."""
    b, r = n // tiles, n % tiles
    big = r * (b + 1)
    if b == 0:
        # fewer rows than tiles: rank i lands in bucket i
        return rank.cast("int")
    return (F.when(rank <= big, (rank - 1) / (b + 1))
            .otherwise(r + (rank - big - 1) / b)
            .cast("int") + 1)
