"""Column profiling — the data-quality screen every ingestion pipeline
runs before training (null rates, cardinality, ranges). One job, one
pass over the data: a single wide aggregate computes every metric for
every column, and the resulting ONE-ROW frame is exploded into the
long (col_name, metric…) layout — so profiling k columns of a 100 TB
table costs one scan + one (tiny) shuffle, never k scans.

Metrics are deliberately order-free (counts, exact distinct, min,
max): no float accumulation an engine could order differently, so the
profile is bit-reproducible. Exact COUNT(DISTINCT) over many columns
expands rows k-fold before the shuffle (Spark's Expand operator);
`approx=True` swaps in approx_count_distinct (HLL) for the
cardinality column — the 100 TB default, one pass, no expand — at the
cost of a ±2% estimate (kept out of the driver oracle, pytest-covered
against a bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_numeric"]


def profile_numeric(df: DataFrame, cols: list[str],
                    approx: bool = False) -> DataFrame:
    """Profile numeric columns: one row per column with n (table
    rows), n_null, n_distinct, min_v, max_v (min/max as double)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    nd = (F.approx_count_distinct if approx else F.countDistinct)
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            nd(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n"),
            (F.col("_n") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"))
        for c in cols])
    return row.select(F.explode(structs).alias("p")).select("p.*")
