"""Declarative data-quality constraint validation (the Deequ /
expectations pattern — public AWS-labs/Great-Expectations design,
reimplemented Spark-first from scratch): a check suite compiles into
ONE wide aggregate over the table, then explodes to a long
(check_name, metric, threshold-ish, passed) report. The point at
100 TB is the single pass — k checks must never mean k scans, and
every metric here is a map-side-combinable aggregate (counts,
distinct counts, min/max), so the whole suite is one scan + one
1-row shuffle regardless of suite size.

Checks (each a (name, metric Column, pass predicate over the metric)):
- not_null(col):            nulls = 0
- unique(col):              count == approx? NO — exact distinct == count
- in_range(col, lo, hi):    violations = 0
- accepted_values(col, vs): violations = 0
- min_rows(n):              row count ≥ n

All metrics are exact integers → the report hashes identically on any
engine, which is what lets the driver oracle replay the suite as a
UNION ALL of plain SQL aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Check", "not_null", "unique", "in_range",
           "accepted_values", "min_rows", "run_checks"]


class Check:
    def __init__(self, name: str, metric: Column, passes):
        self.name = name
        self.metric = metric          # aggregate Column → BIGINT metric
        self.passes = passes          # metric value Column → BooleanType


def not_null(col: str) -> Check:
    m = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
    return Check(f"not_null({col})", m, lambda v: v == 0)


def unique(col: str) -> Check:
    # duplicates = rows − distinct values (null counts as a value)
    m = F.count(F.lit(1)) - F.countDistinct(F.col(col))
    return Check(f"unique({col})", m, lambda v: v == 0)


def in_range(col: str, lo, hi) -> Check:
    m = F.sum(F.when(F.col(col).isNotNull() &
                     ((F.col(col) < lo) | (F.col(col) > hi)), 1)
              .otherwise(0))
    return Check(f"in_range({col},{lo},{hi})", m, lambda v: v == 0)


def accepted_values(col: str, values: list) -> Check:
    m = F.sum(F.when(F.col(col).isNotNull() &
                     ~F.col(col).isin(values), 1).otherwise(0))
    vs = ",".join(str(v) for v in values)
    return Check(f"accepted_values({col},[{vs}])", m, lambda v: v == 0)


def min_rows(n: int) -> Check:
    return Check(f"min_rows({n})", F.count(F.lit(1)), lambda v: v >= n)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate the whole suite in ONE aggregate pass; returns the long
    report (check_name, metric, passed) — one row per check."""
    aggs = [c.metric.cast("long").alias(f"_m{i}")
            for i, c in enumerate(checks)]
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c.name).alias("check_name"),
                 F.col(f"_m{i}").alias("metric"),
                 c.passes(F.col(f"_m{i}")).alias("passed"))
        for i, c in enumerate(checks)])
    return (wide.select(F.explode(rows).alias("r"))
            .select("r.check_name", "r.metric", "r.passed"))
