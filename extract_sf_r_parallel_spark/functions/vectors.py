"""Vector column functions for embedding similarity. The hot path is
JVM-side Catalyst higher-order functions (zip_with + aggregate — no
Python), used both for brute-force cosine and for LSH refinement."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm2", "cosine"]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (left-to-right, matching DuckDB's
    list_inner_product accumulation order for cross-engine parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))
