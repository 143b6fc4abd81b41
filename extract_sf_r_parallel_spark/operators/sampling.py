"""Deterministic dataset splitting and stratified sampling — the
reproducibility primitives of a training-data pipeline: every row's
train/val/test assignment (and every sampling decision) is a pure
function of its id and a salt, so reruns, backfills, and incremental
appends land rows in the same split with no stored state and no RNG.

Spark-first shape: one md5 over (id || ':' || salt), the first 8 hex
chars parsed to an integer bucket, compared against precomputed
thresholds — all built-in JVM expressions, no UDFs, no shuffle (the
assignment is a row-local projection; only the stats queries on top
aggregate). md5 is bit-identical across engines, which is what makes
the driver's DuckDB oracle replay every assignment exactly.

Scale notes (100 TB): assignment is embarrassingly parallel and
filter-pushdown-friendly (a split filter prunes at the scan when the
split column is materialized/partitioned on); changing the salt
re-rolls every assignment — version salts like schema ("v1:train").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_split", "stratified_sample"]

_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str,
                buckets: int = _BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(id ':' salt) — the
    first 8 hex chars (32 bits) parsed base-16. Deterministic and
    engine-portable (md5 is md5 everywhere)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_split(df: DataFrame,
               weights: Sequence[tuple[str, float]] = (
                   ("train", 0.8), ("val", 0.1), ("test", 0.1)),
               id_col: str = "doc_id", salt: str = "split",
               out: str = "split",
               buckets: int = _BUCKETS) -> DataFrame:
    """Label every row with its split: bucket < floor(0.8·buckets) →
    train, < floor(0.9·buckets) → val, else test (cumulative
    thresholds, floor'd to exact integers so both engines compare the
    same boundary). Weights must sum to 1."""
    ws = list(weights)
    assert abs(sum(w for _, w in ws) - 1.0) < 1e-9, "weights must sum to 1"
    b = hash_bucket(F.col(id_col), salt, buckets)
    cum = 0.0
    expr = None
    for name, w in ws[:-1]:
        cum += w
        t = int(cum * buckets)
        expr = F.when(b < t, name) if expr is None else expr.when(b < t, name)
    expr = expr.otherwise(ws[-1][0]) if expr is not None else F.lit(ws[0][0])
    return df.withColumn(out, expr)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "sample", default_rate: float = 0.0,
                      buckets: int = _BUCKETS) -> DataFrame:
    """Keep each row with its stratum's EXACT deterministic rate:
    bucket < floor(rate·buckets). The per-stratum rate map is a
    literal CASE chain (strata are few — languages, sources, quality
    tiers); rows in unlisted strata keep `default_rate`. The classic
    rebalancing op (downsample the dominant language, keep the rare
    ones) with reproducible membership."""
    b = hash_bucket(F.col(id_col), salt, buckets)
    t = None
    for k, r in rates.items():
        c = F.when(F.col(strata_col) == k, int(r * buckets))
        t = c if t is None else t.when(F.col(strata_col) == k, int(r * buckets))
    t = t.otherwise(int(default_rate * buckets)) if t is not None \
        else F.lit(int(default_rate * buckets))
    return df.filter(b < t)
