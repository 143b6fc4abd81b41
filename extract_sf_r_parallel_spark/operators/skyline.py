"""Skyline / Pareto-frontier query — minimize two criteria at once.

The reference's workflow repeatedly reduces candidate sets by "best
under a cap" rules (nearest distance under maxdist, oldest nonzero
year — C_ExtractSupplementary…R's per-point minima); the skyline is
the standard generalization when two objectives trade off (e.g.
nearest AND oldest), and the classic example of an operator a naive
translation gets catastrophically wrong at scale: the textbook
formulation is a quadratic NOT-EXISTS self join.

Semantics (MIN/MIN): p dominates q iff p.x ≤ q.x ∧ p.y ≤ q.y and at
least one inequality is strict. The skyline keeps every non-dominated
row; exact duplicates of a skyline point are all kept (neither
dominates the other).

Distributed shape (100 TB): dominance pruning is monotone — a row
dominated inside ANY subset is dominated globally — so phase 1 prunes
each partition locally with a vectorized sort + cummin staircase
(Arrow-batched `mapInPandas`, no per-row Python, zero shuffle) and
ships only the per-partition survivors. Phase 2 resolves the union of
survivors exactly, pure JVM: per-x group minima, then "minimum over
all strictly-smaller x" via an ordered window over the DISTINCT x
values (rows-frame, so float keys are handled exactly — no reliance
on a unit-range trick). The survivor set after phase 1 is bounded by
the sum of per-partition skyline sizes (typically O(√n·P) on random
data), so the single-partition ordered window in phase 2 runs over a
tiny relation; correctness never depends on that bound, only the
constant factor does.

A row q survives phase 2 iff
  q.y = min{y : x = q.x}          (not dominated within its x-group)
  and min{y : x < q.x} > q.y      (or no smaller x exists),
which is exactly non-dominance for MIN/MIN.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_min2", "skyline_pandas"]


def skyline_pandas(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact MIN/MIN skyline of one pandas frame — vectorized staircase.

    Sort by (x, y); a row survives iff its y equals its x-group min
    and strictly undercuts the running min of all previous x-groups.
    """
    if len(pdf) == 0:
        return pdf
    sdf = pdf.sort_values([x, y], kind="mergesort")
    grp_min = sdf.groupby(x, sort=False)[y].transform("min")
    # running min of y over strictly-smaller x: cummin shifted past
    # the current x-group (take the cummin at each group's start)
    cm = sdf[y].cummin()
    first_of_group = ~sdf[x].duplicated()
    prev_min = cm.shift(1).where(first_of_group).ffill()  # NaN for 1st group
    keep = (sdf[y] == grp_min) & (~(prev_min <= sdf[y]).fillna(False))
    return sdf[keep.to_numpy()]


def skyline_min2(df: DataFrame, x: str, y: str) -> DataFrame:
    """Two-phase distributed skyline minimizing (`x`, `y`).

    Returns the non-dominated rows with all original columns.
    """
    schema = df.schema

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = skyline_pandas(pdf, x, y)
            if len(out):
                yield out

    pruned = df.mapInPandas(_local, schema=schema)

    # phase 2 (exact, pure JVM, tiny input): per-x minima, then the
    # strictly-before running min over distinct x values.
    gm = pruned.groupBy(x).agg(F.min(y).alias("_ym"))
    w = Window.orderBy(x).rowsBetween(Window.unboundedPreceding, -1)
    gm = gm.withColumn("_m1", F.min("_ym").over(w))
    surviving_groups = gm.filter(
        F.col("_m1").isNull() | (F.col("_m1") > F.col("_ym")))
    return (pruned.join(F.broadcast(surviving_groups), on=x)
            .filter(F.col(y) == F.col("_ym"))
            .drop("_ym", "_m1"))
