"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: extract_sf_r_parallel_spark (see SURVEY.md / README.md).
Spatial queries run the real hex-cell-indexed join machinery; their
oracles brute-force the same deterministic integer geometry in SQL, so
a hash match validates the cell cover/join/refinement, not just a
shared formula. Since round 2 the circle-kernel flagship (closed-form
circular-segment SQL), exact dissolve (inclusion–exclusion SQL), kNN
ring expansion, polylines, the shapefile round-trip, tmerc
reprojection, and the whole text/hash family (FNV/SimHash/MinHash
replayed in DuckDB integer arithmetic) are driver-oracled too. Since
round 3 EVERY query is oracled (zero rows-only entries): both ANN
paths run SQL-replayable variants (integer-quantized LSH buckets;
corpus-sampled IVF centroids), and multimodal_stats pixels are a
closed-form Lehmer hash DuckDB re-derives value-for-value through the
PNG codec round-trip. Round 4 adds the wide_merge capstone (the
reference's 19-layer output table in one call), the per-class wetland
UNION dissolve, the LIVE streaming sessionizer (Trigger.AvailableNow),
CPNV video frame sampling, the resize/simhash-pairs/as-of-join/
IceLite-evolution rows, and both dissolve engine plans — 55 queries,
all oracled (asof_join against DuckDB's NATIVE ASOF JOIN).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from extract_sf_r_parallel_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full areadist.age
    circle-kernel extraction (capped nearest distance + dissolved
    footprint area/proportion/weighted age at 150 m & 565 m) via the
    cell-indexed spatial join."""
    return registry.q_areadist_circle(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLE)
