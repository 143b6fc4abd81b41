"""extract_sf_r_parallel_spark — a from-scratch PySpark-native spatial-join
and tiling engine with the query/data-processing capabilities of the
reference repo LionelLeston/Extract-sf-R-parallel (see SURVEY.md).

Architecture (Spark-first, not a port):

- geometry is plain columns (x:double, y:double for points; ring arrays
  for polygons) — no JVM geometry type, no GEOS; all geometric math is
  pure NumPy inside Arrow-batched pandas UDFs (zero per-row Python);
- every geometric operation is re-expressed as an equi join on a
  computed hex cell-id key plus a vectorized refinement kernel, which
  Catalyst plans like any relational join (broadcast / sort-merge, AQE);
- the reference's 10,000-iteration tile loop becomes one shuffle.

Subpackages:
  geo        NumPy geometry kernels + hex cell index
  data       deterministic fixture generators (image codec, geotagging)
  sources    table layer (parquet / iceberg-lite manifest), lineage
  functions  text / hashing / vector column functions
  operators  range_join, areadist, knn, dedup, similarity, multimodal
  plans      relational query builders (TPC-H-ish, DuckDB-oracled)
  streaming  Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
