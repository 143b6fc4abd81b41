"""Checkpoint/resume with per-partition lineage + metrics (north rule).

The reference got restartability from 10,000 per-cell CSVs (C_…R:247)
plus a try() on re-read (C_…R:716) — rerunning redoes nothing but
loses nothing (and silently duplicates a stale shard on read failure,
a bug we do NOT reproduce; SURVEY.md §2.7). The engine formalizes it:

- work is split into `n_buckets` hash buckets of the point key
  (coarser than cells — each bucket is one healthy Spark job, not
  10,000 driver iterations);
- a JSONL manifest records one commit line per finished bucket with
  row counts and timings (the metrics accumulators);
- resume = set-difference: planned buckets minus committed buckets.
  Output partitions are immutable once committed, so a crashed run
  leaves at most one orphan directory, which is overwritten when its
  bucket is retried (idempotent).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["LineageManifest", "extract_with_resume"]


class LineageManifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def completed(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    rec = json.loads(line)
                    out[rec["bucket"]] = rec
        return out

    def commit(self, bucket: int, **metrics) -> None:
        rec = {"bucket": bucket, **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())


def extract_with_resume(
    spark: SparkSession,
    points: DataFrame,
    polys: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    key: str = "PKEY",
    max_buckets_this_run: int | None = None,
    **areadist_kwargs,
) -> dict:
    """Run operators.areadist bucket-by-bucket with commit lineage.

    Returns {"ran": [...], "skipped": [...]}. Re-invoking after a crash
    (or after `max_buckets_this_run` stopped the run early) finishes
    only the missing buckets. Output: <out_dir>/bucket=<i>/ parquet.
    """
    from ..operators.areadist import areadist

    manifest = LineageManifest(os.path.join(out_dir, "_lineage", "manifest.jsonl"))
    done = manifest.completed()
    ran, skipped = [], []
    bucketed = points.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))
    bucketed.cache()
    try:
        for b in range(n_buckets):
            if b in done:
                skipped.append(b)
                continue
            if max_buckets_this_run is not None and len(ran) >= max_buckets_this_run:
                break
            t0 = time.time()
            part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
            n_in = part.count()
            result = areadist(part, polys, **areadist_kwargs)
            path = os.path.join(out_dir, f"bucket={b}")
            result.write.mode("overwrite").parquet(path)
            n_out = spark.read.parquet(path).count()
            manifest.commit(
                b, rows_in=n_in, rows_out=n_out,
                wall_s=round(time.time() - t0, 3), path=path)
            ran.append(b)
    finally:
        bucketed.unpersist()
    return {"ran": ran, "skipped": skipped}
