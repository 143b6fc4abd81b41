"""Interval-overlap join — the 1-D sibling of the hex-cell spatial
join (SURVEY §2.4 J-family): every interval explodes over the coarse
time buckets it touches, candidates come from an equi join on
(key, bucket), the exact overlap predicate refines JVM-side, and each
overlapping pair is emitted EXACTLY once without any dedup shuffle —
a pair is kept only in the first bucket both intervals share
(bucket == max(floor(start_l/w), floor(start_r/w)), the same
owner-corner trick the dissolve correction build uses in 2-D).

Scale shape: shuffle keys are (key, bucket) so co-occurring intervals
co-locate; bucket_width trades replication (long intervals explode
over more buckets) against candidate precision, exactly like the hex
cell edge vs radius; skewed buckets take the usual salting/AQE
mitigations. Zero Python anywhere — sequence/explode + codegen'd
predicates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(left: DataFrame, right: DataFrame,
                  l_start: str, l_end: str, r_start: str, r_end: str,
                  key: str | None = None,
                  bucket_width_seconds: int = 3600,
                  suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """Inner join of rows whose [start, end] intervals overlap
    (inclusive ends: l_start ≤ r_end AND r_start ≤ l_end), optionally
    key-equal first. Timestamps or numerics both work (timestamps are
    bucketed on epoch micros)."""
    w_us = bucket_width_seconds * 1_000_000

    def _b(col):
        c = F.col(col)
        # timestamps → micros (NTZ interpreted in the UTC session zone,
        # same as sessionize_batch); numerics pass through
        if dict(left.dtypes + right.dtypes).get(col) in ("timestamp",
                                                         "timestamp_ntz"):
            c = F.unix_micros(c.cast("timestamp"))
        else:
            c = c * 1_000_000
        return F.floor(c / F.lit(w_us))

    def _explode(df, s, e, side):
        b0, b1 = _b(s), _b(e)
        out = df.withColumn("_b0", b0).withColumn(
            "_bkt", F.explode(F.sequence(b0, b1)))
        ren = {c: f"{c}{suffixes[side]}" for c in df.columns
               if key is None or c != key}
        for old, new in ren.items():
            out = out.withColumnRenamed(old, new)
        return out

    l = _explode(left, l_start, l_end, 0)
    r = _explode(right, r_start, r_end, 1)
    join_keys = ["_bkt"] if key is None else [key, "_bkt"]
    r = r.withColumnRenamed("_b0", "_rb0")
    pairs = l.join(r, join_keys)
    ls, le = F.col(f"{l_start}{suffixes[0]}"), F.col(f"{l_end}{suffixes[0]}")
    rs, re_ = F.col(f"{r_start}{suffixes[1]}"), F.col(f"{r_end}{suffixes[1]}")
    overlap = (ls <= re_) & (rs <= le)
    # exactly-once: only the FIRST bucket both intervals share reports
    first_shared = F.greatest(F.col("_b0"), F.col("_rb0"))
    return (pairs.filter(overlap & (F.col("_bkt") == first_shared))
            .drop("_bkt", "_b0", "_rb0"))
