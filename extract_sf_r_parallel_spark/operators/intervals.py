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
                  suffixes: tuple[str, str] = ("_l", "_r"),
                  max_buckets_per_row: int = 4096,
                  salt: int = 1) -> DataFrame:
    """Inner join of rows whose [start, end] intervals overlap
    (inclusive ends: l_start ≤ r_end AND r_start ≤ l_end), optionally
    key-equal first. Timestamps or numerics both work (timestamps are
    bucketed on epoch micros).

    `max_buckets_per_row` bounds the explode replication (VERDICT r04
    #5): one year-long interval at the default hour bucket would
    silently fan out to ~8 800 rows; any row exceeding the cap fails
    the job with the offending span so the caller coarsens
    bucket_width_seconds (or pre-splits pathological intervals) instead
    of discovering the blow-up as an OOM three stages later.

    `salt` > 1 (VERDICT r05 next-#7) spreads a hot (key, bucket) — a
    celebrity key whose intervals pile into one time bucket would
    otherwise serialize one shuffle partition. Left rows take a
    deterministic hash salt, right rows replicate salt×, and the salt
    joins the equi keys; every overlapping pair still meets in exactly
    one (bucket, salt) cell, so the owner-bucket exactly-once rule is
    untouched and the result is byte-identical to salt=1 (asserted in
    tests/test_interval_join.py). Cost: salt× replication of the
    right explode — same trade as the spatial cell join's salting.

    `salt="auto"` hands the decision to the engine, mirroring the
    spatial join's probe (range_join.py): both exploded sides are
    sampled at 5 %, the hottest (key, bucket) candidate-pair count is
    estimated from the joined histograms, and salting engages at
    ceil(est / pairs-per-task) only when the estimate exceeds one
    task's budget — small/uniform inputs pay two tiny sampled
    aggregations at build time and keep the salt-free plan. The probe
    only CHOOSES the integer; the executed join plan is byte-identical
    to the manual-salt plan."""
    if isinstance(salt, str):
        if salt != "auto":
            raise ValueError(
                f"salt must be a positive int or the exact string "
                f"'auto', got {salt!r}")
    elif not isinstance(salt, int) or isinstance(salt, bool) or salt < 1:
        raise ValueError(f"salt must be a positive int, got {salt!r}")
    w_us = bucket_width_seconds * 1_000_000

    def _b(df, col):
        c = F.col(col)
        # timestamps → micros (NTZ interpreted in the UTC session zone,
        # same as sessionize_batch); numerics pass through. Dtype is
        # resolved against the OWNING side only (ADVICE r04: a shared
        # name with different types across sides picked the wrong
        # branch).
        if dict(df.dtypes).get(col) in ("timestamp", "timestamp_ntz"):
            c = F.unix_micros(c.cast("timestamp"))
        else:
            c = c * 1_000_000
        return F.floor(c / F.lit(w_us))

    def _explode(df, s, e, side):
        b0, b1 = _b(df, s), _b(df, e)
        n = b1 - b0 + 1
        guard = F.when(
            n > max_buckets_per_row,
            F.raise_error(F.format_string(
                f"interval_join: [{s}, {e}] spans %s buckets of "
                f"{bucket_width_seconds}s (cap {max_buckets_per_row}) — "
                "coarsen bucket_width_seconds or split the interval",
                n.cast("string"))).cast("long")
        ).otherwise(b1)
        out = df.withColumn("_b0", b0).withColumn(
            "_bkt", F.explode(F.sequence(b0, guard)))
        ren = {c: f"{c}{suffixes[side]}" for c in df.columns
               if key is None or c != key}
        for old, new in ren.items():
            out = out.withColumnRenamed(old, new)
        return out

    l = _explode(left, l_start, l_end, 0)
    r = _explode(right, r_start, r_end, 1)
    join_keys = ["_bkt"] if key is None else [key, "_bkt"]
    r = r.withColumnRenamed("_b0", "_rb0")
    if salt == "auto":
        from .range_join import AUTO_SALT_MAX, AUTO_SALT_PAIRS_PER_TASK
        frac = 0.05
        salt = 1
        lh = l.sample(frac, seed=7).groupBy(join_keys).agg(
            F.count(F.lit(1)).alias("_nl"))
        rh = r.sample(frac, seed=7).groupBy(join_keys).agg(
            F.count(F.lit(1)).alias("_nr"))
        row = lh.join(rh, join_keys).agg(
            F.max(F.col("_nl") * F.col("_nr")).alias("m")).first()
        est = (row["m"] or 0) / (frac * frac)
        if est > AUTO_SALT_PAIRS_PER_TASK:
            salt = min(AUTO_SALT_MAX,
                       -(-int(est) // AUTO_SALT_PAIRS_PER_TASK))
    if salt > 1:
        l = l.withColumn("_salt", F.pmod(
            F.xxhash64(F.col(f"{l_start}{suffixes[0]}"),
                       F.col(f"{l_end}{suffixes[0]}")),
            F.lit(salt)).cast("int"))
        r = r.withColumn("_salt", F.explode(
            F.array(*[F.lit(i) for i in range(salt)])))
        join_keys = join_keys + ["_salt"]
    pairs = l.join(r, join_keys)
    ls, le = F.col(f"{l_start}{suffixes[0]}"), F.col(f"{l_end}{suffixes[0]}")
    rs, re_ = F.col(f"{r_start}{suffixes[1]}"), F.col(f"{r_end}{suffixes[1]}")
    overlap = (ls <= re_) & (rs <= le)
    # exactly-once: only the FIRST bucket both intervals share reports
    first_shared = F.greatest(F.col("_b0"), F.col("_rb0"))
    out = (pairs.filter(overlap & (F.col("_bkt") == first_shared))
           .drop("_bkt", "_b0", "_rb0"))
    return out.drop("_salt") if salt > 1 else out
