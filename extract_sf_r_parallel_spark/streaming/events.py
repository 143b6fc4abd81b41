"""Structured Streaming over the events table.

The reference is batch-only ("run again when new data arrives",
README.md:3); the engine adds the incremental path the reference
couldn't: file-source streaming with watermarked windowed aggregation
and within-watermark dedup, so new event files are folded in without
recomputation. Used with Trigger.AvailableNow in tests (bounded run),
identical code runs continuously on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

__all__ = ["EVENTS_SCHEMA", "read_events_stream", "windowed_counts",
           "windowed_hll", "windowed_cms", "dedup_stream",
           "funnel_join", "run_available_now"]


def read_events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data
    watermark — the streaming twin of plans/relational.q_tumbling_window
    (same grouping, so batch output is the oracle)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("hour"), "event_type", "n", "sum_value")
    )


def windowed_hll(stream: DataFrame, window: str = "1 hour",
                 watermark: str = "1 hour", col: str = "user_id",
                 p: int = 9, salt: str = "hll") -> DataFrame:
    """Per-window HyperLogLog register table — live approximate
    distinct-users-per-hour, the sketch (operators/sketch.py) composed
    with watermarked streaming. The register fold is max(), a monotone
    semilattice, so it is exactly the incremental-aggregation shape
    Structured Streaming's state store wants: bounded state (≤2^p rows
    per open window), append-only emission when the watermark closes a
    window. Same hash/register/rho arithmetic as the batch operator,
    so the batch register table over the same rows IS the oracle."""
    m = 1 << p
    wbits = 60 - p
    h = F.conv(F.substring(
        F.md5(F.concat(F.col(col).cast("string"), F.lit(":" + salt))),
        1, 15), 16, 10).cast("long")
    w = F.expr(f"_h div {m}")
    rho = F.when(w == 0, F.lit(wbits + 1)) \
        .otherwise(wbits + 1 - F.length(F.bin(w)))
    s = (stream.withWatermark("ts", watermark)
         .select("ts", h.alias("_h"))
         .select("ts", (F.col("_h") % m).alias("register"),
                 rho.alias("rho")))
    return (s.groupBy(F.window("ts", window).alias("win"), "register")
            .agg(F.max("rho").alias("max_rho"))
            .select(F.col("win.start").alias("hour"), "register",
                    "max_rho"))


def windowed_cms(stream: DataFrame, window: str = "1 hour",
                 watermark: str = "1 hour", col: str = "user_id",
                 width: int = 256, depth: int = 4,
                 salt: str = "cms") -> DataFrame:
    """Per-window Count–Min grid — the ADDITIVE sketch live: counts
    sum under the watermarked window aggregation exactly like any
    grouped count, state bounded by depth·width rows per open window.
    Same md5 cell arithmetic as the batch operator
    (operators/sketch.cms_grid), so the batch grid per hour IS the
    oracle. Together with windowed_hll this gives the live
    distinct-AND-frequency pair every event pipeline dashboards on."""
    # one explode (not a depth-way union): sk_row rides into the salt,
    # so a single watermarked branch carries all depth hash rows
    depth_arr = F.array(*[F.lit(i) for i in range(depth)])
    rows = (stream.withWatermark("ts", watermark)
            .select("ts", F.col(col).alias("_k"),
                    F.explode(depth_arr).alias("sk_row")))
    h = F.md5(F.concat(F.col("_k").cast("string"), F.lit(":" + salt),
                       F.col("sk_row").cast("string")))
    cell = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width
    return (rows.withColumn("cell", cell)
            .groupBy(F.window("ts", window).alias("win"),
                     "sk_row", "cell")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("win.start").alias("hour"), "sk_row", "cell",
                    "cnt"))


def windowed_hist(stream: DataFrame, window: str = "1 day",
                  watermark: str = "1 day", col: str = "value",
                  bin_width: float = 2.0, n_bins: int = 256) -> DataFrame:
    """Per-window mergeable equi-width histogram — the live quantile
    sketch (operators/sketch.hist_bins under a watermark): counts sum
    under the windowed aggregation like any grouped count, state
    bounded by n_bins rows per (window, event_type). Clamping (not
    dropping) out-of-range values keeps n exact, so post-drain rank
    arithmetic (hist_quantiles) is exact; only the answer's resolution
    is one bin width. The batch histogram over the same rows IS the
    oracle."""
    b = F.least(
        F.greatest(F.floor(F.col(col) / bin_width).cast("int"), F.lit(0)),
        F.lit(n_bins - 1))
    return (stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"),
                     F.col("event_type"), b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.col("win.start").alias("day"), "event_type",
                    "bin", "c"))


def cms_heavy_hitters(grid: DataFrame, candidates: DataFrame,
                      threshold: int, width: int = 256, depth: int = 4,
                      salt: str = "cms", key_col: str = "user_id") -> DataFrame:
    """Top-k / heavy hitters from a drained Count-Min grid — the
    classic CMS point query (Cormode & Muthukrishnan 2005): probe a
    BOUNDED candidate dictionary against all `depth` hash rows;
    est(key, window) = min over rows of the cell count; emit keys whose
    estimate clears `threshold`. The candidate side is broadcast — at
    scale it is a known key universe or yesterday's top-N, never the
    raw stream — so the only big operand is the grid, which is already
    ≤ depth·width rows per window.

    Exactness of the plan shape: a missing (window, sk_row, cell) grid
    row means count 0, so a key lacking any of its `depth` cells in a
    window cannot clear a positive threshold — the inner join +
    HAVING count(*) = depth drops it without materializing zeros.
    CMS guarantees est ≥ true count: collisions can promote a key into
    the output, never drop one — the emitted set is a superset of the
    true heavy hitters, exactly reproducible from the same md5 cells
    (the SQL oracle replays it)."""
    depth_arr = F.array(*[F.lit(i) for i in range(depth)])
    probe = (candidates.select(F.col(key_col).alias("_k")).distinct()
             .select("_k", F.explode(depth_arr).alias("sk_row")))
    h = F.md5(F.concat(F.col("_k").cast("string"), F.lit(":" + salt),
                       F.col("sk_row").cast("string")))
    probe = probe.withColumn(
        "cell", F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width)
    time_cols = [c for c in grid.columns
                 if c not in ("sk_row", "cell", "cnt")]
    return (grid.join(F.broadcast(probe), ["sk_row", "cell"])
            .groupBy(*time_cols, "_k")
            .agg(F.count(F.lit(1)).alias("_nrows"),
                 F.min("cnt").alias("est"))
            .filter((F.col("_nrows") == depth)
                    & (F.col("est") >= threshold))
            .drop("_nrows")
            .withColumnRenamed("_k", key_col))


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event ids within the watermark horizon."""
    return stream.withWatermark("ts", watermark) \
        .dropDuplicatesWithinWatermark(["event_id"])


def funnel_join(left: DataFrame, right: DataFrame,
                within: str = "30 minutes",
                watermark: str = "1 hour",
                how: str = "inner") -> DataFrame:
    """STREAM-STREAM join (r05): per user, pair each left event with
    every right event in (left.ts, left.ts + `within`] — the
    funnel/attribution primitive (click → purchase). Both sides carry
    watermarks and the join condition bounds right.ts relative to
    left.ts, so Spark can evict left state once the right watermark
    passes left.ts + within — bounded state at unbounded input, the
    thing a batch self-join can't give you. how="inner" → rows emit as
    soon as both sides arrive; no flush sentinel needed.
    how="left_outer" → unmatched left rows additionally emit with NULL
    right columns, but only when the GLOBAL watermark (the MIN across
    both inputs under Spark's default multipleWatermarkPolicy) passes
    left.ts + within — a bounded drain must therefore feed BOTH sides
    a far-future sentinel or the tail of the left stream never
    resolves (see _stage_events(flush_pair=True))."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(f"""l.user_id = r.user_id
                   AND r.ts > l.ts
                   AND r.ts <= l.ts + interval {within}"""),
        how,
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("left_event_id"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def run_available_now(df: DataFrame, sink_table: str, checkpoint: str,
                      output_mode: str = "append",
                      shuffle_partitions: int | None = None):
    """Drain everything currently available into an in-memory sink and
    stop — bounded streaming execution for tests/benches.

    `shuffle_partitions` scopes spark.sql.shuffle.partitions to the
    drain: a stateful streaming query runs (partitions × micro-batches)
    state-store tasks, so a tiny bounded fixture should not inherit a
    batch-sized partition count (the state partitioning is fixed at
    first checkpoint anyway — a real deployment sizes it to the
    cluster up front)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            df.writeStream.format("memory").queryName(sink_table)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return q


def windowed_tile_counts(stream: DataFrame, cell: int = 2000,
                         window: str = "1 hour",
                         watermark: str = "1 hour") -> DataFrame:
    """LIVE spatial hotspot grid — tumbling-window event counts per
    `cell`-metre tile of the LCG geotag (the streaming twin of the
    batch tile rollups: same integer tile arithmetic, so the batch
    GROUP BY date_trunc/tile query is the oracle). The watermark
    bounds state to open windows × occupied tiles; the shuffle key is
    (window, tile), so a hot tile is one skewed reducer — at
    production scale pre-aggregate per input partition (the map-side
    combine Spark already applies to streaming aggs) carries it."""
    pts = stream.select(
        "ts",
        F.expr(f"(((event_id * 48271 + 13) % 999983) % 20000)"
               f" div {cell}").alias("gx"),
        F.expr(f"(((event_id * 69621 + 7) % 999979) % 20000)"
               f" div {cell}").alias("gy"),
        "value")
    return (pts.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "gx", "gy")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("win.start").alias("hour"), "gx", "gy",
                    "n", "sum_value"))


def sliding_counts(stream: DataFrame, length: str = "2 hours",
                   slide: str = "1 hour",
                   watermark: str = "1 hour") -> DataFrame:
    """SLIDING-window counts per event_type — each event lands in
    length/slide overlapping windows (2 here), the semantics tumbling
    windows cannot express (a rolling 2-hour health metric refreshed
    hourly). State is bounded by open windows × types; the oracle
    replays the overlap by unnesting each event into its two window
    starts (floor_hour(ts) and floor_hour(ts) − 1h)."""
    return (stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", length, slide).alias("win"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    "event_type", "n", "sum_value"))
