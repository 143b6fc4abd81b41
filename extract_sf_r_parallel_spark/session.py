"""SparkSession factory with the engine's scale-aware defaults.

Local-mode knobs mirror what a 1000-executor cluster submit would set
via spark-submit --conf (documented per key). AQE is on — it is the
runtime half of the skew strategy (SURVEY.md §4, north rule)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "extract_sf_r_parallel_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: match cores; on a real cluster this would be
        # 2-3 × total executor cores (set via --conf at submit)
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus * 2 if n == "*" else max(int(n) * 2, 8)
    b = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch size so pandas-UDF geometry batches fit in
        # worker memory even with fat candidate sets (SURVEY.md §4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # files: 128 MiB splits — the cluster default that keeps scan
        # tasks balanced at 100 TB (partition pruning happens above)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
