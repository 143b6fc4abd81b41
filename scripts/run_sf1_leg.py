"""r08 sf1 scale leg (VERDICT r07 next-#5): synthesize a 10× sf0.1
spatial fixture (orders 1.5 M keys, part 200 k keys — the TPC-H sf1
row counts; the spatial queries derive every coordinate from the key
columns alone) and run the headline spatial legs once, recording
wall + rows/sec next to the sf0.1 numbers.

Density honesty: the geotag window is fixed (20 km²), so sf1 is 10×
the point density AND 10× the feature density — candidate pairs grow
~100×. That is exactly the stress the 100 TB claims make: the plans
must hold when the per-cell candidate lists fatten, not just when
more tiles appear.

Usage: python scripts/run_sf1_leg.py [out.json]
Writes the fixture to a scratch dir (deleted after) and prints one
JSON line with the results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_sf1(d: str) -> None:
    # keys only — points_df/rects_df read just o_orderkey/p_partkey.
    # TPC-H orderkeys are sparse (8 per 32-block); replicate that so
    # the key→coordinate LCG sees a realistic key distribution.
    n_orders = 1_500_000
    base = np.arange(n_orders, dtype=np.int64)
    okey = (base // 8) * 32 + (base % 8) + 1
    pq.write_table(pa.table({"o_orderkey": okey}),
                   os.path.join(d, "orders.parquet"))
    pkey = np.arange(1, 200_001, dtype=np.int64)
    pq.write_table(pa.table({"p_partkey": pkey}),
                   os.path.join(d, "part.parquet"))
    ckey = np.arange(1, 150_001, dtype=np.int64)
    pq.write_table(pa.table({"c_custkey": ckey}),
                   os.path.join(d, "customer.parquet"))


def main() -> None:
    from pyspark.sql import functions as F

    from extract_sf_r_parallel_spark.plans import registry, spatial_queries
    from extract_sf_r_parallel_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="sf1_leg", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="sf1_leg_")
    out: dict = {"sf": 1, "cpus": cpus}
    try:
        synth_sf1(d)
        spark.range(10000).selectExpr("id * 2 as x").write.format("noop") \
            .mode("overwrite").save()

        # throughput leg: candidate-pair join + dist filter, best of 3
        pairs = spatial_queries.rect_pairs(spark, d).filter("dist < 1000")
        runs = []
        n_pairs = 0
        for _ in range(3):
            t0 = time.time()
            n_pairs = pairs.count()
            runs.append(round(time.time() - t0, 3))
        out["spatial_pairs"] = n_pairs
        out["spatial_join_runs"] = runs
        out["spatial_join_wall_s"] = min(runs)
        out["rows_per_sec"] = round(n_pairs / min(runs), 1)

        for name in ("range_near", "areadist_square", "tile_counts",
                     "convex_hull", "knn3"):
            try:
                df = registry.QUERIES[name](spark, d)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                out[name + "_s"] = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001
                out[name + "_err"] = f"{type(e).__name__}: {e}"[:200]
            print(name, out.get(name + "_s", out.get(name + "_err")),
                  flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
