#!/usr/bin/env bash
# Cluster submit shape (north rule). On this sandbox the same job runs
# in local mode via bench.py / run_scaling.py; on a real cluster:
#
#   python scripts/make_pyfiles.py
#   spark-submit \
#     --master yarn --deploy-mode cluster \
#     --num-executors 1000 --executor-cores 4 --executor-memory 16g \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.adaptive.skewJoin.enabled=true \
#     --conf spark.sql.shuffle.partitions=8000 \
#     --conf spark.sql.execution.arrow.maxRecordsPerBatch=20000 \
#     --py-files dist/extract_sf_r_parallel_spark.zip \
#     scripts/job_extract.py --points <iceberg-table> --layers <parquet> \
#       --out <table> --resume
set -euo pipefail
python "$(dirname "$0")/make_pyfiles.py"
echo "artifact ready: dist/extract_sf_r_parallel_spark.zip (see header for submit shape)"
