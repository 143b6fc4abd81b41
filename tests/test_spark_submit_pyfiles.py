"""North-rule packaging: the engine must run via
`spark-submit --py-files dist/extract_sf_r_parallel_spark.zip` with NO
repo checkout on the path — the driver and executors import the
package from the zip alone. The test stages the job script in an
empty temp dir (so its own sys.path insert points at nothing), builds
the zip, submits a real extraction over parquet inputs, and checks
the lineage result + partitioned output."""

import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_zip(tmp_path):
    sys.path.insert(0, REPO)
    from extract_sf_r_parallel_spark.data import synth
    from scripts.make_pyfiles import main as build_zip

    zip_path = build_zip()
    assert os.path.getsize(zip_path) > 10_000

    # inputs: the input_hint image table + a polygon layer table
    imgs = synth.images_pdf(40)
    pq.write_table(pa.Table.from_pandas(imgs), tmp_path / "images.parquet")
    layers = synth.footprint_layers_pdf(60)
    pq.write_table(pa.Table.from_pandas(layers), tmp_path / "layers.parquet")

    # stage the entrypoint in an empty dir: its sys.path.insert then
    # points at tmp_path (no package there) — imports MUST resolve
    # from the --py-files zip
    staged = tmp_path / "scripts"
    staged.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "job_extract.py"),
                staged / "job_extract.py")

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_DRIVER_MEM="4g")
    out_dir = tmp_path / "out"
    p = subprocess.run(
        [SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         str(staged / "job_extract.py"),
         "--points", str(tmp_path / "images.parquet"),
         "--layers", str(tmp_path / "layers.parquet"),
         "--out", str(out_dir), "--buckets", "2"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert p.returncode == 0, p.stderr[-4000:]
    res = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert sorted(res["ran"]) == [0, 1] and res["skipped"] == []
    buckets = [d for d in os.listdir(out_dir) if d.startswith("bucket=")]
    assert sorted(buckets) == ["bucket=0", "bucket=1"]
