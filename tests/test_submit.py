"""End-to-end guard for the spark-submit entrypoint: package the
--py-files zip, launch scripts/submit_job.py through the REAL
spark-submit binary (not the test session), and check the metrics
artifact. This is the north-rule launch path: "run via spark-submit
--py-files"."""

import json
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_job(tmp_path):
    zip_path = subprocess.run(
        [os.path.join(ROOT, "scripts", "package.sh")],
        check=True, capture_output=True, text=True).stdout.strip()
    out = tmp_path / "metrics.json"
    subprocess.run(
        ["spark-submit", "--master", "local[8]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.driver.memory=8g",
         "--py-files", os.path.join(ROOT, zip_path),
         os.path.join(ROOT, "scripts", "submit_job.py"),
         "--sf-dir", SF_DIR,
         "--output", str(out),
         "--snapshot-dir", str(tmp_path / "snaps")],
        check=True, capture_output=True, text=True, timeout=600)
    m = json.loads(out.read_text())
    assert set(m["stages"]) == {"build", "snapshot_commit", "knn",
                                "range_count"}
    assert m["rows"] > 0 and m["knn_rows"] > 0
    assert m["manifest"]["blobs"] > 0
    # the snapshot was committed and the queried index reloaded from it
    assert (tmp_path / "snaps" / "CURRENT").exists()
    # k=10 kNN over the query set: exactly 10 rows per query
    assert m["knn_rows"] % 10 == 0


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_ascii_input(tmp_path):
    """Same launch path over a reference-format .in point file."""
    import numpy as np
    rng = np.random.default_rng(29)
    arr = rng.integers(0, 1_000_000, size=(5000, 2), dtype=np.int64)
    infile = tmp_path / "u5000_2.in"
    infile.write_text(
        "5000 2\n" + "\n".join(f"{x} {y} " for x, y in arr) + "\n")
    zip_path = subprocess.run(
        [os.path.join(ROOT, "scripts", "package.sh")],
        check=True, capture_output=True, text=True).stdout.strip()
    out = tmp_path / "metrics.json"
    subprocess.run(
        ["spark-submit", "--master", "local[8]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.driver.memory=8g",
         "--py-files", os.path.join(ROOT, zip_path),
         os.path.join(ROOT, "scripts", "submit_job.py"),
         "--sf-dir", str(infile), "--input-format", "ascii",
         "--grid", "4", "--output", str(out)],
        check=True, capture_output=True, text=True, timeout=600)
    m = json.loads(out.read_text())
    assert m["rows"] == 5000
    assert m["knn_rows"] % 10 == 0 and m["knn_rows"] > 0
