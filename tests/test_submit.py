"""spark-submit --py-files deployment test (north_rule deploy path).

Runs the real spark-submit binary with the content-hashed package zip
and the scripts/run_extract.py entrypoint, from a working directory
OUTSIDE the repo — so both driver and executors resolve ``ocr_spark``
exclusively through --py-files, exactly as on a cluster.
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    from ocr_spark.deploy import package_zip

    zip_path = package_zip()
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_extract.py"),
            "--input", "unused", "--synth-convs", "60",
            "--output", out_dir, "--buckets", "4",
            "--compact-target-mb", "256",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["buckets_processed"] == 4
    assert summary["n_turns"] > 0
    assert summary["resumed"] is False
    assert os.path.exists(os.path.join(out_dir, "_manifest.json"))
    # post-compaction every bucket dir is a single 256MB-target file
    # (multi-file buckets were rewritten; 1-file buckets were skipped)
    assert summary["buckets_compacted"] >= 0
    import glob
    for bdir in glob.glob(os.path.join(out_dir, "data", "bucket=*")):
        assert len(glob.glob(os.path.join(bdir, "*.parquet"))) == 1
