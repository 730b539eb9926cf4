"""North-rule packaging gate: the full build runs via
``spark-submit --py-files`` with the zipped package (no repo checkout
on the executors' path)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(transcripts_sf0001_path, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "build_job.py"),
            "--input", transcripts_sf0001_path,
            "--catalog", str(tmp_path / "index"),
        ],
        capture_output=True, text=True, timeout=300, check=True, env=env,
    ).stdout.strip().splitlines()[-1]
    r = json.loads(out)
    assert r["n_docs"] == 2000 and r["snap_id"] == 1
