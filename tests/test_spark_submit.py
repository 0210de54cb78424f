"""Launch-path evidence: the pipeline runs via ``spark-submit --py-files``
(north rule launch contract), with the package imported from the zip — not
from the repo checkout.

The driver script (main.py) is copied into an empty temp dir and submitted
from there, so ``import liblevenshtein_rust_spark`` can only resolve via the
``--py-files`` zip that spark-submit ships to the driver and executors.
main.py exits non-zero unless pairwise F1 >= 0.99, so a passing run is also
an end-to-end correctness check through the real launch path.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    pkg_zip = tmp_path / "liblevenshtein_rust_spark.zip"
    root = REPO / "liblevenshtein_rust_spark"
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(root.rglob("*.py")):
            z.write(p, p.relative_to(REPO).as_posix())

    launch_dir = tmp_path / "launch"
    launch_dir.mkdir()
    shutil.copy(REPO / "main.py", launch_dir / "main.py")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--py-files", str(pkg_zip),
            str(launch_dir / "main.py"),
            "--tier", "smoke",
            "--cores", "4",
            "--run-dir", str(tmp_path / "run"),
        ],
        cwd=launch_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=840,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["f1"] >= 0.99
    assert out["entities"] > 0
    # per-stage lineage manifests made it through the launch path
    assert out["stage_wall_s"]
