"""North-rule hard signal: the whole DAG runs under ``spark-submit
--py-files`` (BASELINE.json north_rule), with the package resolved from the
shipped zip — NOT from the repo checkout.

The test zips ``i2o_transform_spark/``, copies the runner entry file to a
temp dir, and launches ``spark-submit --py-files pkg.zip runner.py`` with a
cwd OUTSIDE the repo so any import that silently falls back to the checkout
fails.  Asserts the run completes, writes triples + lineage, and reports.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_pkg_zip(path) -> None:
    """Zip i2o_transform_spark/ exactly as the README's spark-submit recipe
    does (both tests must ship the identical artifact)."""
    src = os.path.join(REPO, "i2o_transform_spark")
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if f.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))


def test_runner_under_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        # fall back to the pyspark-bundled launcher
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
        assert os.path.exists(spark_submit), "no spark-submit available"

    pkg_zip = tmp_path / "i2o_transform_spark.zip"
    _build_pkg_zip(pkg_zip)

    # the driver script ships alongside the zip, outside the repo
    runner_py = tmp_path / "runner.py"
    shutil.copyfile(
        os.path.join(REPO, "i2o_transform_spark", "plans", "runner.py"),
        runner_py,
    )
    out_dir = tmp_path / "kg_out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing may leak the checkout onto the path
    env["SPARK_GRAFT_SANDBOX"] = "0"  # plain conf: no 16g heap, no /dev/shm
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(pkg_zip),
            "--conf", "spark.sql.shuffle.partitions=8",
            str(runner_py),
            "--n-pages", "1500",
            "--out", str(out_dir),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        check=False,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    # outputs materialized: triples + lineage parquet written by the runner
    names = set(os.listdir(out_dir))
    assert any("triple" in n for n in names), names
    assert any("lineage" in n for n in names), names


def test_python_entry_importable_from_zip_only(tmp_path):
    """The package itself (not just the runner) must import from the zip:
    simulate an executor python worker resolving the library via a zip on
    sys.path with the checkout absent."""
    pkg_zip = tmp_path / "pkg.zip"
    _build_pkg_zip(pkg_zip)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import i2o_transform_spark.queries as q\n"
        "import i2o_transform_spark.functions.bpe  # noqa\n"
        "import i2o_transform_spark.operators.graph  # noqa\n"
        "assert len(q.QUERIES) > 100\n"
        "print('ZIPOK', len(q.QUERIES))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", code, str(pkg_zip)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ZIPOK" in proc.stdout
