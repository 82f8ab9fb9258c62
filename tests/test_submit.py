"""Cluster packaging contract: the engine ships as a --py-files zip and
runs through ``spark-submit`` from OUTSIDE the repo (the north rule's
``spark-submit --py-files`` deployment shape), resuming from the ledger
like any replay. One fresh JVM (~40 s) — kept to a single test."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "mex_extractors_spark.zip")
    pkg = os.path.join(REPO, "mex_extractors_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py") or f.endswith(".yaml"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay(spark, tmp_path):
    """zip the package, copy the job script to a dir outside the repo,
    spark-submit it with --py-files, and check the produced lake table
    converges to the LWW oracle computed in-process."""
    from mex_extractors_spark import synth
    from mex_extractors_spark.lake.table import LakeTable

    ev = synth.events(spark, 4000, n_repos=20, paths_per_repo=40)
    seg_dir = str(tmp_path / "segments")
    (
        ev.withColumn("_segment", ((F.col("seq") - 1) / F.lit(2000)).cast("int"))
        .repartition(4)
        .write.partitionBy("_segment")
        .parquet(seg_dir)
    )
    expected = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("repo", "path").orderBy(F.desc("seq"))
            ),
        )
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .count()
    )

    zpath = _zip_package(tmp_path)
    job_dir = tmp_path / "jobsite"  # NOT the repo: only the zip provides the pkg
    job_dir.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "replay_job.py"), job_dir)
    table_dir = str(tmp_path / "lake")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zpath,
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            str(job_dir / "replay_job.py"),
            "--events-dir", seg_dir,
            "--table-dir", table_dir,
            "--num-buckets", "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(job_dir),
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    table = LakeTable(table_dir, num_buckets=4)
    got = table.read(spark).count()
    assert got == expected
    # resumability: a second submit is a pure ledger-skip no-op
    cur = table.current_snapshot()["version"]
    out2 = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zpath,
            "--conf", "spark.ui.enabled=false",
            str(job_dir / "replay_job.py"),
            "--events-dir", seg_dir,
            "--table-dir", table_dir,
            "--num-buckets", "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(job_dir),
        env=env,
        timeout=600,
    )
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-2000:]
    assert LakeTable(table_dir, num_buckets=4).current_snapshot()["version"] == cur
