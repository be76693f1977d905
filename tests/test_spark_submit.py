"""north_rule packaging check: the package ships as a zip through a REAL
`spark-submit --py-files` subprocess (fresh JVM, package importable only
from the zip), runs the extraction pipeline, writes parquet output."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None,
    reason="spark-submit not on PATH",
)


def _zip_package(dest: str) -> str:
    pkg = os.path.join(REPO, "document_parser_private_spark")
    zpath = os.path.join(dest, "dpps.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_end_to_end(spark, corpus_df, tmp_path):
    inp = str(tmp_path / "docs.parquet")
    corpus_df.limit(60).write.parquet(inp)
    out_dir = str(tmp_path / "out")
    zpath = _zip_package(str(tmp_path))

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # package must come from the zip
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zpath,
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "tools", "submit_job.py"),
            inp, out_dir,
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "rows=60" in r.stdout, r.stdout[-1000:]

    rows = spark.read.parquet(f"{out_dir}/resumes_json").collect()
    assert len(rows) == 60
    assert all(r2["resume_json"].startswith("{") for r2 in rows)
