"""The north-rule launch path: ``spark-submit --py-files engine.zip``.

Packages doc_ocr_spark into a zip, runs the job through a real
spark-submit (fresh JVM, package imported ONLY from the zip), and
checks output + lineage.  This is the exact mechanics of a cluster
submit; only the master URL differs on real hardware.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession

# the package must resolve from the --py-files zip, never the repo
sys.path = [p for p in sys.path if not p.rstrip('/').endswith('repo')]

spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
import doc_ocr_spark
assert "doc_ocr_spark.zip" in doc_ocr_spark.__file__, doc_ocr_spark.__file__
from doc_ocr_spark.job import run_extraction
m = run_extraction(spark, sys.argv[1], sys.argv[2], n_buckets=4)
print("SUBMIT_RESULT docs=%d buckets=%d" % (m["docs"], m["buckets_run"]))
spark.stop()
"""


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    zpath = str(tmp_path / "doc_ocr_spark.zip")
    pkg = os.path.join(REPO, "doc_ocr_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    src = str(tmp_path / "pages.parquet")
    from doc_ocr_spark.datagen import write_corpus_parquet

    write_corpus_parquet(src, 40)
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    # keep the repo OFF the python path: the zip must be self-sufficient
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", zpath, driver, src, out],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBMIT_RESULT docs=40 buckets=4" in proc.stdout, proc.stdout[-2000:]
    # lineage committed
    import duckdb

    n = duckdb.sql(
        f"SELECT sum(doc_count) FROM read_parquet('{out}/_lineage/*.parquet')"
    ).fetchone()[0]
    assert n == 40
