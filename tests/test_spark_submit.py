"""Deployment-path test (north_rule): the pipeline runs via
``spark-submit --py-files fasta_windows_spark.zip`` with the package
distributed to executors from the zip, not the repo checkout."""

import os
import subprocess
import sys

DRIVER_SCRIPT = """
import sys
from fasta_windows_spark.session import get_spark
from fasta_windows_spark.functions.udfs import window_stats

spark = get_spark(master="local[2]", shuffle_partitions=2)
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
n = window_stats(docs, window=100, id_cols=["doc_id"]).count()
assert n > 0, n
print(f"SUBMIT_OK {n}")
spark.stop()
"""


def test_spark_submit_with_pyfiles(tmp_path):
    from fasta_windows_spark.packaging import make_pyfiles_zip

    zip_path = make_pyfiles_zip(str(tmp_path / "fasta_windows_spark.zip"))
    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT)

    spark_home = os.path.join(os.path.dirname(sys.executable), "..")
    submit = None
    for cand in (
        os.path.join(os.path.dirname(sys.executable), "spark-submit"),
        "spark-submit",
    ):
        from shutil import which

        if which(cand):
            submit = cand
            break
    assert submit, "spark-submit not on PATH"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", zip_path, str(script)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # not the repo: import must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBMIT_OK" in proc.stdout, proc.stdout[-2000:]
