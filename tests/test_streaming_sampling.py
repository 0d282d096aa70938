"""Streaming priority sampling (streaming/sampling.py): the emitted
candidate stream reduces to EXACTLY the batch DLT sample, emission is
exactly-once by monotonicity, and a checkpoint resume lands on the same
sample."""

import pyspark.sql.functions as F
import pytest

from fasta_windows_spark.operators.sampling import priority_sample
from fasta_windows_spark.sources import pages as P
from fasta_windows_spark.streaming import pipeline as S
from fasta_windows_spark.streaming.sampling import (
    priority_sample_finalize,
    priority_sample_stream,
)

K = 12


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prio_pages"))
    pdf = P.gen_pages(n_pages=400, n_hosts=6, seed=13)
    P.write_pages_parquet(pdf, d, n_files=4)
    return d


@pytest.fixture(scope="module")
def pages_pdf():
    return P.gen_pages(n_pages=400, n_hosts=6, seed=13)


def _with_w(df):
    return df.select("url", F.length("text").cast("long").alias("w"))


def _batch_sample(spark, pages_pdf):
    b = _with_w(P.spark_pages(spark, pages_pdf))
    rows = priority_sample(b, K, weight_col="w", key_col="url").collect()
    return {(r.url, r.w, r.q_fp, r.tau_fp, r.est_fp) for r in rows}


def _run_stream(spark, pages_dir, out, ckpt, max_files=None):
    stream = _with_w(
        S.read_pages_stream(spark, pages_dir, max_files_per_trigger=max_files)
    )
    cand = priority_sample_stream(stream, K, n_shards=4, key_col="url")
    return (
        cand.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_stream_sample_equals_batch(spark, pages_dir, pages_pdf, tmp_path):
    out, ck = str(tmp_path / "cand"), str(tmp_path / "ck")
    q = _run_stream(spark, pages_dir, out, ck)
    q.processAllAvailable()
    q.stop()
    emitted = spark.read.parquet(out)
    # exactly-once emission: a key enters its shard's top set at most once
    assert emitted.count() == emitted.select("pk").distinct().count()
    fin = priority_sample_finalize(emitted, K, key_col="url")
    got = {(r.url, r.w, r.q_fp, r.tau_fp, r.est_fp) for r in fin.collect()}
    assert got == _batch_sample(spark, pages_pdf)


def test_stream_sample_checkpoint_resume(spark, pages_dir, pages_pdf, tmp_path):
    out, ck = str(tmp_path / "cand2"), str(tmp_path / "ck2")
    q1 = _run_stream(spark, pages_dir, out, ck, max_files=1)
    while not q1.recentProgress:
        q1.processAllAvailable()
    q1.stop()
    q2 = _run_stream(spark, pages_dir, out, ck, max_files=1)
    q2.processAllAvailable()
    q2.stop()
    emitted = spark.read.parquet(out)
    assert emitted.count() == emitted.select("pk").distinct().count()
    fin = priority_sample_finalize(emitted, K, key_col="url")
    got = {(r.url, r.w, r.q_fp, r.tau_fp, r.est_fp) for r in fin.collect()}
    assert got == _batch_sample(spark, pages_pdf)


def test_stream_sample_rejects_bad_k(spark, pages_pdf):
    with pytest.raises(ValueError):
        priority_sample_stream(
            _with_w(P.spark_pages(spark, pages_pdf)), 0, key_col="url"
        )
