"""Streaming Misra-Gries heavy hitters (streaming/topk.py): the candidate
log rescored equals the EXACT batch threshold answer, the MG superset
guarantee is certified on actual shard totals, eviction genuinely happens
(bounded state is doing work), and a checkpoint resume lands on the same
answer."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from fasta_windows_spark.operators.sketch import (
    bigram_items,
    char_ngram_items,
    heavy_hitters_exact,
)
from fasta_windows_spark.sources import pages as P
from fasta_windows_spark.streaming import pipeline as S
from fasta_windows_spark.streaming.topk import (
    _mg_merge,
    _shard_col,
    heavy_hitters_finalize,
    mg_candidates_stream,
)

CAP = 64
SHARDS = 4


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mg_pages"))
    pdf = P.gen_pages(n_pages=300, n_hosts=6, seed=29)
    P.write_pages_parquet(pdf, d, n_files=4)
    return d


@pytest.fixture(scope="module")
def pages_pdf():
    return P.gen_pages(n_pages=300, n_hosts=6, seed=29)


def _threshold(spark, pages_pdf):
    """Smallest threshold the MG bound certifies: T must exceed
    max_shard N_shard / (CAP + 1)."""
    items = char_ngram_items(P.spark_pages(spark, pages_pdf))
    per_shard = (
        items.withColumn("_shard", _shard_col(SHARDS))
        .groupBy("_shard")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return per_shard // (CAP + 1) + 1


def _exact_threshold(items, thr):
    return (
        items.groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= thr)
        .orderBy(F.desc("cnt"), F.asc("item"))
    )


def _run_stream(spark, pages_dir, out, ckpt, max_files=None):
    stream = char_ngram_items(
        S.read_pages_stream(spark, pages_dir, max_files_per_trigger=max_files)
    )
    cand = mg_candidates_stream(stream, CAP, n_shards=SHARDS)
    return (
        cand.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_mg_merge_bound_and_determinism():
    """Pure-kernel MG properties: after any merge sequence the undercount
    is <= N/(capacity+1); size <= capacity; tie order is deterministic."""
    seqs = [
        ["a"] * 40 + ["b"] * 30 + [f"x{i}" for i in range(50)],
        ["a"] * 10 + [f"y{i}" for i in range(40)] + ["b"] * 5,
        [f"z{i % 7}" for i in range(70)],
    ]
    cap = 8
    cur: dict = {}
    true: dict = {}
    n = 0
    for s in seqs:
        batch = pd.Series(s).value_counts()
        for t in s:
            true[t] = true.get(t, 0) + 1
        n += len(s)
        cur = _mg_merge(dict(cur), batch, cap)
        assert len(cur) <= cap
        for item, est in cur.items():
            assert est <= true[item]
            assert true[item] - est <= n // (cap + 1)
    # determinism: same input, same summary
    cur2: dict = {}
    for s in seqs:
        cur2 = _mg_merge(dict(cur2), pd.Series(s).value_counts(), cap)
    assert cur == cur2


def test_mg_stream_rescore_equals_batch(spark, pages_dir, pages_pdf, tmp_path):
    out, ck = str(tmp_path / "cand"), str(tmp_path / "ck")
    q = _run_stream(spark, pages_dir, out, ck)
    q.processAllAvailable()
    q.stop()
    emitted = spark.read.parquet(out)
    thr = _threshold(spark, pages_pdf)

    batch_items = char_ngram_items(P.spark_pages(spark, pages_pdf))
    want = [
        (r.item, r.cnt) for r in _exact_threshold(batch_items, thr).collect()
    ]
    assert len(want) > 0  # non-vacuous at the certified threshold

    # superset certificate: every true heavy hitter is in the candidate log
    cand = {r.item for r in emitted.select("item").distinct().collect()}
    assert {i for i, _ in want} <= cand

    got = [
        (r.item, r.cnt)
        for r in heavy_hitters_finalize(emitted, batch_items, thr).collect()
    ]
    assert got == want


def test_mg_eviction_bounds_the_candidate_log(spark, pages_dir, tmp_path):
    """Bounded state does real work: the candidate log stays far below the
    vocabulary (items that never rank are never emitted)."""
    out, ck = str(tmp_path / "cand3"), str(tmp_path / "ck3")
    q = _run_stream(spark, pages_dir, out, ck)
    q.processAllAvailable()
    q.stop()
    n_cand = spark.read.parquet(out).select("item").distinct().count()
    vocab = (
        char_ngram_items(
            P.spark_pages(spark, P.gen_pages(n_pages=300, n_hosts=6, seed=29))
        )
        .distinct()
        .count()
    )
    assert n_cand < vocab
    assert n_cand <= 4 * CAP * SHARDS  # entries are bounded, not vocabulary


def test_mg_checkpoint_resume(spark, pages_dir, pages_pdf, tmp_path):
    out, ck = str(tmp_path / "cand2"), str(tmp_path / "ck2")
    q1 = _run_stream(spark, pages_dir, out, ck, max_files=1)
    while not q1.recentProgress:
        q1.processAllAvailable()
    q1.stop()
    q2 = _run_stream(spark, pages_dir, out, ck, max_files=1)
    q2.processAllAvailable()
    q2.stop()
    emitted = spark.read.parquet(out)
    thr = _threshold(spark, pages_pdf)
    batch_items = char_ngram_items(P.spark_pages(spark, pages_pdf))
    want = [(r.item, r.cnt) for r in _exact_threshold(batch_items, thr).collect()]
    got = [
        (r.item, r.cnt)
        for r in heavy_hitters_finalize(emitted, batch_items, thr).collect()
    ]
    assert got == want


def test_mg_rejects_bad_capacity(spark, pages_pdf):
    with pytest.raises(ValueError):
        mg_candidates_stream(char_ngram_items(P.spark_pages(spark, pages_pdf)), 0)


def test_heavy_hitters_exact_is_the_word_bigram_face(spark):
    """The contract's batch face (word bigrams over documents) agrees with
    a generic threshold count over bigram_items — same item space."""
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = [(r.item, r.cnt) for r in heavy_hitters_exact(docs, 45).collect()]
    b = [
        (r.item, r.cnt)
        for r in _exact_threshold(bigram_items(docs), 45).collect()
    ]
    assert a == b and len(a) > 0
