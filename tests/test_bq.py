"""Binary (1-bit) quantization tests: exact agreement of the packed
codes with an independent pure-Python reference, Hamming-search
correctness, re-ranked recall floor vs the exact-integer truth, and
partition invariance of the trained thresholds."""

import pyspark.sql.functions as F
import pytest

from fasta_windows_spark.operators import cluster as C
from fasta_windows_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _py_codes(rows):
    """Spec replica: fixed-point, per-dim sums, bit = (x * n > s),
    32 bits per word little-endian within the word."""
    fvs = {r.vec_id: [round(x * C.SCALE) for x in r.embedding] for r in rows}
    n = len(fvs)
    d = len(next(iter(fvs.values())))
    sums = [sum(fv[i] for fv in fvs.values()) for i in range(d)]
    out = {}
    for vid, fv in fvs.items():
        bits = [1 if fv[i] * n > sums[i] else 0 for i in range(d)]
        words = [
            sum(b << i for i, b in enumerate(bits[j * 32 : j * 32 + 32]))
            for j in range(d // 32)
        ]
        out[vid] = words
    return out


def test_bq_codes_match_python_reference(spark, emb):
    ref = _py_codes(emb.collect())
    got = {
        r.vec_id: list(r.words) for r in S.bq_encode(emb).collect()
    }
    assert got == ref


def test_bq_hand_computed_packing(spark):
    """3 vectors, d=32 (one word): dim means are known, so the expected
    bit patterns are hand-derivable. v0 = all 10, v1 = all 20, v2
    alternates 10/40 -> means: even dims 40/3, odd dims 70/3. Bits
    (x*3 > sum): v0 none, v1 even dims only (60>40, not 60>70), v2 even
    dims 30<40 -> 0, odd dims 120>70 -> 1."""
    rows = [
        (0, [10.0 / C.SCALE] * 32),
        (1, [20.0 / C.SCALE] * 32),
        (2, [10.0 / C.SCALE, 40.0 / C.SCALE] * 16),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: list(r.words) for r in S.bq_encode(df).collect()}
    even = sum(1 << i for i in range(0, 32, 2))
    odd = sum(1 << i for i in range(1, 32, 2))
    assert got == {0: [0], 1: [even], 2: [odd]}


def test_bq_search_matches_python(spark, emb):
    rows = emb.collect()
    codes = _py_codes(rows)
    qw = codes[0]

    def ham(w):
        return sum(bin(a ^ b).count("1") for a, b in zip(w, qw))

    expected = sorted(
        ((ham(w), vid) for vid, w in codes.items() if vid != 0)
    )[:10]
    got = [
        (r.ham, r.vec_id)
        for r in S.bq_search(emb, query_vec_id=0, k=10).collect()
    ]
    assert got == expected


def test_bq_reranked_recall_floor(spark, emb):
    """Measured when this test was written: Hamming-160 shortlist +
    exact re-rank recovers the exact-integer top-10 completely (recall
    1.0 at BOTH sf0.001 and sf0.01; raw Hamming alone reads 0.1/0.3, so
    the re-rank stage carries the quality). Gate at the same >= 0.8
    floor the PQ re-ranked path uses."""
    qd = C.quantize(emb)
    qf = [int(x) for x in qd.where(F.col("vec_id") == 0).first()["fv"]]
    from fasta_windows_spark.operators.cluster import _longs_sql

    d2 = (
        f"aggregate(zip_with(fv, {_longs_sql(qf)}, "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"
    )
    truth = {
        r.vec_id
        for r in qd.where("vec_id != 0")
        .select("vec_id", F.expr(d2).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    }
    got = {
        r.vec_id
        for r in S.bq_rerank_search(
            emb, query_vec_id=0, k=10, shortlist=160
        ).collect()
    }
    assert len(truth & got) / len(truth) >= 0.8


def test_bq_threshold_partition_invariance(spark, emb):
    base = {r.vec_id: list(r.words) for r in S.bq_encode(emb).collect()}
    shuffled = {
        r.vec_id: list(r.words)
        for r in S.bq_encode(emb.repartition(13)).collect()
    }
    assert base == shuffled
