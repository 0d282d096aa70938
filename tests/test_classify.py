"""Perceptron trainer tests: numpy lockstep differential, epoch
semantics, partition invariance, early stop, and prediction rule."""

import hashlib

import numpy as np
import pyspark.sql.functions as F

from fasta_windows_spark.operators import classify

B, E = 64, 3
SF = "/root/testdata/sf0.001/documents.parquet"


def _hb(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B


def _fit_numpy(rows, epochs):
    """Reference full-batch perceptron, independent of Spark and SQL."""
    tf, y = {}, {}
    for did, txt, yy in rows:
        y[did] = yy
        d = {}
        for t in (txt or "").lower().split(" "):
            b = _hb(t)
            d[b] = d.get(b, 0) + 1
        tf[did] = d
    w = np.zeros(B, dtype=np.int64)
    mis_per_epoch = []
    for _ in range(epochs):
        dw = np.zeros(B, dtype=np.int64)
        n_mis = 0
        for did, d in tf.items():
            s = sum(c * w[b] for b, c in d.items())
            if y[did] * s <= 0:
                n_mis += 1
                for b, c in d.items():
                    dw[b] += y[did] * c
        w = w + dw
        mis_per_epoch.append(n_mis)
    return w, mis_per_epoch


def test_fit_matches_numpy(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text, CASE WHEN lang='en' THEN 1 ELSE -1 END "
        f"FROM '{SF}'"
    ).fetchall()
    w_ref, mis = _fit_numpy(rows, E)
    # the corpus must exercise non-trivial epochs (not all-correct after
    # epoch 1), or this test proves nothing about the update loop
    assert mis[0] == len(rows) and mis[1] > 0

    docs = spark.read.parquet(SF)
    got = classify.perceptron_fit(
        docs, target=F.col("lang") == "en", n_buckets=B, epochs=E
    ).collect()
    assert {r.b: r.w for r in got} == {
        b: int(w_ref[b]) for b in range(B) if any(
            _hb(t) == b for _, txt, _ in rows
            for t in (txt or "").lower().split(" ")
        )
    }


def test_fit_partition_invariant(spark):
    docs = spark.read.parquet(SF)
    tgt = F.col("lang") == "en"
    a = classify.perceptron_fit(docs, tgt, n_buckets=B, epochs=2).collect()
    b = classify.perceptron_fit(
        docs.repartition(17), tgt, n_buckets=B, epochs=2
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fit_early_stop_when_separable(spark):
    """A corpus the first epoch separates perfectly trains to the same
    weights at any higher epoch count (the empty-update break)."""
    docs = spark.createDataFrame(
        [("a", "aaa aaa", "en"), ("b", "bbb bbb", "de")],
        "doc_id string, text string, lang string",
    )
    tgt = F.col("lang") == "en"
    w1 = classify.perceptron_fit(docs, tgt, n_buckets=B, epochs=1).collect()
    w9 = classify.perceptron_fit(docs, tgt, n_buckets=B, epochs=9).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w9))


def test_scores_prediction_rule(spark):
    docs = spark.read.parquet(SF)
    tgt = F.col("lang") == "en"
    w = classify.perceptron_fit(docs, tgt, n_buckets=B, epochs=E)
    sc = classify.perceptron_scores(docs, w, target=tgt, n_buckets=B)
    rows = sc.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r.pred == (1 if r.score > 0 else -1)
        assert r.y in (1, -1)
    # the trained gate must beat chance on its own training labels
    acc = sum(1 for r in rows if r.pred == r.y) / len(rows)
    assert acc > 0.5, acc


def test_fit_rejects_zero_epochs(spark):
    import pytest

    docs = spark.read.parquet(SF)
    with pytest.raises(ValueError):
        classify.perceptron_fit(
            docs, F.col("lang") == "en", n_buckets=B, epochs=0
        )


def test_model_gate_stream_matches_batch(spark, tmp_path):
    """model_gate is a stateless projection, so the streaming run over
    the same pages must be row-identical to the batch run — including the
    integer DSIR fixed-point scores (no float drift: the models are
    plan-literal BIGINT arrays in both plans)."""
    from fasta_windows_spark.operators import sampling
    from fasta_windows_spark.sources import pages as P

    d = str(tmp_path / "pages")
    pdf = P.gen_pages(n_pages=300, n_hosts=8, seed=7)
    P.write_pages_parquet(pdf, d, n_files=3)
    batch = spark.read.parquet(d)

    tgt = F.col("lang") == "en"
    w = classify.collect_weights_array(
        classify.perceptron_fit(
            batch, tgt, n_buckets=B, epochs=2, id_col="url"
        ),
        B,
    )
    lr = classify.collect_lr_fp_array(
        sampling.dsir_bucket_model(batch, tgt, n_buckets=256), 256
    )

    expected = sorted(
        map(tuple, classify.model_gate(batch, w, lr)
            .select("url", "pct_score", "pred", "dsir_fp", "keep")
            .collect())
    )

    from fasta_windows_spark.streaming import pipeline as S

    stream = S.read_pages_stream(spark, d, max_files_per_trigger=1)
    gated = classify.model_gate(stream, w, lr).select(
        "url", "pct_score", "pred", "dsir_fp", "keep"
    )
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointPath", ck)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == expected
    assert len(got) == 300
    # the gate must actually separate: both kept and dropped pages exist
    kept = sum(1 for r in got if r[4] == 1)
    assert 0 < kept < 300


def test_model_gate_passthrough_and_guard(spark):
    docs = spark.read.parquet(SF)
    import pytest

    with pytest.raises(ValueError):
        classify.model_gate(docs, [], [1], id_col="doc_id")
    out = classify.model_gate(docs, [0] * B, [0] * 256, id_col="doc_id")
    # zero models: score 0 everywhere -> pred -1, dsir 0 -> keep 0
    row = out.limit(1).collect()[0]
    assert (row.pct_score, row.pred, row.dsir_fp, row.keep) == (0, -1, 0, 0)
    # non-text columns ride through for downstream pipeline stages
    assert "lang" in out.columns and "source" in out.columns
    assert "text" not in out.columns


def _auc_sklearn_free(pairs):
    """Reference exact AUC over (y, score) pairs: brute-force pair count
    with midrank ties — 2*U and the exact rational, independent of Spark
    and SQL."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == -1]
    u2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                u2 += 2
            elif p == n:
                u2 += 1
    return u2, 2 * len(pos) * len(neg)


def test_binary_auc_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.choice([1, -1]), rng.randrange(-50, 50))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, y long, score long")
    rep = classify.binary_auc_report(df).collect()[0]
    u2, den = _auc_sklearn_free([(y, s) for _, y, s in rows])
    assert rep.auc_num == u2
    assert rep.auc_den == den
    assert rep.auc_fp == u2 * 1_000_000 // den
    assert rep.n_pos == sum(1 for _, y, _ in rows if y == 1)
    assert rep.tp == sum(1 for _, y, s in rows if y == 1 and s > 0)
    assert rep.tn == sum(1 for _, y, s in rows if y == -1 and s <= 0)


def test_binary_auc_extremes(spark):
    # perfectly separated -> AUC exactly 1; all-ties -> exactly 1/2
    sep = spark.createDataFrame(
        [(i, 1, 10) for i in range(5)] + [(i + 5, -1, -10) for i in range(5)],
        "doc_id long, y long, score long",
    )
    r = classify.binary_auc_report(sep).collect()[0]
    assert (r.auc_num, r.auc_den, r.auc_fp) == (50, 50, 1_000_000)
    tie = spark.createDataFrame(
        [(i, 1 if i % 2 else -1, 3) for i in range(10)],
        "doc_id long, y long, score long",
    )
    r = classify.binary_auc_report(tie).collect()[0]
    assert r.auc_num * 2 == r.auc_den
    assert r.auc_fp == 500_000


def test_binary_auc_partition_invariant(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.choice([1, -1]), rng.randrange(-9, 9)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, y long, score long")
    a = classify.binary_auc_report(df.repartition(1)).collect()[0]
    b = classify.binary_auc_report(
        df.repartition(17), group_size=8
    ).collect()[0]
    assert a.asDict() == b.asDict()


def test_binary_auc_single_class_null_fp(spark):
    only_pos = spark.createDataFrame(
        [(i, 1, i) for i in range(4)], "doc_id long, y long, score long"
    )
    r = classify.binary_auc_report(only_pos).collect()[0]
    assert r.n_neg == 0 and r.auc_den == 0 and r.auc_fp is None


def test_calibration_bins_partition_rows(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, rng.choice([1, -1]), rng.randrange(-1000, 1000))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, y long, score long")
    rep = {r.bin: r for r in classify.calibration_report(df).collect()}
    # bins partition the corpus and the rate is the exact floor fixed point
    assert sum(r.n for r in rep.values()) == 500
    for r in rep.values():
        assert r.pos_rate_fp == r.n_pos * 1_000_000 // r.n
    # monotone bin boundaries: every score in bin b is <= every score in b+2
    # (adjacent bins can share a threshold-equal score); check via sums
    assert sorted(rep) == list(range(min(rep), max(rep) + 1))
