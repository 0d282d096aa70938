"""Distributed linear-classifier training: a full-batch integer perceptron
over hashed bag-of-words features — the "train a quality/language
classifier on the corpus" primitive of an LLM-data pipeline (the
fastText-style gate CCNet/Gopher pipelines apply), built so training
itself is hash-checkable against ANSI SQL.

Why a perceptron and not logistic regression: the update rule
(w += sum of y·tf over misclassified docs) is pure integer arithmetic on
BIGINT — no sigmoid, no float learning rate — so the trained weights are
bit-identical across Spark, DuckDB, and numpy, and the whole training run
sits behind a driver hash gate like every other operator. Full-batch
(rather than SGD) makes each epoch order-independent: one deterministic
aggregate per epoch instead of a row-order-dependent scan.

The reference engine has no classifier (it is a windowed-statistics
binary, fw.rs); this module is LLM-pipeline surface mandated by the build
brief, alongside functions/text.py's static quality scores — those are
hand-tuned heuristics, this LEARNS the gate from labels.

Features: lowercased whitespace tokens hashed into ``n_buckets`` buckets
with the portable md5 bucket hash shared with operators/sampling's DSIR
models (('0x'||substr(md5(tok),1,8))::BIGINT % B in SQL), term-frequency
weighted. Labels: y = +1 where ``target`` holds, else -1.

100 TB shape: the corpus is tokenized ONCE into the staged (doc, bucket,
tf) frame — one partial-agg shuffle, <= n_buckets rows per doc, text
never shuffles and never enters Python. Every epoch then costs two
aggregations over that staged frame: scoring is a zero-join projection
against the weights embedded as a plan-literal array (weights are
metadata-sized — n_buckets BIGINTs — pulled to the driver each epoch
exactly like the k-means centroid collects, cluster.py), reduced per-doc
by a map-side-combined groupBy; the update is a second partial-agg
groupBy on bucket over the misclassified semi-join. Epoch count is fixed
and small, so total cost is O(epochs * staged-frame) with no lineage
growth (each epoch starts from the cached staged frame).

Overflow: |w| grows by at most total-corpus-tokens per epoch (~10^15 at
10^12 docs x 10^3 tokens) and scores by tf*|w| — both inside BIGINT
(~9.2e18) for any realistic corpus; the staged tf frame keeps every
product exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..staging import stage_scoped
from .sampling import _hash_bucket


def _perceptron_tf(
    docs: DataFrame,
    target: Column,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Staged (doc, y, bucket, tf) feature frame — the single corpus pass
    every epoch reuses."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.when(target, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    tb = toks.select(
        "doc", "y", _hash_bucket(F.col("tok"), n_buckets).alias("b")
    )
    return stage_scoped(
        tb.groupBy("doc", "y", "b").agg(F.count(F.lit(1)).alias("tf")),
        scope="perceptron_tf",
    )


def perceptron_fit(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 64,
    epochs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the full-batch perceptron for ``epochs`` epochs from w = 0;
    returns the weights table (b, w) over the buckets present in the
    corpus, BIGINT-exact.

    Epoch semantics (the classic batch perceptron): a doc is misclassified
    when y * score <= 0 (so epoch 1, under zero weights, updates on every
    doc); the epoch's update is dw[b] = sum over misclassified docs of
    y * tf(doc, b), applied once at epoch end. Deterministic by
    construction — no learning-rate float, no row order.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    tf = _perceptron_tf(docs, target, n_buckets, text_col, id_col)
    w1 = tf.groupBy("b").agg(F.sum(F.col("tf") * F.col("y")).alias("w"))
    wmap = {r.b: int(r.w) for r in w1.collect()}
    for _ in range(epochs - 1):
        wlit = F.array(
            *[F.lit(int(wmap.get(b, 0))) for b in range(n_buckets)]
        )
        scores = (
            tf.withColumn("wl", wlit)
            .groupBy("doc", "y")
            .agg(
                F.sum(
                    F.col("tf")
                    * F.expr("element_at(wl, cast(b + 1 as int))")
                ).alias("score")
            )
        )
        mis = scores.where(F.col("y") * F.col("score") <= 0).select("doc")
        upd = (
            tf.join(mis, "doc")
            .groupBy("b")
            .agg(F.sum(F.col("tf") * F.col("y")).alias("dw"))
            .collect()
        )
        if not upd:
            break
        for r in upd:
            wmap[r.b] = wmap.get(r.b, 0) + int(r.dw)
    spark = docs.sparkSession
    return spark.createDataFrame(
        sorted(wmap.items()), "b bigint, w bigint"
    )


def perceptron_scores(
    docs: DataFrame,
    weights: DataFrame,
    target: Column,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under a trained weights table: (id, y, score,
    pred) with pred = +1 iff score > 0 (the <= 0 side is the update set,
    so it predicts -1). The weights frame is bucket-sized and broadcasts;
    scoring is the staged tf frame + one map-side-combined per-doc sum —
    the same zero-corpus-shuffle shape as the fit epochs."""
    tf = _perceptron_tf(docs, target, n_buckets, text_col, id_col)
    return (
        tf.join(F.broadcast(weights), "b")
        .groupBy("doc", "y")
        .agg(F.sum(F.col("tf") * F.col("w")).cast("long").alias("score"))
        .select(
            F.col("doc").alias(id_col),
            F.col("y").cast("long").alias("y"),
            "score",
            F.when(F.col("score") > 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("pred"),
        )
    )
