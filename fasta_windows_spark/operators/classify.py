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


def collect_weights_array(
    weights: DataFrame,
    n_buckets: int,
    b_col: str = "b",
    w_col: str = "w",
    default: int = 0,
) -> list:
    """Collect a trained (bucket, weight) table into the dense bucket-
    indexed list model_gate embeds as a plan literal. Metadata-sized
    (n_buckets rows), like the k-means centroid pulls; buckets absent
    from the table get ``default``."""
    arr = [default] * n_buckets
    for r in weights.select(b_col, w_col).collect():
        arr[int(r[b_col])] = int(r[w_col])
    return arr


def collect_lr_fp_array(
    model: DataFrame,
    n_buckets: int,
    lr_col: str = "lr",
    b_col: str = "b",
    scale: int = 10**6,
) -> list:
    """Quantize a trained DSIR bucket model (operators/sampling.
    dsir_bucket_model) to 1e-6 fixed-point BIGINTs — rounded IN Spark
    (F.round, same HALF_UP-away-from-zero rule the SQL oracle's round()
    applies), never in Python (banker's rounding would diverge). Once
    quantized, every downstream score is an exact integer sum:
    order-independent and bit-identical cross-engine, unlike summing the
    float lr values."""
    rows = model.select(
        F.col(b_col),
        F.round(F.col(lr_col) * scale).cast("long").alias("fp"),
    ).collect()
    arr = [0] * n_buckets
    for r in rows:
        arr[int(r[b_col])] = int(r["fp"])
    return arr


def _bucket_score_expr(
    text_col: str, arr_col: str, n_buckets: int
) -> str:
    """Per-row token fold: sum the plan-literal array entry of each
    token's md5 bucket. Pure JVM expressions (md5 + conv + aggregate),
    one pass over the row's tokens, no explode, no shuffle, no state —
    which is what makes the gate legal and cheap on an unbounded stream.
    Summing the per-BUCKET integer once per token equals the batch
    (tf * w) formulation exactly."""
    b = (
        f"pmod(cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint), "
        f"{n_buckets})"
    )
    return (
        f"aggregate(transform(split(lower({text_col}), ' '), "
        f"t -> element_at({arr_col}, cast({b} + 1 as int))), "
        f"0L, (acc, x) -> acc + x)"
    )


def model_gate(
    pages: DataFrame,
    pct_w: list,
    dsir_lr_fp: list,
    min_dsir_fp: int = 0,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Online corpus curation under TRAINED models — the streaming
    deployment of the perceptron gate (perceptron_fit) and the DSIR
    importance model (operators/sampling.dsir_bucket_model): score every
    incoming page against both, keep pages the classifier accepts
    (pct_score > 0) whose fixed-point DSIR weight clears ``min_dsir_fp``.

    Emits every input row with (pct_score, pred, dsir_fp, keep) so the
    caller can gate (`.where("keep = 1")`), route, or audit; all four are
    exact BIGINTs.

    Batch/stream duality: the plan is a single stateless JVM projection —
    both models ride along as plan-literal arrays (metadata-sized, the
    broadcast-scalar pattern), tokens are hashed and folded per row with
    no explode and no aggregation state — so the SAME call runs on a
    bounded DataFrame (where the oracle hash-checks it, see
    contract.docs_model_gate) and on readStream micro-batches (where it
    needs no watermark and adds no state store), and the two are
    row-identical by construction. At 10^12 pages/day this is the shape
    you want: model updates re-broadcast a few KB; the stream never
    repartitions."""
    if min(len(pct_w), len(dsir_lr_fp)) < 1:
        raise ValueError("empty model arrays")
    out = pages.withColumn(
        "_pw", F.array(*[F.lit(int(v)) for v in pct_w])
    ).withColumn("_dl", F.array(*[F.lit(int(v)) for v in dsir_lr_fp]))
    out = out.withColumn(
        "pct_score",
        F.expr(_bucket_score_expr(text_col, "_pw", len(pct_w))).cast("long"),
    ).withColumn(
        "dsir_fp",
        F.expr(_bucket_score_expr(text_col, "_dl", len(dsir_lr_fp))).cast(
            "long"
        ),
    )
    return out.select(
        F.col(id_col),
        "pct_score",
        F.when(F.col("pct_score") > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("pred"),
        "dsir_fp",
        F.when(
            (F.col("pct_score") > 0)
            & (F.col("dsir_fp") >= F.lit(int(min_dsir_fp))),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
        *[c for c in pages.columns if c not in (id_col, text_col)],
    )


def binary_auc_report(
    scored: DataFrame,
    score_col: str = "score",
    y_col: str = "y",
    group_size: int = 4096,
) -> DataFrame:
    """Exact classifier evaluation in one row: confusion counts at the
    decision threshold (score > 0, the perceptron's prediction rule) plus
    EXACT ROC-AUC via the Mann-Whitney rank-sum identity — no trapezoid
    approximation, no float ranks. With ties at midrank,

        2*U = sum over distinct scores s of pos(s) * (2*neg_below(s) + neg(s))
        AUC = 2*U / (2 * n_pos * n_neg)

    so the report carries the exact rational (auc_num = 2U, auc_den =
    2*n_pos*n_neg, both BIGINT) alongside the floor-divided 1e-6 fixed
    point — every column an exact integer, hash-checkable cross-engine.

    100 TB shape: one partial-agg groupBy collapses the corpus to the
    distinct-score frame; neg_below is the segmented-scan exclusive
    prefix sum (packing.running_offset — one order-aligned hash Exchange
    + metadata-sized group offsets, NOT an Exchange-SinglePartition
    global window); the final reduce is one row. Overflow: auc_num *
    1e6 <= 2e6 * n_pos * n_neg must stay inside BIGINT, i.e. evaluate on
    an eval split up to ~2e6 x 2e6 — the standard regime (nobody labels
    10^12 docs); corpus-scale evaluation shards by stratum first.
    """
    from .packing import running_offset

    s = F.col(score_col)
    g = scored.groupBy(score_col).agg(
        F.sum(F.when(F.col(y_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("pos"),
        F.sum(F.when(F.col(y_col) == -1, 1).otherwise(0))
        .cast("long")
        .alias("neg"),
    )
    c = running_offset(
        g, order_col=score_col, val_col="neg", out_col="neg_below",
        group_size=group_size,
    )
    row = c.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.when(s > 0, F.col("pos")).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(s > 0, F.col("neg")).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(s <= 0, F.col("neg")).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when(s <= 0, F.col("pos")).otherwise(0)).cast("long").alias("fn"),
        F.sum(
            F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
        ).cast("long").alias("auc_num"),
    )
    return row.select(
        "n_pos", "n_neg", "tp", "fp", "tn", "fn", "auc_num",
        (2 * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        F.expr(
            "cast(auc_num * 1000000 div nullif(2 * n_pos * n_neg, 0) as bigint)"
        ).alias("auc_fp"),
    )


def calibration_report(
    scored: DataFrame,
    score_col: str = "score",
    y_col: str = "y",
    probs: tuple = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Decile calibration table for a trained scorer: bins bounded by the
    EXACT score percentiles (Spark `percentile` == DuckDB `quantile_cont`
    by the shared (n-1)p interpolation — the docs_length_quantile_filter
    precedent), one row per occupied bin with n, n_pos, the exact BIGINT
    score sum, and the 1e-6 fixed-point positive rate. The thresholds are
    ONE 1-row aggregate broadcast back over the scan (the data-dependent-
    threshold pattern); bin assignment is a count-of-thresholds-below
    fold, so there is no sort and no window — two passes total, both
    partial-aggregated. int64 -> double threshold comparison is exact for
    |score| < 2^53."""
    plist = ", ".join(repr(float(p)) for p in probs)
    th = scored.agg(
        F.expr(f"percentile({score_col}, array({plist}))").alias("_th")
    )
    b = scored.crossJoin(F.broadcast(th)).select(
        F.col(y_col),
        F.col(score_col),
        F.expr(
            f"cast(aggregate(_th, 0L, (acc, t) -> acc + "
            f"(case when {score_col} > t then 1L else 0L end)) as bigint)"
        ).alias("bin"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col(y_col) == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum(score_col).cast("long").alias("sum_score"),
        )
        .select(
            "bin", "n", "n_pos", "sum_score",
            F.expr("cast(n_pos * 1000000 div n as bigint)").alias(
                "pos_rate_fp"
            ),
        )
    )
