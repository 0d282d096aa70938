"""Streaming distribution-shift monitor: per event-time window, the EXACT
total-variation distance between the window's hashed-unigram distribution
and a trained reference distribution — the live alarm face of
operators/delta.token_drift_summary (which compares two bounded
snapshots). A retraining pipeline tails this to decide when the corpus
mix has moved enough to re-mix / re-train.

Shape: tokens explode statelessly, hash into B md5 buckets (the portable
bucket shared with DSIR/perceptron), and ONE watermark-bounded windowed
aggregate reduces them to B conditional sums per window — a plain
whole-stage-codegen HashAggregate in the state store, no Python, no
custom state. The reference rides as plan literals (B counts + a total —
metadata-sized, the broadcast-scalar pattern), so the TV verdict per
window is a stateless fold over the emitted row:

    TV = sum_b |c_b * N - g_b * n| / (2 * n * N)        (exact rational)

evaluated in DECIMAL(38,0) integer products (the semdedup/token_drift
regime) and floor-scaled to 1e-6 fixed point — bit-identical between the
batch and streaming faces and hash-checkable against ANSI SQL. The SAME
function runs both faces: ``window()`` groups bounded frames too and
``withWatermark`` is a no-op in batch plans, so the contract oracle
(contract.docs_window_drift) gates the exact operator the stream runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DRIFT_BUCKETS = 64


def corpus_bucket_counts(
    docs: DataFrame,
    n_buckets: int = DRIFT_BUCKETS,
    text_col: str = "text",
) -> list:
    """Dense bucket-count list of the reference corpus' hashed unigrams —
    the trained model the monitor compares against. One explode +
    partial-agg groupBy, collected at n_buckets rows (metadata-sized)."""
    rows = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
        )
        .select(_bucket("tok", n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("g"))
        .collect()
    )
    arr = [0] * n_buckets
    for r in rows:
        arr[int(r.b)] = int(r.g)
    return arr


def _bucket(col: str, n_buckets: int) -> F.Column:
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def window_drift(
    pages: DataFrame,
    ref_counts: list,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """(window_start, window_end, n_tokens, tv_fp) per event-time window:
    the window's hashed-unigram TV distance to ``ref_counts`` in 1e-6
    fixed point, every column exact. ``slide`` < ``window`` turns the
    monitor sliding (the reference's -w/-s analog: overlapping windows,
    each page contributing to window/slide of them) — same single
    stateful aggregate, more groups. Pass ``streaming=True`` on an
    unbounded frame to bound state with a watermark; the batch plan is
    otherwise identical — the duality the stream==batch test pins."""
    n_b = len(ref_counts)
    big_n = sum(int(g) for g in ref_counts)
    if big_n <= 0:
        raise ValueError("reference corpus has no tokens")
    src = pages.withWatermark(ts_col, watermark) if streaming else pages
    toks = src.select(
        F.col(ts_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).select(ts_col, _bucket("tok", n_b).alias("b"))
    aggs = [
        F.sum(F.when(F.col("b") == i, 1).otherwise(0))
        .cast("long")
        .alias(f"_c{i}")
        for i in range(n_b)
    ]
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    g = toks.groupBy(win).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"), *aggs
    )
    glit = "array(" + ",".join(f"{int(x)}L" for x in ref_counts) + ")"
    carr = "array(" + ",".join(f"_c{i}" for i in range(n_b)) + ")"
    tv = (
        f"cast(aggregate(zip_with({carr}, {glit}, (c, g) -> "
        f"abs(cast(c as decimal(38,0)) * {big_n} - "
        f"cast(g as decimal(38,0)) * n_tokens)), "
        f"cast(0 as decimal(38,0)), (acc, x) -> acc + x) * 1000000 "
        f"div (2 * cast(n_tokens as decimal(38,0)) * {big_n}) as bigint)"
    )
    return g.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_tokens",
        F.expr(tv).alias("tv_fp"),
    )
