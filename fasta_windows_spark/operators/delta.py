"""Incremental snapshot processing: diff two crawls of the same key space.

The recurring web-pipeline question — "what changed since the last crawl?" —
as a single full-outer join classifying every key into added / deleted /
changed / same. Downstream incremental jobs (re-embedding, re-indexing,
re-deduping) then touch only the added+changed slice instead of the full
10^12-row snapshot.

Scale shape: one co-keyed full-outer shuffle join on the page key. On a
real lakehouse both snapshots are bucketed/partitioned by the same key, so
the join is co-located and shuffle-free; content comparison rides a
fixed-width fingerprint (md5 here), never the payload bytes, so the join
moves (key, 16-byte hash) pairs — the payload columns stay pruned.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_delta(
    prev: DataFrame,
    curr: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Classify every key across two snapshots: 'added' (curr only),
    'deleted' (prev only), 'changed' (both, fingerprint differs), 'same'.
    Returns (key, status, prev_fp, curr_fp); fingerprints are md5 of the
    content column (NULL on the missing side)."""
    p = prev.select(
        F.col(key_col).alias("k"), F.md5(content_col).alias("prev_fp")
    )
    c = curr.select(
        F.col(key_col).alias("k"), F.md5(content_col).alias("curr_fp")
    )
    j = p.join(c, "k", "full_outer")
    status = (
        F.when(F.col("prev_fp").isNull(), "added")
        .when(F.col("curr_fp").isNull(), "deleted")
        .when(F.col("prev_fp") == F.col("curr_fp"), "same")
        .otherwise("changed")
    )
    return j.select(
        F.col("k").alias(key_col), status.alias("status"), "prev_fp", "curr_fp"
    )


def _token_counts_by_snapshot(
    prev: DataFrame, curr: DataFrame, text_col: str
) -> DataFrame:
    """Staged (tok, c1, c2) unigram frame over BOTH snapshots: a tagged
    union reduced by ONE token-keyed partial-agg groupBy — no join, and
    the only shuffle in the whole drift computation. Text never leaves
    its scan."""
    from ..staging import stage_scoped

    def toks(df: DataFrame, src: int) -> DataFrame:
        return df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
            F.lit(src).alias("src"),
        )

    u = toks(prev, 1).unionByName(toks(curr, 2))
    tc = u.groupBy("tok").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    return stage_scoped(tc, scope="token_drift_tc")


def _drift_frame(prev: DataFrame, curr: DataFrame, text_col: str) -> DataFrame:
    """(tok, c1, c2, n1, n2, dnum) with dnum = |c1*n2 - c2*n1| carried as
    DECIMAL(38,0) — the exact cross-multiplied numerator of the per-token
    probability gap (common denominator n1*n2), the same integer-products
    regime as semdedup's HUGEINT cosine. Exact while total tokens per
    snapshot < ~1e15 (any real corpus; DuckDB HUGEINT matches to 1.7e38)."""
    tc = _token_counts_by_snapshot(prev, curr, text_col)
    tot = tc.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = F.col("c1").cast("decimal(38,0)") * F.col("n2") - F.col(
        "c2"
    ).cast("decimal(38,0)") * F.col("n1")
    return tc.crossJoin(F.broadcast(tot)).withColumn("dnum", F.abs(d))


def token_drift_summary(
    prev: DataFrame, curr: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus drift monitor between two crawl snapshots, one row: snapshot
    token totals, union-vocabulary size, tokens exclusive to either side,
    and the EXACT total-variation distance between the two unigram
    distributions as 1e-6 floor fixed point:

        TV = (1/2) sum_t |c1_t/n1 - c2_t/n2|
           = sum_t |c1_t*n2 - c2_t*n1| / (2*n1*n2)

    — the distribution-shift alarm a continuously-retrained pipeline
    checks before mixing a new crawl in. All arithmetic integer (DECIMAL
    38,0 products vs the oracle's HUGEINT), so the score is bit-identical
    cross-engine — no float log divergence (which is why TV, not KL/JS,
    is the hash-gated metric). One token shuffle + a 1-row broadcast +
    one reduce."""
    f = _drift_frame(prev, curr, text_col)
    return f.groupBy("n1", "n2").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_tokens"),
        F.sum(F.when(F.col("c2") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_prev_only"),
        F.sum(F.when(F.col("c1") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_curr_only"),
        F.expr(
            "cast((sum(dnum) * 1000000) div nullif(2 * cast(n1 as "
            "decimal(38,0)) * n2, 0) as bigint)"
        ).alias("tv_fp"),
    ).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "n_union_tokens", "n_prev_only", "n_curr_only", "tv_fp",
    )


def token_drift_topk(
    prev: DataFrame, curr: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """The attribution half of the drift alarm: the k tokens moving the
    TV distance most, ordered by exact numerator descending with token
    tie-break (total order, so the top-k SET is deterministic and
    oracle-checkable). drift_fp is the token's 1e-6 fixed-point
    contribution to TV. Compiles to TakeOrderedAndProject over the staged
    token frame — no global sort."""
    f = _drift_frame(prev, curr, text_col)
    out = f.select(
        "tok", "c1", "c2",
        F.expr(
            "cast((dnum * 1000000) div nullif(2 * cast(n1 as "
            "decimal(38,0)) * n2, 0) as bigint)"
        ).alias("drift_fp"),
        "dnum",
    )
    return (
        out.orderBy(F.col("dnum").desc(), "tok")
        .limit(k)
        .drop("dnum")
    )
