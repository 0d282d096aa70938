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
