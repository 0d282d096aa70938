"""Skew handling: salted two-stage aggregation (north_rule item).

Hot keys (a viral url-host receiving 100x traffic) stall the single reducer
that owns them. Salting splits each key across `buckets` reducers for the
partial stage, then merges partials in a second, much smaller aggregation.
Correct only for algebraic aggregates (count/sum/min/max — merge = same op
over partials; avg = sum/count pair). AQE's skew-join splitting handles the
join-side analog (enabled in session.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MERGES = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) -> groupBy(keys).

    aggs: output_name -> (fn, input_col) with fn in {count,sum,min,max}.
    salt_col: column to derive the salt from (default: a uniform hash of the
    full row via monotonically varying input — callers pass a high-card id).
    """
    if salt_col is None:
        salt = F.pmod(F.spark_partition_id() * 31 + F.crc32(F.concat_ws("|", *keys)), F.lit(buckets))
    else:
        salt = F.pmod(F.hash(salt_col), F.lit(buckets))
    salted = df.withColumn("_salt", salt)

    partial_exprs = []
    for name, (fn, col) in aggs.items():
        f = F.count(col) if fn == "count" else getattr(F, fn)(col)
        partial_exprs.append(f.alias(f"_p_{name}"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)

    final_exprs = [
        MERGES[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)
