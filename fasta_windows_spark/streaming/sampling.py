"""Streaming priority sampling: maintain a Duffield–Lund–Thorup
weight-sensitive sample of an UNBOUNDED page stream — the live twin of
operators/sampling.priority_sample, for the "keep a principled sketch of
what the crawl is ingesting" monitor (per-domain token mass, heavy-hitter
aware) without ever re-scanning history.

Priorities are content-derived fixed-point integers (q_fp = (w << 32) div
md5-uniform, the exact arithmetic of the batch operator via the shared
``priority_frame``), so the sample is a pure function of the SET of pages
seen — stream == batch by construction, and replays/resumes cannot change
it.

Architecture (two-level, the classic distributed top-k):

1. per-SHARD candidate state: pages hash into ``n_shards`` md5 shards;
   one ``applyInPandasWithState`` group per shard holds that shard's
   current top-(k+1) priorities (bounded state: (k+1) keys — the
   ANN-index-not-corpus footprint argument). A row is EMITTED exactly
   once: when it first enters its shard's top-(k+1). Once evicted it can
   never re-enter (priorities are fixed and the bar only rises), so the
   append-mode parquet sink accumulates a superset of every shard's final
   top-(k+1) with no duplicates — exactly-once falls out of the
   monotonicity, no retraction needed.
2. finalize (``priority_sample_finalize``): the global top-(k+1) is
   contained in the union of per-shard top-(k+1)s, which is contained in
   the emitted set — so one bounded reduce over the sink (<= emitted
   candidates, a k-and-shards-sized frame, not the stream) yields the
   EXACT batch sample: same k rows, same tau_fp, same est_fp.

Skew: shards are md5-uniform regardless of host/url skew, so no shard
outgrows its k+1 state; n_shards spreads the per-micro-batch candidate
traffic, not the state.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import (
    _priority_rank_and_tau,
    priority_frame,
)

_STATE_SCHEMA = "pks ARRAY<STRING>, qs ARRAY<LONG>, ws ARRAY<LONG>"

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.StringType()),
        T.StructField("w", T.LongType()),
        T.StructField("q_fp", T.LongType()),
    ]
)


def _make_update(k: int):
    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        chunks = list(pdfs)
        if not chunks:  # NoTimeout today; fence per the scheduler precedent
            return
        cur: dict = {}
        if state.exists:
            pks, qs, ws = state.get
            cur = {p: (int(q), int(w)) for p, q, w in zip(pks, qs, ws)}
        old_keys = set(cur)
        for pdf in chunks:
            for p, w, q in zip(pdf["pk"], pdf["w"], pdf["q_fp"]):
                cur[str(p)] = (int(q), int(w))
        top = sorted(cur.items(), key=lambda kv: (-kv[1][0], kv[0]))[: k + 1]
        state.update(
            (
                [p for p, _ in top],
                [q for _, (q, _) in top],
                [w for _, (_, w) in top],
            )
        )
        entered = [
            {"pk": p, "w": w, "q_fp": q}
            for p, (q, w) in top
            if p not in old_keys
        ]
        if entered:
            yield pd.DataFrame(entered)

    return update


def priority_sample_stream(
    pages: DataFrame,
    k: int,
    n_shards: int = 8,
    weight_col: str = "w",
    key_col: str = "url",
    salt: str = "priority",
) -> DataFrame:
    """Emit every page that enters its shard's top-(k+1) priority set —
    the bounded candidate stream ``priority_sample_finalize`` reduces to
    the exact DLT sample. No watermark: priorities are time-free, state
    is k+1 rows per shard forever."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pf = priority_frame(
        pages, weight_col=weight_col, key_col=key_col, salt=salt
    )
    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("pk").cast("string"), F.lit(":shard"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    )
    return (
        pf.withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandasWithState(
            _make_update(k),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            # append, not update: a candidate is emitted exactly once (at
            # entry) and never retracted, so the operator's output IS an
            # append stream — which also keeps the parquet sink legal
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def priority_sample_finalize(
    emitted: DataFrame, k: int, key_col: str = "url"
) -> DataFrame:
    """Reduce the sink's emitted candidates to the exact global sample:
    (key, w, q_fp, tau_fp, est_fp) — identical to batch priority_sample
    on the same pages. Input is candidate-sized (bounded by emissions,
    not stream length); recomputes wq = w << 32 for the estimator."""
    q = emitted.select(
        F.col("pk"),
        F.col("w").cast("long").alias("w"),
        (F.col("w").cast("long") * F.lit(2**32)).alias("wq"),
        F.col("q_fp").cast("long").alias("q_fp"),
    )
    return _priority_rank_and_tau(q, k, key_col)
