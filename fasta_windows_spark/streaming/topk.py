"""Streaming heavy hitters: a Misra-Gries candidate pass over an UNBOUNDED
item stream, finalized to the EXACT threshold answer by a bounded rescore.

The classic impossibility: exact heavy hitters over a stream needs
vocabulary-sized state (every counter might matter). The classic escape is
the two-pass certificate (Misra & Gries 1982; merge form Agarwal et al.
PODS'12):

1. pass 1 (streaming, bounded state): each md5 shard of the item space
   holds a Misra-Gries summary of ``capacity`` counters in
   ``applyInPandasWithState``. Per micro-batch the shard merges its batch
   counts into the summary with the standard summary-merge — add counts,
   keep the ``capacity`` largest, subtract the (capacity+1)-th largest
   from the survivors — whose undercount after any sequence of merges is
   at most N_shard/(capacity+1). Items are md5-sharded, so an item's
   WHOLE count lives in one shard; therefore any item with true count
   > N_shard/(capacity+1) has a positive counter at end-of-stream and is
   in the summary. Every item is EMITTED to the sink when it enters the
   summary (re-entries re-emit; the sink is a candidate LOG, deduped at
   finalize — the result's exactness never depends on sink dedup).
2. pass 2 (bounded rescore): exact counts for the candidate set only —
   a broadcast semi-join over the archived corpus, state O(candidates)
   not O(vocabulary) — then HAVING count >= threshold.

For any threshold T > max_shard N_shard/(capacity+1), step 1's summary is
a SUPERSET of the true heavy hitters, so step 2 returns EXACTLY the batch
answer (operators/sketch.heavy_hitters_exact) — independent of event
order, micro-batch boundaries, and restarts. tests/test_streaming_topk.py
asserts the bound held on the actual shard totals, making each green run
a validity certificate, not a hope.

Skew: shards are md5-uniform over ITEMS (not hosts/urls), so a hot host
cannot concentrate state; a single globally hot ITEM is one counter.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "items ARRAY<STRING>, counts ARRAY<LONG>, n_seen LONG"

_OUT_SCHEMA = T.StructType([T.StructField("item", T.StringType())])


def _mg_merge(cur: dict, batch: "pd.Series", capacity: int) -> dict:
    """Merge batch value-counts into an MG summary (Agarwal et al. merge):
    pointwise add, then if more than ``capacity`` counters remain, subtract
    the (capacity+1)-th largest count and keep the strictly positive —
    deterministic under the (count DESC, item ASC) tie order."""
    for item, c in batch.items():
        cur[item] = cur.get(item, 0) + int(c)
    if len(cur) <= capacity:
        return cur
    ordered = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))
    cut = ordered[capacity][1]
    return {k: v - cut for k, v in ordered[:capacity] if v - cut > 0}


def _make_update(capacity: int):
    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        chunks = list(pdfs)
        if not chunks:  # NoTimeout today; fence per the scheduler precedent
            return
        cur: dict = {}
        n_seen = 0
        if state.exists:
            items, counts, n_seen = state.get
            cur = {i: int(c) for i, c in zip(items, counts)}
            n_seen = int(n_seen)
        old_keys = set(cur)
        batch = pd.concat([p["item"] for p in chunks], ignore_index=True)
        n_seen += len(batch)
        cur = _mg_merge(cur, batch.value_counts(), capacity)
        state.update((list(cur), [cur[k] for k in cur], n_seen))
        entered = sorted(set(cur) - old_keys)
        if entered:
            yield pd.DataFrame({"item": entered})

    return update


def _shard_col(n_shards: int) -> F.Column:
    return F.pmod(
        F.conv(F.substring(F.md5(F.col("item")), 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    )


def mg_candidates_stream(
    items: DataFrame, capacity: int, n_shards: int = 4
) -> DataFrame:
    """Pass 1: per-shard Misra-Gries over an (item STRING) stream. Emits an
    append stream of candidate items (first entry into the shard summary;
    re-entries re-emit — dedup happens at finalize). State per shard is
    bounded by ``capacity`` counters + one total, forever."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    return (
        items.withColumn("_shard", _shard_col(n_shards))
        .groupBy("_shard")
        .applyInPandasWithState(
            _make_update(capacity),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def heavy_hitters_finalize(
    emitted: DataFrame, items_batch: DataFrame, threshold: int
) -> DataFrame:
    """Pass 2: exact rescore of the candidate log against the archived
    item stream — broadcast LEFT SEMI on the deduped candidates (a
    capacity*shards-sized set, never the vocabulary), one partial-agg
    count, HAVING >= threshold. For any threshold above the MG bound this
    equals operators/sketch.heavy_hitters_exact on the same items."""
    cand = emitted.select("item").distinct()
    return (
        items_batch.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .orderBy(F.desc("cnt"), F.asc("item"))
    )
