"""Streaming near-duplicate suppression: SimHash band LSH over keyed state.

The batch dedup surface (operators/dedup.py) finds near-dups by joining
banded signatures over the whole corpus; a crawl ingest pipeline needs the
same decision ONLINE — "is this page a near-duplicate of anything already
ingested?" — without a corpus-wide join per micro-batch. This module keys
arbitrary state by SimHash LSH band (the banding already used by
`simhash_near_pairs`: 4 bands x 15 bits of the 60-bit signature) and keeps
a bounded ring of full signatures per band bucket:

- a page emits one row per band; a row is `matched` iff some earlier page
  in the SAME band bucket has full-signature Hamming distance <= max_hamming;
- a page is a near-duplicate iff ANY of its 4 band rows matched (two pages
  within Hamming h agree exactly on at least one 15-bit band unless all h
  flips land in distinct bands — the standard LSH recall argument; at h=3,
  P(some band untouched) = 1 against h < 4 since 4 bands can't all be hit
  by 3 flips: recall is EXACT for h <= 3, probabilistic above);
- the per-doc ANY-band verdict is a plain per-batch aggregation
  (`finalize_near_dup`), valid because all 4 band rows of a page are
  emitted in the page's own micro-batch — the foreachBatch operator-reuse
  precedent (`write_topn_hosts_per_window`).

State is bounded BY CONSTRUCTION, not by watermark: the key space is at
most 4 * 2^15 = 131,072 buckets, each holding a ring of at most
`ring_size` 8-byte signatures — <= 268 MB at ring_size=256 across the
whole cluster, forever, regardless of stream length. (The ring is also the
honesty bound: a duplicate of a page more than ring_size bucket-insertions
ago is missed; size the ring to the dedup horizon.) No event-time timeout
is needed, so the operator works on streams with or without a watermark.

Determinism: within a micro-batch each bucket processes its rows in
(warc_ts, url) order, so replays from checkpoint reproduce identical
verdicts (the kill/restart test); across batches the verdict depends on
arrival order, exactly like any online keep-first dedup.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import SIMHASH_BITS, simhash_sql_expr

BAND_BITS = 15
N_BANDS = SIMHASH_BITS // BAND_BITS  # 4

NEARDUP_STATE_SCHEMA = "sigs ARRAY<LONG>, pos LONG"

NEARDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("simhash", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("matched", T.BooleanType()),
    ]
)


def with_simhash_bands(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, warc_ts, simhash, band, band_val): one row per band per page,
    signature and band split entirely JVM-side (one inline pass; NULL text
    drops the page, matching the batch simhash semantics)."""
    sig = pages.where(F.col(text_col).isNotNull()).withColumn(
        "simhash", F.expr(simhash_sql_expr(text_col))
    )
    bands = F.expr(
        f"inline(transform(sequence(0, {N_BANDS - 1}), b -> "
        f"struct(cast(b as int) as band, "
        f"shiftright(simhash, b * {BAND_BITS}) & {2 ** BAND_BITS - 1} as band_val)))"
    )
    return sig.select("url", "warc_ts", "simhash", bands)


def make_neardup_update(max_hamming: int = 3, ring_size: int = 256):
    cols = [f.name for f in NEARDUP_OUTPUT_SCHEMA.fields]

    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        band = int(key[0])
        if state.hasTimedOut:  # no timeout configured; defensive
            state.remove()
            return
        sigs, pos = (list(state.get[0]), int(state.get[1])) if state.exists else ([], 0)
        rows: list[dict] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic intra-batch order: replay from checkpoint must
        # reproduce the same keep-first verdicts
        batch = batch.sort_values(["warc_ts", "url"], kind="mergesort")
        for url, ts, sig in zip(batch["url"], batch["warc_ts"], batch["simhash"]):
            s = int(sig)
            matched = any((s ^ int(p)).bit_count() <= max_hamming for p in sigs)
            rows.append(
                dict(url=url, warc_ts=ts, simhash=s, band=band, matched=matched)
            )
            if len(sigs) < ring_size:
                sigs.append(s)
            else:
                sigs[pos % ring_size] = s
            pos += 1
        state.update((sigs, pos))
        yield pd.DataFrame(rows, columns=cols)

    return update


def near_dup_band_events_stream(
    pages: DataFrame,
    max_hamming: int = 3,
    ring_size: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Per-band match events for a page stream (url, warc_ts, text).
    Feed through :func:`finalize_near_dup` (inside foreachBatch) for the
    per-page verdict. This is the ONLINE path; batch callers should use
    operators/dedup.py's corpus-wide banded joins instead."""
    bands = with_simhash_bands(pages, text_col)
    return bands.groupBy("band", "band_val").applyInPandasWithState(
        make_neardup_update(max_hamming=max_hamming, ring_size=ring_size),
        outputStructType=NEARDUP_OUTPUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_near_dup(band_events: DataFrame) -> DataFrame:
    """Per-page verdict from band match events: a page is a near-duplicate
    iff ANY band matched. Valid per micro-batch (all of a page's band rows
    are emitted in the page's own batch); use inside foreachBatch on the
    stream, or directly on a collected batch DataFrame."""
    return band_events.groupBy("url", "warc_ts", "simhash").agg(
        F.max("matched").alias("is_near_dup"),
        F.count(F.lit(1)).cast("long").alias("n_bands"),
    )
