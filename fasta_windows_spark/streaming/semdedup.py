"""Streaming SemDeDup: online semantic near-dup suppression over keyed
cell state — the stream twin of `operators/dedup.semdedup`.

An ingest pipeline wants the SemDeDup verdict AT CRAWL TIME ("is this
page semantically redundant against everything already ingested?")
without re-running the corpus-wide in-cell pair scan per micro-batch.
This module assigns each incoming embedding to its trained k-means cell
with pure JVM expressions (quantize + packed-argmin over centroid plan
literals — `cluster._assign`, streaming-safe because it is stateless
column arithmetic), then keys `applyInPandasWithState` by `cell`:

- state per cell = every quantized vector seen so far in that cell
  (vec_ids + fvs). That is deliberately the FULL cell content, not a
  ring: batch SemDeDup's keep-first rule compares against every earlier
  vector whether or not that vector was itself kept, so dropping state
  rows would diverge from the batch operator. The memory bound therefore
  comes from SemDeDup's own design, not a ring: k grows with the corpus
  (n/k held at ~cell_size), so per-cell state is bounded and the total
  state is one quantized copy of the corpus embeddings — the same
  footprint any online ANN index carries (512 B/vector at d=64);
- a new vector is `kept=0` iff some EARLIER vector (all prior state plus
  earlier-id rows of the same micro-batch) passes the integer cosine
  test 'dot > 0 AND tau_den^2*dot^2 >= tau_num^2*|a|^2*|b|^2'. Python
  arbitrary-precision ints evaluate it exactly — the same products the
  batch side computes in DECIMAL(38,0) and the oracle in HUGEINT;
- determinism: within a micro-batch each cell processes rows in vec_id
  order, so replay from checkpoint reproduces identical verdicts, and a
  stream fed in vec_id order reproduces the batch operator EXACTLY
  (pinned by `test_semdedup_stream_matches_batch`).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators import cluster as C

SEMDEDUP_STATE_SCHEMA = "vids ARRAY<LONG>, fvs ARRAY<ARRAY<LONG>>"

SEMDEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("kept", T.IntegerType()),
    ]
)


def assign_cells_stream(
    emb: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, fv) for a streaming embedding frame: stateless JVM
    quantize + exact-integer argmin against the pretrained centroids
    (plan literals, zero join) — identical arithmetic to the batch path."""
    q = C.quantize(emb, id_col, vec_col)
    return C._assign(q, centroids, id_col, keep_fv=True).select(
        id_col, "cell", "fv"
    )


def make_semdedup_update(tau_num: int = 2, tau_den: int = 5):
    num2, den2 = tau_num * tau_num, tau_den * tau_den
    cols = [f.name for f in SEMDEDUP_OUTPUT_SCHEMA.fields]

    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cell = int(key[0])
        if state.hasTimedOut:  # no timeout configured; defensive
            state.remove()
            return
        chunks = list(pdfs)
        if not chunks:  # the scheduler.py empty-iterator fence
            return
        if state.exists:
            vids = list(state.get[0])
            # python ints, NOT numpy int64: the cosine products reach
            # ~1e29, far past int64 — arbitrary precision keeps the test
            # exactly the DECIMAL(38,0)/HUGEINT comparison
            fvs = [[int(x) for x in fv] for fv in state.get[1]]
        else:
            vids, fvs = [], []
        n2s = [sum(x * x for x in fv) for fv in fvs]
        batch = pd.concat(chunks, ignore_index=True)
        # deterministic intra-batch order: replay from checkpoint must
        # reproduce the same keep-first verdicts
        batch = batch.sort_values("vec_id", kind="mergesort")
        rows: list[dict] = []
        for vid, fv in zip(batch["vec_id"], batch["fv"]):
            f = [int(x) for x in fv]
            n2 = sum(x * x for x in f)
            removed = any(
                (d := sum(p * q for p, q in zip(f, g))) > 0
                and den2 * d * d >= num2 * n2 * g2
                for g, g2 in zip(fvs, n2s)
            )
            rows.append(
                dict(vec_id=int(vid), cell=cell, kept=0 if removed else 1)
            )
            vids.append(int(vid))
            fvs.append(f)
            n2s.append(n2)
        state.update((vids, fvs))
        yield pd.DataFrame(rows, columns=cols)

    return update


def semdedup_stream(
    emb: DataFrame,
    centroids: list[list[int]],
    tau_num: int = 2,
    tau_den: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Online SemDeDup verdicts (vec_id, cell, kept) for an embedding
    stream under a pretrained quantizer. This is the INGEST path; batch
    callers should use `operators/dedup.semdedup`'s in-cell join instead."""
    assigned = assign_cells_stream(emb, centroids, id_col, vec_col)
    return assigned.groupBy("cell").applyInPandasWithState(
        make_semdedup_update(tau_num=tau_num, tau_den=tau_den),
        outputStructType=SEMDEDUP_OUTPUT_SCHEMA,
        stateStructType=SEMDEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
