"""Crawl politeness scheduler: per-host fetch-slot assignment.

A crawler must not hit one host faster than that host's crawl delay while
keeping every other host's queue moving. Assigning each page a per-host
SLOT (0, 1, 2, ... in arrival order) and a fetch offset slot * delay(host)
turns politeness into pure data: the fetch frontier at time t is simply
`WHERE fetch_offset_s <= t`, and slots never collide per host by
construction.

- Batch face (`fetch_schedule`): slot = row_number per host over a total
  order — one hash-partitioned window keyed by host, which is exactly the
  per-host-parallel shape a 10^12-page frontier needs (no global sort, no
  driver loop). Oracle-gated (docs_fetch_schedule): delays are integer
  md5-bucket functions of the host, so the whole schedule is cross-engine
  exact.
- Streaming face (`fetch_schedule_stream`): the same assignment as pages
  ARRIVE — applyInPandasWithState holding one LONG per host (the next
  free slot), the canonical bounded-state streaming counter. Slots are
  handed out in (micro-batch, url) order; a checkpoint resume continues
  from the persisted counter instead of double-booking slots
  (tests/test_streaming.py pins stream == replayed-batch equality).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# delay_s = 1 + (16-bit md5 bucket of the host) % 5 — a deterministic
# stand-in for a robots.txt crawl-delay lookup, replayable in any engine
DELAY_SQL = "1 + (cast(conv(substr(md5({h}), 1, 4), 16, 10) as bigint) % 5)"


def fetch_schedule(
    df: DataFrame, host_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """(id, host, slot, delay_s, fetch_offset_s) — batch politeness
    schedule over the (host, id) order."""
    w = Window.partitionBy(host_col).orderBy(id_col)
    return df.select(
        id_col,
        F.col(host_col).alias("host"),
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
        F.expr(DELAY_SQL.format(h=host_col)).alias("delay_s"),
    ).withColumn("fetch_offset_s", F.col("slot") * F.col("delay_s"))


def fetch_schedule_oracle_sql() -> str:
    # DuckDB: same md5 bucket via '0x' cast; conv() is Spark-only
    delay_duck = "1 + (('0x' || substr(md5(source), 1, 4))::BIGINT % 5)"
    return f"""
SELECT doc_id, source AS host,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT AS slot,
       ({delay_duck})::BIGINT AS delay_s,
       ((row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
         * ({delay_duck}))::BIGINT AS fetch_offset_s
FROM documents
"""


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("slot", T.LongType()),
        T.StructField("delay_s", T.LongType()),
        T.StructField("fetch_offset_s", T.LongType()),
    ]
)


def _delay_of(host: str) -> int:
    import hashlib

    return 1 + int(hashlib.md5(host.encode()).hexdigest()[:4], 16) % 5


def _assign_slots(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (host,) = key
    # With timeoutConf=NoTimeout every invocation carries data, but a state
    # timeout (timed-out keys get an EMPTY chunk iterator) would make
    # pd.concat([]) raise — guard so the invariant is local, not implicit
    # (ADVICE r4). State is only advanced when rows actually arrive.
    chunks = list(pdfs)
    if not chunks:
        return
    next_slot = state.get[0] if state.exists else 0
    delay = _delay_of(host)
    # concatenate BEFORE sorting: a large group arrives as several Arrow
    # chunks, and sorting each chunk independently would interleave the
    # per-batch url order
    pdf = pd.concat(chunks).sort_values("url").reset_index(drop=True)
    n = len(pdf)
    slots = list(range(next_slot, next_slot + n))
    next_slot += n
    state.update((next_slot,))
    yield pd.DataFrame(
        {
            "url": pdf["url"],
            "host": host,
            "slot": pd.Series(slots, dtype="int64"),
            "delay_s": pd.Series([delay] * n, dtype="int64"),
            "fetch_offset_s": pd.Series(
                [s * delay for s in slots], dtype="int64"
            ),
        }
    )


def fetch_schedule_stream(pages: DataFrame) -> DataFrame:
    """Streaming slot assignment for an arriving page stream with a `host`
    column: one LONG of state per host, slots handed out in (micro-batch,
    url) order, exactly-once under checkpoint resume (the counter lives in
    the state store, so a replayed batch re-emits the SAME slots)."""
    return pages.groupBy("host").applyInPandasWithState(
        _assign_slots,
        outputStructType=_OUT_SCHEMA,
        stateStructType="next_slot LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
