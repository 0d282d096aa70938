"""Generalized event-sequence (CEP) matching over a keyed event table.

The north rule asks for a structured-streaming / CEP *engine*, not a
single hardwired pattern. This module is the batch half of that surface
(the streaming half — watermark-ordered buffered state — lives in
``streaming/cep.py``): an operator family that matches an ordered list of
step predicates per key, expressed entirely in declarative DataFrame ops
so Catalyst keeps one Exchange for the whole match.

Two MATCH_RECOGNIZE-style semantics are covered:

- ``funnel_first_chain``: "p1 eventually followed by p2 ... within T of
  entry" (arbitrary events may interleave) — first-touch funnel
  semantics: the funnel entry is each key's EARLIEST p1 event; each later
  step greedily takes the earliest qualifying event after the previous
  step and no later than ``entry + within``. Greedy-earliest is optimal
  for every step after entry (an earlier t_i only enlarges the candidate
  set for t_{i+1}), so for a fixed entry this finds a completion whenever
  one exists; entry itself is first-touch by definition (the analytics
  convention — Amplitude/GA funnels — and the AFTER MATCH SKIP TO NEXT
  ROW analog collapsed to one match per key).
- contiguous runs ("p repeated k times with nothing between") are the
  lag-window form demonstrated by
  ``contract.events_error_burst_then_purchase``; ``lag_pattern_cols``
  below builds those lag columns for arbitrary step lists.

Scale shape: ``funnel_first_chain`` is S chained conditional window
minima over the SAME partitioning — one hash Exchange on the key, zero
joins, zero explode, regardless of step count (plan-pinned by
``tests/test_sequence.py::test_funnel_is_single_exchange_no_join``). At
10^12 events that is the minimum possible data movement for a per-key
pattern: each event crosses the wire once. Contrast the naive S-way
self-join (S shuffles of the full fact table and skew-amplified pair
blowups on hot keys).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def funnel_first_chain(
    events: DataFrame,
    key: str,
    ts: str,
    steps: Sequence[tuple[str, Column]],
    within: str | None = None,
) -> DataFrame:
    """One row per key that completes every step: (key, t_<step>... ).

    steps: ordered (name, predicate-Column) pairs; names become output
    timestamp columns ``t_<name>``.
    within: SQL interval literal (e.g. ``"24 hours"``) bounding every
    step's timestamp to ``entry + within``; None = unbounded.

    Ties inside one step resolve to the minimum timestamp (set semantics
    — no tiebreak column is needed because only min(ts) is consumed).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(key)
    df = events
    tcols: list[str] = []
    deadline = None
    for i, (name, pred) in enumerate(steps):
        tcol = f"t_{name}"
        cond = pred
        if i > 0:
            cond = cond & (F.col(ts) > F.col(tcols[-1]))
            if deadline is not None:
                cond = cond & (F.col(ts) <= deadline)
        # chained conditional minima: t_i is constant per key, so step
        # i+1's predicate may reference it — same window spec, so the
        # whole chain shares one Exchange (no per-step shuffle)
        df = df.withColumn(tcol, F.min(F.when(cond, F.col(ts))).over(w))
        if i == 0 and within is not None:
            deadline = F.col(tcol) + F.expr(f"INTERVAL {within}")
        tcols.append(tcol)
    completed = df.where(F.col(tcols[-1]).isNotNull())
    # every surviving row of a key carries identical t_* values; the
    # group-by collapses duplicates with a trivial first-value agg
    return completed.groupBy(key).agg(
        *[F.min(c).alias(c) for c in tcols]
    )


def absence_within(
    events: DataFrame,
    key: str,
    ts: str,
    first_pred: Column,
    absent_pred: Column,
    within: str = "1 hour",
) -> DataFrame:
    """Negation/absence CEP: every `first_pred` event with NO `absent_pred`
    event for the same key in the value interval (t, t + within] — the
    abandoned-cart / missed-heartbeat pattern class (the third
    MATCH_RECOGNIZE family next to eventual funnels and contiguous runs).

    Plan shape: ONE hash Exchange on the key and zero joins — the
    "no B after A" probe is a RANGE-framed window minimum over event-time
    micros (`rangeBetween(1, T)`), so a same-timestamp B correctly does
    NOT cancel (the frame is (t, t+T] in VALUE terms, immune to row-order
    ties) and the naive per-A anti-join of the full fact table never
    materializes. Returns (key, <ts>_us) rows, one per abandoned A.
    """
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    n, unit = within.split()
    t_win = int(n) * {
        "hours": 3_600, "hour": 3_600, "minutes": 60, "minute": 60,
        "seconds": 1, "second": 1,
    }[unit] * 1_000_000
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts_us"))
        .rangeBetween(1, t_win)
    )
    d = events.withColumn("_ts_us", t_us)
    d = d.withColumn(
        "_next_absent",
        F.min(F.when(absent_pred, F.col("_ts_us"))).over(w),
    )
    return d.where(first_pred & F.col("_next_absent").isNull()).select(
        key, F.col("_ts_us").alias(f"{ts}_us")
    )


def lag_pattern_cols(
    events: DataFrame,
    key: str,
    order: Sequence[str],
    steps: Sequence[Column],
    suffix: str = "__m",
) -> DataFrame:
    """Contiguous-pattern helper: adds boolean ``<suffix><i>`` columns that
    are true on rows where steps[0..i] matched on the i trailing
    CONSECUTIVE rows ending here (event-time order with explicit
    tiebreaks). A row where the last column is true is a full-pattern
    match END. One window sort, no joins — the generalization of the
    three-lag burst detector in ``contract.events_error_burst_then_purchase``.
    """
    w = Window.partitionBy(key).orderBy(*order)
    out = events
    prev = None
    for i, pred in enumerate(steps):
        # pattern of length i+1 ends here iff this row matches step i and
        # the previous row ended a length-i prefix match
        cur = pred if prev is None else pred & F.lag(prev, 1).over(w)
        col = f"{suffix}{i}"
        out = out.withColumn(col, F.coalesce(cur, F.lit(False)))
        prev = F.col(col)
    return out


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval materialization — the
    gaps-and-islands operator every CDC/lakehouse history table needs:
    collapse each key's ordered event stream into maximal runs of an
    unchanged state, emitting one validity interval per run
    (effective_from inclusive, effective_to = next run's start, NULL while
    current) plus the run's version number and event count.

    Classic two-window form: lag(state) flags change points, a running
    sum over the SAME ordering numbers the runs (both windows share one
    partitioning, so Catalyst plans ONE Exchange + one sort for both),
    then a groupBy(key, version) collapses runs and lead(effective_from)
    closes each interval. Per-key state is a sort — bounded by the key's
    own event count, never corpus-sized; at 10^12 events the single
    hash Exchange on the key is the minimum possible movement."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    changed = (
        F.lag(state_col, 1).over(w).isNull()
        | (F.lag(state_col, 1).over(w) != F.col(state_col))
    ).cast("long")
    runs = events.withColumn(
        "_version", F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    iv = runs.groupBy(key_col, "_version").agg(
        F.min(state_col).alias("state"),  # constant within a run
        F.min(ts_col).alias("effective_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("effective_from")
    return iv.select(
        key_col,
        F.col("_version").alias("version"),
        "state",
        "effective_from",
        F.lead("effective_from", 1).over(w2).alias("effective_to"),
        "n_events",
    )
