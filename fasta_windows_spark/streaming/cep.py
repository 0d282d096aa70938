"""Streaming CEP: incremental `error{k} -> purchase within horizon` pattern
detection per user (the north_rule's CEP axis, streaming form of the batch
`events_error_burst_then_purchase` contract query).

Why not window functions: the pattern needs per-user EVENT-TIME ORDER, and
a stream delivers events in arrival order. The operator therefore buffers
events in state and only advances the pattern over the watermark-FINALIZED
prefix (ts <= current watermark), sorted by (ts, event_id) — by watermark
contract no earlier event can still arrive, so the processed prefix is
exactly the batch engine's sort order and emission is deterministic under
micro-batch replay (exactly-once safe).

State per user (RocksDB row): the unfinalized event buffer + the
consecutive-error run length at the processed frontier + open bursts
awaiting their first purchase. The buffer holds at most one
watermark-delay of events and open bursts expire `horizon` past their
timestamp, so the growable components are watermark-bounded — state
cannot grow with stream length, the 10^12-row requirement. The one
permanent residue is the (run_len, max_ts) pair per user: consecutive-ness
has no time bound (two errors, a week of silence, then a third error IS a
run of three), so forgetting the run would diverge from the batch
semantics; two longs per user is the honest price.

Emission is BATCHING-INDEPENDENT: an event-time timer is armed at the
earliest pending work (the oldest unfinalized buffered event, or the
nearest burst deadline for state pruning), so matches surface as soon as
the watermark finalizes them even if the user never receives another
event — a single-batch run and a file-per-trigger run emit the identical
row set, which is what makes checkpoint kill/restart exactly-once.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "buf_ts ARRAY<LONG>, buf_eid ARRAY<LONG>, buf_is_err ARRAY<BOOLEAN>, "
    "buf_is_pur ARRAY<BOOLEAN>, run_len LONG, open_bursts ARRAY<LONG>, "
    "max_ts LONG"
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("burst_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)


def _advance(buf, run_len, open_bursts, wm_us, k, horizon_us, user_id, rows):
    """Advance the pattern over the finalized prefix of `buf` (ts <= wm_us,
    sorted by ts then event_id); returns (remaining_buf, run_len,
    open_bursts). Appends emitted (user, burst, purchase) matches to rows."""
    buf.sort()
    remaining = []
    for ts, eid, is_err, is_pur in buf:
        if ts > wm_us:
            remaining.append((ts, eid, is_err, is_pur))
            continue
        # bursts whose deadline precedes the CURRENT event can never match
        # a later-processed purchase (processing is ts-ordered) — pruning
        # against the watermark here instead would drop a burst before its
        # in-horizon purchase is reached when draining a long prefix
        open_bursts = [b for b in open_bursts if b + horizon_us >= ts]
        if is_err:
            run_len += 1
            if run_len >= k:
                open_bursts.append(ts)
        else:
            if is_pur:
                matched = [b for b in open_bursts if b < ts <= b + horizon_us]
                for b in matched:
                    rows.append(
                        {"user_id": user_id, "burst_us": b, "purchase_us": ts}
                    )
                open_bursts = [b for b in open_bursts if b not in matched]
            run_len = 0
    # state bound: a burst whose deadline the watermark has passed cannot
    # match any future finalized purchase
    open_bursts = [b for b in open_bursts if b + horizon_us >= wm_us]
    return remaining, run_len, open_bursts


def _next_fire_ms(buf, open_bursts, horizon_us, wm_ms):
    """Earliest event-time at which pending work becomes actionable: the
    oldest unfinalized buffered event (emission) or the nearest open-burst
    deadline (state pruning). None when neither exists. Clamped strictly
    past the current watermark (EventTimeTimeout requirement)."""
    candidates = []
    if buf:
        candidates.append(min(b[0] for b in buf) // 1000)
    if open_bursts:
        candidates.append((min(open_bursts) + horizon_us) // 1000)
    if not candidates:
        return None
    return max(min(candidates) + 1, wm_ms + 1)


def make_update(k: int, horizon_us: int):
    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows: list[dict] = []

        if state.exists:
            buf_ts, buf_eid, be, bp, run_len, open_bursts, max_ts = state.get
            buf = list(zip(buf_ts, buf_eid, be, bp))
            open_bursts = list(open_bursts)
        else:
            buf, run_len, open_bursts, max_ts = [], 0, [], 0

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (pdf["ts"].astype("int64") // 1_000).tolist()
                eids = pdf["event_id"].tolist()
                types = pdf["event_type"].tolist()
                for ts, eid, et in zip(ts_us, eids, types):
                    buf.append(
                        (int(ts), int(eid), et == "error", et == "purchase")
                    )
                    max_ts = max(max_ts, int(ts))

        buf, run_len, open_bursts = _advance(
            buf, run_len, open_bursts, wm_us, k, horizon_us, user_id, rows
        )
        fire = _next_fire_ms(buf, open_bursts, horizon_us, wm_ms)
        if fire is None and run_len == 0:
            state.remove()  # nothing pending and no run to continue
        else:
            state.update(
                (
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                    [b[3] for b in buf],
                    run_len,
                    open_bursts,
                    max_ts,
                )
            )
            if fire is not None:
                # wake when the watermark finalizes the oldest pending
                # item — emission never waits for the user's next event
                state.setTimeoutTimestamp(fire)
        yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return update


def burst_purchase_stream(
    events: DataFrame,
    k: int = 3,
    horizon: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """k consecutive errors then the first purchase within `horizon`,
    incrementally per user. Emits each (user, burst, first purchase) once,
    as soon as both sides are watermark-finalized."""
    n, unit = horizon.split()
    horizon_us = int(n) * {"hours": 3_600, "hour": 3_600, "minutes": 60,
                           "minute": 60, "seconds": 1, "second": 1}[unit] * 1_000_000
    # parquet-sourced ts may arrive as TIMESTAMP_NTZ, which watermarks
    # reject; the cast is an identity relabel under the UTC session TZ
    ev = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_update(k, horizon_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- eventual-funnel CEP: step_1 -> ... -> step_S within horizon -------------

FUNNEL_STATE_SCHEMA = (
    "buf_ts ARRAY<LONG>, buf_eid ARRAY<LONG>, buf_type ARRAY<STRING>, "
    "t_steps ARRAY<LONG>, closed LONG"
)


def funnel_output_schema(steps: tuple) -> T.StructType:
    """user_id + one `<step>_us` epoch-micros column per step (the batch
    operator's t_<step> columns in micros)."""
    return T.StructType(
        [T.StructField("user_id", T.LongType())]
        + [T.StructField(f"{s}_us", T.LongType()) for s in steps]
    )


def _funnel_advance(buf, t_steps, wm_us, steps, horizon_us, user_id, rows, cols):
    """Advance the first-touch chain over the finalized prefix (ts <=
    wm_us, processed in (ts, event_id) order — the batch engine's order).
    Returns (remaining_buf, t_steps, done). Chain semantics match
    operators/sequence.funnel_first_chain for any step count: entry is the
    earliest step-1 event, each later step greedily takes the earliest
    event strictly after the previous step and within `horizon_us` of
    entry."""
    buf.sort()
    remaining = []
    for ts, eid, et in buf:
        if ts > wm_us:
            remaining.append((ts, eid, et))
            continue
        i = len(t_steps)
        if et != steps[i]:
            continue
        if i > 0 and not (t_steps[-1] < ts <= t_steps[0] + horizon_us):
            continue
        t_steps.append(ts)
        if len(t_steps) == len(steps):
            rows.append(dict(zip(cols, [user_id, *t_steps])))
            return [], t_steps, True
    return remaining, t_steps, False


def make_funnel_update(steps: tuple, horizon_us: int):
    cols = [f.name for f in funnel_output_schema(steps).fields]

    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows: list[dict] = []

        if state.exists:
            buf_ts, buf_eid, buf_type, t_steps, closed = state.get
            buf = list(zip(buf_ts, buf_eid, buf_type))
            t_steps = list(t_steps)
        else:
            buf, t_steps, closed = [], [], 0

        if closed:
            # Terminal tombstone: this user's first-touch chain already
            # completed (emitted) or expired (can never complete). Batch
            # anchors at the key's GLOBAL earliest entry, so a later
            # entry event must NOT restart the funnel — drain input, emit
            # nothing, leave the tombstone in place (no timeout re-armed,
            # so it never fires again; per-invocation timeout reset clears
            # any previously armed timer).
            for _ in pdfs:
                pass
            yield pd.DataFrame([], columns=cols)
            return

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (pdf["ts"].astype("int64") // 1_000).tolist()
                for ts, eid, et in zip(
                    ts_us, pdf["event_id"].tolist(), pdf["event_type"].tolist()
                ):
                    buf.append((int(ts), int(eid), et))

        buf, t_steps, done = _funnel_advance(
            buf, t_steps, wm_us, steps, horizon_us, user_id, rows, cols
        )
        expired = bool(t_steps) and wm_us > t_steps[0] + horizon_us
        if not t_steps and not buf:
            # no entry and nothing unfinalized — fully evictable
            state.remove()
        elif done or expired:
            # First-touch entry never restarts: batch semantics anchor at
            # the key's earliest entry event, so once that chain completed
            # or its horizon lapsed the user is terminally closed. Collapse
            # to an O(1) tombstone (empty buffer+registers, closed=1) — the
            # buffered events can't advance a closed chain and future ones
            # arrive above the already-lapsed horizon. This is the
            # semantics' inherent state floor (one tiny row per entered
            # user), same class as the burst operator's permanent
            # (run_len, max_ts) pair.
            state.update(([], [], [], [], 1))
        else:
            state.update(
                (
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                    t_steps,
                    0,
                )
            )
            fires = []
            if buf:
                fires.append(min(b[0] for b in buf) // 1000)
            if t_steps and not expired:
                fires.append((t_steps[0] + horizon_us) // 1000)
            if fires:
                state.setTimeoutTimestamp(max(min(fires) + 1, wm_ms + 1))
        yield pd.DataFrame(rows, columns=cols)

    return update


# --- absence CEP: A with NO B within horizon (abandoned carts) ---------------

ABSENCE_STATE_SCHEMA = (
    "buf_ts ARRAY<LONG>, buf_eid ARRAY<LONG>, buf_type ARRAY<STRING>, "
    "pending ARRAY<LONG>"
)

ABSENCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)


def make_absence_update(first_type: str, absent_type: str, horizon_us: int):
    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows: list[dict] = []

        if state.exists:
            buf_ts, buf_eid, buf_type, pending = state.get
            buf = list(zip(buf_ts, buf_eid, buf_type))
            pending = list(pending)
        else:
            buf, pending = [], []

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (pdf["ts"].astype("int64") // 1_000).tolist()
                for ts, eid, et in zip(
                    ts_us, pdf["event_id"].tolist(), pdf["event_type"].tolist()
                ):
                    buf.append((int(ts), int(eid), et))

        # advance over the finalized prefix in (ts, event_id) order: an A
        # opens a pending register; a B cancels every pending A with
        # a < b <= a + horizon (same-timestamp B does not cancel — the
        # batch frame is (t, t+T] in value terms)
        buf.sort()
        remaining = []
        for ts, eid, et in buf:
            if ts > wm_us:
                remaining.append((ts, eid, et))
                continue
            if et == first_type:
                pending.append(ts)
            elif et == absent_type:
                pending = [a for a in pending if not (a < ts <= a + horizon_us)]
        buf = remaining
        # a pending A whose cancel window is fully finalized
        # (a + horizon <= wm) can no longer be canceled — emit, drop
        still = []
        for a in pending:
            if a + horizon_us <= wm_us:
                rows.append({"user_id": user_id, "ts_us": a})
            else:
                still.append(a)
        pending = still

        if not buf and not pending:
            # FULLY evictable: no tombstone needed — every register dies
            # at its own deadline (contrast the funnel's first-touch
            # memory), so state is bounded by watermark delay + horizon
            state.remove()
        else:
            state.update(
                (
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                    pending,
                )
            )
            fires = []
            if buf:
                fires.append(min(b[0] for b in buf) // 1000)
            if pending:
                fires.append((min(pending) + horizon_us) // 1000)
            wm_ms = wm_us // 1000
            state.setTimeoutTimestamp(max(min(fires) + 1, wm_ms + 1))
        yield pd.DataFrame(
            rows, columns=[f.name for f in ABSENCE_OUTPUT_SCHEMA.fields]
        )

    return update


def absence_stream(
    events: DataFrame,
    first_type: str = "click",
    absent_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming absence/negation CEP: emit each `first_type` event with
    NO `absent_type` event for the same user in (t, t + horizon] — the
    abandoned-cart / missed-heartbeat class, the third pattern family
    next to the burst (contiguous) and funnel (eventual) operators.
    Batch semantics are `operators/sequence.absence_within`, asserted
    equal by the stream==batch differential test. Emission is timer-
    driven: a register fires as soon as the watermark passes its
    deadline, even if the user never sends another event. ALL state is
    watermark-bounded — the unfinalized buffer by the delay, each
    pending register by its own t+horizon deadline (no permanent
    residue; absence has no first-touch memory to keep)."""
    n, unit = horizon.split()
    horizon_us = int(n) * {"hours": 3_600, "hour": 3_600, "minutes": 60,
                           "minute": 60, "seconds": 1, "second": 1}[unit] * 1_000_000
    ev = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_absence_update(first_type, absent_type, horizon_us),
            outputStructType=ABSENCE_OUTPUT_SCHEMA,
            stateStructType=ABSENCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def funnel_stream(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    horizon: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming first-touch funnel `step_1 -> ... -> step_S within
    horizon of entry` for ANY ordered list of event-type steps — the
    EVENTUAL pattern class (the burst operator covers the CONTIGUOUS
    class), incrementally per user with the same watermark-ordered
    buffered-state protocol as burst_purchase_stream. Emits each
    completing user's step timestamps exactly once, as soon as the final
    step is watermark-finalized; batch semantics are
    operators/sequence.funnel_first_chain, asserted equal by the
    stream==batch differential tests (3-step and 2-step shapes). The
    growable state is
    watermark-bounded: the unfinalized buffer by the delay, the chain
    registers by t_view+horizon. A completed-or-lapsed user collapses to
    a permanent O(1) tombstone — required because batch anchors at the
    GLOBAL earliest view, so a later view must not restart the funnel;
    one tiny row per entered user is the semantics' inherent floor (the
    burst operator's (run_len, max_ts) residue is the same class)."""
    n, unit = horizon.split()
    horizon_us = int(n) * {"hours": 3_600, "hour": 3_600, "minutes": 60,
                           "minute": 60, "seconds": 1, "second": 1}[unit] * 1_000_000
    ev = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_update(tuple(steps), horizon_us),
            outputStructType=funnel_output_schema(tuple(steps)),
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- SCD-2 state-history stream ----------------------------------------------
# Streaming twin of operators/sequence.py:scd2_intervals — maximal same-state
# runs per key, emitted incrementally as validity intervals.

SCD2_STATE_SCHEMA = (
    "buf_ts ARRAY<LONG>, buf_eid ARRAY<LONG>, buf_type ARRAY<STRING>, "
    "cur_state STRING, cur_from LONG, cur_version LONG, cur_n LONG"
)

SCD2_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("version", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("from_us", T.LongType()),
        T.StructField("to_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def make_scd2_update():
    cols = [f.name for f in SCD2_OUTPUT_SCHEMA.fields]

    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        rows: list[dict] = []

        if state.exists:
            buf_ts, buf_eid, buf_type, cur_state, cur_from, cur_version, cur_n = (
                state.get
            )
            buf = list(zip(buf_ts, buf_eid, buf_type))
        else:
            buf, cur_state, cur_from, cur_version, cur_n = [], None, 0, 0, 0

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (pdf["ts"].astype("int64") // 1_000).tolist()
                for ts, eid, et in zip(
                    ts_us, pdf["event_id"].tolist(), pdf["event_type"].tolist()
                ):
                    buf.append((int(ts), int(eid), et))

        # walk the watermark-finalized prefix in the batch engine's exact
        # (ts, event_id) order; an interval closes at the first finalized
        # event whose state differs — by watermark contract nothing can
        # land before it anymore, so emission is replay-deterministic
        buf.sort()
        fin = [b for b in buf if b[0] <= wm_us]
        buf = [b for b in buf if b[0] > wm_us]
        for ts, eid, et in fin:
            if cur_state is None:
                cur_state, cur_from, cur_version, cur_n = et, ts, 1, 1
            elif et == cur_state:
                cur_n += 1
            else:
                rows.append(
                    dict(
                        user_id=user_id,
                        version=cur_version,
                        state=cur_state,
                        from_us=cur_from,
                        to_us=ts,
                        n_events=cur_n,
                    )
                )
                cur_state, cur_from, cur_version, cur_n = et, ts, cur_version + 1, 1

        if buf or cur_state is not None:
            # the open interval is the operator's honest permanent state
            # floor (4 scalars per key — it can only be closed by a FUTURE
            # different-state event); the buffer is watermark-bounded
            state.update(
                (
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                    cur_state,
                    cur_from,
                    cur_version,
                    cur_n,
                )
            )
            if buf:
                # arm an event-time timer so buffered events finalize as
                # soon as the watermark passes them, even if this key
                # never receives another event (batching-independence)
                state.setTimeoutTimestamp(
                    max(min(b[0] for b in buf) // 1000 + 1, wm_ms + 1)
                )
        else:
            state.remove()
        yield pd.DataFrame(rows, columns=cols)

    return update


def scd2_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming SCD-2 history: each key's CLOSED validity intervals
    (version, state, from/to epoch-micros, run length), emitted exactly
    once as soon as the closing event is watermark-finalized. The open
    interval never emits (append mode cannot retract); it surfaces when a
    later state change closes it — identical rows to the batch operator's
    effective_to IS NOT NULL subset for finalized closers."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_scd2_update(),
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- trailing-window anomaly stream -------------------------------------------
# Streaming twin of contract.events_hourly_anomaly: per event_type, flag
# hourly counts >3 trailing sigma from the trailing-24h mean, emitted as
# each hour is watermark-finalized.

ANOM_STATE_SCHEMA = (
    "ring_hours ARRAY<LONG>, ring_cnts ARRAY<LONG>, "
    "open_hours ARRAY<LONG>, open_cnts ARRAY<LONG>"
)

ANOM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hour_num", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("n_trail", T.LongType()),
        T.StructField("sum_trail", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

_HOUR_US = 3_600 * 1_000_000


def make_anomaly_update(lookback: int = 24, min_trail: int = 12, z2: int = 9):
    cols = [f.name for f in ANOM_OUTPUT_SCHEMA.fields]

    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (etype,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows: list[dict] = []

        if state.exists:
            ring_h, ring_c, open_h, open_c = state.get
            ring = dict(zip(ring_h, ring_c))
            open_ = dict(zip(open_h, open_c))
        else:
            ring, open_ = {}, {}

        if not state.hasTimedOut:
            for pdf in pdfs:
                hours = (pdf["ts"].astype("int64") // 1_000 // _HOUR_US).tolist()
                for h in hours:
                    open_[int(h)] = open_.get(int(h), 0) + 1

        # an hour is complete once the watermark passes its end: no event
        # with ts inside it can still arrive. Finalize in hour order so the
        # trailing ring is exactly the batch window's content.
        for h in sorted(k for k in open_ if (k + 1) * _HOUR_US <= wm_us):
            cnt = open_.pop(h)
            trail = [(hh, cc) for hh, cc in ring.items() if h - lookback <= hh <= h - 1]
            n = len(trail)
            s = sum(c for _, c in trail)
            ss = sum(c * c for _, c in trail)
            dev = n * cnt - s
            rows.append(
                dict(
                    event_type=etype,
                    hour_num=h,
                    cnt=cnt,
                    n_trail=n,
                    sum_trail=s,
                    is_anomaly=bool(
                        n >= min_trail and dev * dev > z2 * (n * ss - s * s)
                    ),
                )
            )
            ring[h] = cnt
            ring = {hh: cc for hh, cc in ring.items() if hh >= h - (lookback - 1)}

        if ring or open_:
            # the ring (<= lookback pairs) is the operator's bounded
            # permanent state; open hours are watermark-bounded
            state.update(
                (
                    list(ring.keys()),
                    list(ring.values()),
                    list(open_.keys()),
                    list(open_.values()),
                )
            )
            if open_:
                fire_ms = (min(open_) + 1) * _HOUR_US // 1000
                state.setTimeoutTimestamp(max(fire_ms, wm_us // 1000 + 1))
        else:
            state.remove()
        yield pd.DataFrame(rows, columns=cols)

    return update


def hourly_anomaly_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming per-type hourly anomaly flags, batch-identical on
    finalized hours (same integer-exact z^2 test, same gap-aware trailing
    frame — the ring holds only hours that had events, exactly the batch
    RANGE window's row set). State per event_type: <=24 (hour, count)
    pairs plus the watermark-bounded open hours."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        ev.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            make_anomaly_update(),
            outputStructType=ANOM_OUTPUT_SCHEMA,
            stateStructType=ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
