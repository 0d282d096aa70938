"""Generalized CEP operator (operators/sequence.py): funnel semantics,
contiguous-pattern lag columns, and the one-Exchange/zero-Join plan shape."""

from datetime import datetime, timedelta

import pyspark.sql.functions as F

from fasta_windows_spark import contract
from fasta_windows_spark.operators import sequence as seq
from fasta_windows_spark.plans import checks
from tests.conftest import SF_DIR

T0 = datetime(2024, 1, 1)


def _h(hours):
    return T0 + timedelta(hours=hours)


def _events_df(spark, rows):
    return spark.createDataFrame(rows, "user string, ts timestamp, et string")


STEPS = lambda: [  # noqa: E731 — fresh Columns per test
    ("view", F.col("et") == "view"),
    ("click", F.col("et") == "click"),
    ("purchase", F.col("et") == "purchase"),
]


def _funnel(spark, rows, within="24 hours"):
    df = _events_df(spark, rows)
    out = seq.funnel_first_chain(df, "user", "ts", STEPS(), within=within)
    return {
        r["user"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in out.collect()
    }


def test_funnel_basic_conversion_and_dropoffs(spark):
    rows = [
        # A converts inside the window, with interleaving noise events
        ("A", _h(0), "view"), ("A", _h(0.5), "error"),
        ("A", _h(1), "click"), ("A", _h(2), "purchase"),
        # B never clicks: purchase cannot count without the middle step
        ("B", _h(0), "view"), ("B", _h(1), "purchase"),
        # C purchases after the 24h deadline
        ("C", _h(0), "view"), ("C", _h(1), "click"), ("C", _h(25), "purchase"),
        # steps must be strictly increasing in time: click at the same
        # instant as the view does not follow it
        ("E", _h(0), "view"), ("E", _h(0), "click"), ("E", _h(1), "purchase"),
    ]
    got = _funnel(spark, rows)
    assert got == {"A": (_h(0), _h(1), _h(2))}


def test_funnel_entry_is_first_touch(spark):
    # D's FIRST view is the funnel entry; its chain times out even though
    # a later view would have converted — first-touch semantics, documented
    rows = [
        ("D", _h(0), "view"), ("D", _h(5), "view"),
        ("D", _h(30), "click"), ("D", _h(31), "purchase"),
    ]
    assert _funnel(spark, rows) == {}
    # unbounded: the chain completes from the first view
    assert _funnel(spark, rows, within=None) == {"D": (_h(0), _h(30), _h(31))}


def test_funnel_greedy_earliest_step_is_optimal(spark):
    # two clicks; only a purchase BETWEEN them exists. Earliest-click
    # matching converts; latest-click would not.
    rows = [
        ("F", _h(0), "view"), ("F", _h(1), "click"),
        ("F", _h(5), "purchase"), ("F", _h(10), "click"),
    ]
    assert _funnel(spark, rows) == {"F": (_h(0), _h(1), _h(5))}


def test_funnel_is_single_exchange_no_join(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = seq.funnel_first_chain(
        ev, "user_id", "ts",
        [("view", F.col("event_type") == "view"),
         ("click", F.col("event_type") == "click"),
         ("purchase", F.col("event_type") == "purchase")],
        within="24 hours",
    )
    p = checks.plan_string(out, "simple")
    assert "Join" not in p, p
    assert p.count("Exchange") == 1, p


def test_funnel_contract_query_nonempty(spark):
    # the oracle differential runs in test_contract.py; pin non-emptiness
    # here so the funnel predicate stays discriminating on the test corpus
    df = contract.queries()["events_funnel_conversion"](spark, SF_DIR)
    n = df.count()
    assert n > 0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert n < ev.select("user_id").distinct().count()


def test_lag_pattern_cols_contiguous_runs(spark):
    rows = [
        ("k", _h(i), et)
        for i, et in enumerate(["a", "b", "b", "c", "b", "b", "b"])
    ]
    df = _events_df(spark, rows)
    out = seq.lag_pattern_cols(
        df, "user", ["ts"],
        [F.col("et") == "b", F.col("et") == "b"],
    )
    ends = sorted(
        r["ts"] for r in out.where(F.col("__m1")).collect()
    )
    # b-b pairs on consecutive rows end at hours 2, 5, 6
    assert ends == [_h(2), _h(5), _h(6)]
    # single window sort, no joins
    p = checks.plan_string(out, "simple")
    assert "Join" not in p, p
    assert p.count("Exchange") == 1, p


def test_lag_pattern_matches_burst_query_on_corpus(spark):
    """The generalized matcher reproduces the hand-rolled triple-lag burst
    detector from events_error_burst_then_purchase on real data."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    err = F.col("event_type") == "error"
    out = seq.lag_pattern_cols(ev, "user_id", ["ts", "event_id"], [err, err, err])
    got = {
        (r["user_id"], r["ts"])
        for r in out.where(F.col("__m2")).select("user_id", "ts").collect()
    }
    from pyspark.sql import Window as PW

    w = PW.partitionBy("user_id").orderBy("ts", "event_id")
    ref = ev.select(
        "user_id", "ts", "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(err & (F.col("p1") == "error") & (F.col("p2") == "error"))
    want = {(r["user_id"], r["ts"]) for r in ref.select("user_id", "ts").collect()}
    assert got == want and got


def test_absence_is_single_exchange_no_join(spark):
    """The NOT-EXISTS oracle is a self-anti-join; the operator must be one
    hash Exchange + a range-framed window, no Join node at all."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = seq.absence_within(
        ev, "user_id", "ts",
        first_pred=F.col("event_type") == "click",
        absent_pred=F.col("event_type") == "purchase",
        within="1 hour",
    )
    p = checks.plan_string(out, "simple")
    assert "Join" not in p, p
    assert p.count("Exchange") == 1, p


def test_absence_same_timestamp_does_not_cancel(spark):
    """A purchase at EXACTLY the click's timestamp must not cancel it
    (the batch frame is (t, t+T] strictly after t), while one inside the
    window must, and one just past t+T must not."""
    rows = [
        (1, 1, "click", "2024-01-01 10:00:00"),
        (1, 2, "purchase", "2024-01-01 10:00:00"),   # same ts: no cancel
        (2, 3, "click", "2024-01-01 10:00:00"),
        (2, 4, "purchase", "2024-01-01 10:30:00"),   # inside: cancels
        (3, 5, "click", "2024-01-01 10:00:00"),
        (3, 6, "purchase", "2024-01-01 11:00:00"),   # == t+T: cancels
        (4, 7, "click", "2024-01-01 10:00:00"),
        (4, 8, "purchase", "2024-01-01 11:00:00.000001"),  # past: no cancel
    ]
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, event_type STRING, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = seq.absence_within(
        ev, "user_id", "ts",
        first_pred=F.col("event_type") == "click",
        absent_pred=F.col("event_type") == "purchase",
        within="1 hour",
    )
    got = sorted(r["user_id"] for r in out.collect())
    assert got == [1, 4], got


def test_absence_property_random_event_sets(spark):
    """Property: for ANY per-user event set, absence_within equals the
    brute-force NOT EXISTS definition (strict (t, t+T] window)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),          # user
            st.integers(min_value=0, max_value=7200),       # second offset
            st.sampled_from(["click", "purchase", "view"]),
        ),
        min_size=1,
        max_size=40,
    )

    @given(events)
    @settings(max_examples=8, deadline=None)
    def check(rows):
        data = [
            (u, i, et, datetime(2024, 1, 1) + timedelta(seconds=s))
            for i, (u, s, et) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "user_id LONG, event_id LONG, event_type STRING, ts TIMESTAMP"
        )
        out = seq.absence_within(
            df, "user_id", "ts",
            first_pred=F.col("event_type") == "click",
            absent_pred=F.col("event_type") == "purchase",
            within="1 hour",
        )
        got = {(r["user_id"], r["ts_us"]) for r in out.collect()}
        t_us = {i: int(d[3].timestamp() * 1_000_000) for i, d in enumerate(data)}
        want = set()
        for i, (u, s, et) in enumerate(rows):
            if et != "click":
                continue
            c = t_us[i]
            cancelled = any(
                u2 == u and et2 == "purchase"
                and c < t_us[j] <= c + 3_600_000_000
                for j, (u2, s2, et2) in enumerate(rows)
            )
            if not cancelled:
                want.add((u, c))
        assert got == want

    check()

def test_scd2_is_single_exchange_no_join(spark):
    """Both stacked windows (lag change-flag + running-sum run numbering),
    the interval collapse, and the lead() closing pass all reuse the one
    user_id hash partitioning: ONE Exchange, zero joins, at any event
    count."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = seq.scd2_intervals(ev)
    p = checks.plan_string(out, "simple")
    assert "Join" not in p, p
    assert p.count("Exchange") == 1, p


def test_scd2_intervals_tile_the_timeline(spark):
    """Per user: intervals are disjoint, contiguous (to == next from),
    versions run 1..n, exactly the last interval is open, states actually
    CHANGE at every boundary, and n_events sums to the user's events."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = seq.scd2_intervals(ev).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    counts = {
        r.user_id: r.n for r in ev.groupBy("user_id").agg(
            F.count("*").alias("n")).collect()
    }
    assert set(per_user) == set(counts)
    for uid, ivs in per_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r.n_events for r in ivs) == counts[uid]
        assert ivs[-1].effective_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.effective_to == b.effective_from
            assert a.state != b.state
