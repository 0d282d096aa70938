"""Sequence packing / distributed prefix sum (operators/packing.py)."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from fasta_windows_spark import contract
from fasta_windows_spark.operators import packing as P

SF_DIR = "/root/testdata/sf0.01"


def test_running_offset_equals_global_window(spark):
    """The segmented scan must equal the naive global-order window exactly
    (same values, every row), including across group boundaries."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        "doc_id", P.token_count_expr("text").alias("n_tok")
    ).where(F.col("n_tok") > 0)
    # group_size far below the doc count so MANY group boundaries are hit
    got = P.running_offset(
        toks, "doc_id", "n_tok", out_col="off", group_size=97
    )
    naive = toks.withColumn(
        "off_naive",
        F.coalesce(
            F.sum("n_tok").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).cast("long"),
    )
    joined = got.join(naive.select("doc_id", "off_naive"), "doc_id")
    n = joined.count()
    assert n == toks.count() > 100
    assert joined.where(F.col("off") != F.col("off_naive")).count() == 0


def test_pack_sequences_plan_shape(spark):
    """The packing plan must NOT move the corpus through one partition:
    the only SinglePartition exchange is the #groups-row offsets window,
    the data crosses exactly one hash exchange (window clustering on the
    group key; the second hash exchange carries map-side-combined group
    totals), offsets come back via broadcast join, and no range-sampled
    partitioning exists (replay-stable plan)."""
    df = contract.queries()["docs_pack_sequences"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "rangepartitioning" not in plan
    assert plan.count("BroadcastHashJoin") == 1


def test_pack_sequences_block_invariants(spark):
    """Tape invariants over real data: offsets are the cumsum of n_tok in
    doc_id order (first row at 0, each next = prev_off + prev_tok), block
    ranges follow from offset arithmetic, and block usage is gapless from
    block 0 through the last block."""
    out = (
        contract.queries()["docs_pack_sequences"](spark, SF_DIR)
        .orderBy("doc_id")
        .toPandas()
    )
    assert out["tok_offset"].iloc[0] == 0
    expect_off = (out["tok_offset"] + out["n_tok"]).shift(1, fill_value=0)
    assert (out["tok_offset"] == expect_off).all()
    assert (out["first_block"] == out["tok_offset"] // 2048).all()
    assert (
        out["last_block"] == (out["tok_offset"] + out["n_tok"] - 1) // 2048
    ).all()
    assert (out["n_blocks"] >= 1).all()
    total = int(out["n_tok"].sum())
    assert int(out["last_block"].max()) == (total - 1) // 2048
    # every block is touched by some doc (the tape has no holes)
    covered = set()
    for f, l in zip(out["first_block"], out["last_block"]):
        covered.update(range(f, l + 1))
    assert covered == set(range((total - 1) // 2048 + 1))


def test_pack_segments_blocks_are_exactly_full(spark):
    """Every training block must carry exactly seq_len tokens (the final
    partial block excepted), each doc's segments must tile the doc
    (sum n_block_toks == n_tok, starts contiguous), and segment rows must
    agree with the placement table's block ranges."""
    from fasta_windows_spark.operators.packing import pack_segments

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seg = pack_segments(docs, seq_len=2048).toPandas()
    placed = (
        contract.queries()["docs_pack_sequences"](spark, SF_DIR).toPandas()
    )
    total = int(placed["n_tok"].sum())
    per_block = seg.groupby("block_id")["n_block_toks"].sum()
    last_block = (total - 1) // 2048
    assert set(per_block.index) == set(range(last_block + 1))
    full = per_block[per_block.index != last_block]
    assert (full == 2048).all()
    assert per_block[last_block] == total - last_block * 2048
    per_doc = seg.groupby("doc_id")["n_block_toks"].sum()
    ref = placed.set_index("doc_id")["n_tok"]
    assert per_doc.sort_index().equals(ref.sort_index())
    n_seg_blocks = seg.groupby("doc_id")["block_id"].agg(["min", "max", "count"])
    pp = placed.set_index("doc_id")
    assert (n_seg_blocks["min"] == pp["first_block"]).all()
    assert (n_seg_blocks["max"] == pp["last_block"]).all()
    assert (n_seg_blocks["count"] == pp["n_blocks"]).all()


def test_running_offset_property_arbitrary_keys(spark):
    """Property: for ANY set of unique integer order keys (sparse,
    negative — truncation toward zero is monotone, so grouping stays
    order-aligned) and positive values, running_offset equals the
    exclusive cumsum in key order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pairs = st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda p: p[0],
    )

    @given(pairs)
    @settings(max_examples=8, deadline=None)
    def check(rows):
        df = spark.createDataFrame(rows, "k LONG, v LONG")
        got = {
            r["k"]: r["off"]
            for r in P.running_offset(
                df, "k", "v", out_col="off", group_size=7
            ).collect()
        }
        acc = 0
        for k, v in sorted(rows):
            assert got[k] == acc
            acc += v

    check()


def test_span_corruption_nonoverlap_and_lockstep(spark):
    """Spans never overlap, sit inside the doc, are one-per-block, and
    match a python replay of the md5 offset arithmetic."""
    import hashlib

    from fasta_windows_spark.operators.packing import span_corruption_plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    rows = span_corruption_plan(docs).collect()
    assert rows
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, spans in by_doc.items():
        toks = [t for t in texts[doc_id].lower().split(" ") if t]
        prev_end = -1
        for s in sorted(spans, key=lambda x: x.span_start):
            assert s.span_start > prev_end, "overlapping spans"
            assert s.span_start + 3 <= len(toks)
            assert s.span_start // 10 == s.span_id, "one span per block"
            off = (
                int(hashlib.md5(f"{doc_id}:{s.span_id}".encode()).hexdigest()[:8], 16)
                % 8
            )
            assert s.span_start == s.span_id * 10 + off
            assert s.span_text == " ".join(toks[s.span_start : s.span_start + 3])
            prev_end = s.span_start + 2


def test_span_corruption_rejects_bad_params(spark):
    import pytest as _pytest

    from fasta_windows_spark.operators.packing import span_corruption_plan

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        span_corruption_plan(docs, block=2, span_len=3)
