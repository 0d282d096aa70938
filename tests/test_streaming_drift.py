"""Streaming distribution-shift monitor (streaming/drift.py): the
stream==batch duality of window_drift, exact-integer TV values, and
checkpoint resume — the live face of the hash-gated contract query
docs_window_drift."""

import pytest

from fasta_windows_spark.sources import pages as P
from fasta_windows_spark.streaming import pipeline as S
from fasta_windows_spark.streaming.drift import (
    corpus_bucket_counts,
    window_drift,
)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drift_pages"))
    pdf = P.gen_pages(n_pages=500, n_hosts=8, seed=7)
    P.write_pages_parquet(pdf, d, n_files=5)
    return d


@pytest.fixture(scope="module")
def pages_pdf():
    return P.gen_pages(n_pages=500, n_hosts=8, seed=7)


@pytest.fixture(scope="module")
def ref_counts(spark, pages_pdf):
    # reference = the same corpus' own distribution (self-drift per window)
    return corpus_bucket_counts(
        P.spark_pages(spark, pages_pdf), n_buckets=64
    )


def _batch_windows(spark, pages_pdf, ref_counts):
    batch = P.spark_pages(spark, pages_pdf)
    out = window_drift(
        batch, ref_counts, ts_col="warc_ts", window="10 minutes"
    )
    return {
        r.window_start: (r.n_tokens, r.tv_fp) for r in out.collect()
    }


def test_drift_stream_matches_batch(spark, pages_dir, pages_pdf, ref_counts, tmp_path):
    stream = S.read_pages_stream(spark, pages_dir)
    agg = window_drift(
        stream,
        ref_counts,
        ts_col="warc_ts",
        window="10 minutes",
        watermark="10 minutes",
        streaming=True,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = S.write_exactly_once(agg, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert len(got) > 0
    expected = _batch_windows(spark, pages_pdf, ref_counts)
    # every window the stream emitted must match the batch face EXACTLY
    # (integer TV — no tolerance); the final unclosed windows are withheld
    # by the watermark and excluded by construction
    for r in got:
        assert expected[r.window_start] == (r.n_tokens, r.tv_fp)


def test_drift_checkpoint_resume(spark, pages_dir, ref_counts, tmp_path):
    out1, ck1 = str(tmp_path / "once"), str(tmp_path / "ck1")
    q = S.write_exactly_once(
        window_drift(
            S.read_pages_stream(spark, pages_dir),
            ref_counts,
            ts_col="warc_ts",
            window="10 minutes",
            watermark="10 minutes",
            streaming=True,
        ),
        out1,
        ck1,
    )
    q.awaitTermination(120)
    single = {
        (r.window_start, r.n_tokens, r.tv_fp)
        for r in spark.read.parquet(out1).collect()
    }

    out2, ck2 = str(tmp_path / "resumed"), str(tmp_path / "ck2")

    def run():
        return S.write_exactly_once(
            window_drift(
                S.read_pages_stream(
                    spark, pages_dir, max_files_per_trigger=2
                ),
                ref_counts,
                ts_col="warc_ts",
                window="10 minutes",
                watermark="10 minutes",
                streaming=True,
            ),
            out2,
            ck2,
            once=False,
        )

    q1 = run()
    # stop mid-stream after the first progress, then resume
    while not q1.recentProgress:
        q1.processAllAvailable()
    q1.stop()
    q2 = run()
    q2.processAllAvailable()
    q2.stop()
    resumed = {
        (r.window_start, r.n_tokens, r.tv_fp)
        for r in spark.read.parquet(out2).collect()
    }
    assert resumed == single


def test_drift_zero_against_self(spark, pages_pdf, ref_counts):
    # a "window" wide enough to hold the whole corpus drifts 0 from the
    # corpus-trained reference — TV(P, P) = 0 exactly
    batch = P.spark_pages(spark, pages_pdf)
    out = window_drift(
        batch, ref_counts, ts_col="warc_ts", window="5000 days"
    ).collect()
    assert len(out) == 1 and out[0].tv_fp == 0


def test_drift_rejects_empty_reference(spark, pages_pdf):
    batch = P.spark_pages(spark, pages_pdf)
    with pytest.raises(ValueError):
        window_drift(batch, [0] * 64, ts_col="warc_ts")


def test_drift_sliding_windows(spark, pages_pdf, ref_counts):
    # sliding 20m/10m: each page lands in exactly 2 windows; window counts
    # must equal the union of the two half-offset tumbling runs
    batch = P.spark_pages(spark, pages_pdf)
    slid = window_drift(
        batch, ref_counts, ts_col="warc_ts", window="20 minutes",
        slide="10 minutes",
    ).collect()
    assert len(slid) > 2
    starts = sorted(r.window_start for r in slid)
    # consecutive window starts step by the SLIDE, not the width
    import datetime

    steps = {
        (b - a).total_seconds() for a, b in zip(starts, starts[1:])
    }
    # starts advance on the 10m slide grid (a traffic gap may skip a
    # slide position — empty windows are not emitted — so steps are
    # slide-multiples, with the plain slide step present)
    assert 600.0 in steps and all(s % 600.0 == 0 for s in steps)
    # every sliding window's tokens == sum of the two 10m tumbling halves
    tumb = {
        r.window_start: r.n_tokens
        for r in window_drift(
            batch, ref_counts, ts_col="warc_ts", window="10 minutes"
        ).collect()
    }
    for r in slid:
        halves = [
            tumb.get(r.window_start, 0),
            tumb.get(
                r.window_start + datetime.timedelta(minutes=10), 0
            ),
        ]
        assert r.n_tokens == sum(halves)


def test_drift_sliding_stream_matches_batch(spark, pages_dir, pages_pdf, ref_counts, tmp_path):
    stream = S.read_pages_stream(spark, pages_dir)
    agg = window_drift(
        stream, ref_counts, ts_col="warc_ts", window="20 minutes",
        slide="10 minutes", watermark="10 minutes", streaming=True,
    )
    out, ckpt = str(tmp_path / "out_s"), str(tmp_path / "ck_s")
    q = S.write_exactly_once(agg, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert len(got) > 0
    batch = window_drift(
        P.spark_pages(spark, pages_pdf), ref_counts, ts_col="warc_ts",
        window="20 minutes", slide="10 minutes",
    )
    expected = {
        r.window_start: (r.n_tokens, r.tv_fp) for r in batch.collect()
    }
    for r in got:
        assert expected[r.window_start] == (r.n_tokens, r.tv_fp)
