"""JSONL pages source: batch and streaming reads match the parquet-sourced
pipeline on identical data."""

import pyspark.sql.functions as F

from fasta_windows_spark.sources import pages as P
from fasta_windows_spark.sources.jsonl import (
    read_pages_jsonl,
    read_pages_jsonl_stream,
    write_pages_jsonl,
)
from fasta_windows_spark.streaming import pipeline as S


def test_jsonl_batch_matches_parquet(spark, tmp_path):
    pdf = P.gen_pages(n_pages=60, n_hosts=5, min_len=30, max_len=90, seed=3)
    write_pages_jsonl(pdf, str(tmp_path / "jl"), n_files=3)
    got = read_pages_jsonl(spark, str(tmp_path / "jl"))
    assert [f.name for f in got.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    g = got.orderBy("url").toPandas()
    e = pdf.sort_values("url").reset_index(drop=True)
    assert list(g["url"]) == list(e["url"])
    assert list(g["text"]) == list(e["text"])
    assert list(g["warc_ts"]) == list(e["warc_ts"])


def test_jsonl_null_html_stays_null(spark, tmp_path):
    """A missing html payload must round-trip as NULL, matching the parquet
    pages schema — not be coalesced to empty bytes (ADVICE r2)."""
    pdf = P.gen_pages(n_pages=6, n_hosts=2, min_len=10, max_len=20, seed=9)
    pdf.loc[pdf.index[:3], "html"] = None
    write_pages_jsonl(pdf, str(tmp_path / "jl"), n_files=1)
    got = read_pages_jsonl(spark, str(tmp_path / "jl"))
    assert got.filter(F.col("html").isNull()).count() == 3
    assert got.filter(F.length("html") == 0).count() == 0


def test_jsonl_stream_window_agg_matches_batch(spark, tmp_path):
    pdf = P.gen_pages(n_pages=400, n_hosts=4, min_len=30, max_len=90, seed=5)
    write_pages_jsonl(pdf, str(tmp_path / "jl"), n_files=4)
    stream = read_pages_jsonl_stream(spark, str(tmp_path / "jl"))
    agg = S.host_window_stats(stream, window="10 minutes", watermark="10 minutes")
    out = str(tmp_path / "out")
    q = S.write_exactly_once(agg, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    batch = S.host_window_stats(
        read_pages_jsonl(spark, str(tmp_path / "jl")),
        window="10 minutes",
        watermark="10 minutes",
    )
    g = got.toPandas().set_index(["w_start", "host"]).sort_index()
    e = batch.toPandas().set_index(["w_start", "host"]).sort_index()
    joined = g.join(e, how="left", rsuffix="_b")
    for c in ("n_pages", "total_chars", "cnt_a"):
        assert (joined[c] == joined[f"{c}_b"]).all(), c
