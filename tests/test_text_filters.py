"""Line-level cleaning and mixture weights: reference behavior + invariants."""

import math

import pyspark.sql.functions as F

from fasta_windows_spark.functions.text import filter_lines
from fasta_windows_spark.operators.sampling import mixture_weights

DOCS = [
    # (doc_id, text) — newline-delimited lines
    (0, "one two three four five six\nshort line\nthe slow boilerplate line here now"),
    (1, "a b c d e\nf g h i j k l"),
    (2, "tiny"),
    (3, "slow a b c d e f"),  # blocklisted word in a long-enough line
]


def _py_filter(text, min_words=5, blocklist=("slow",)):
    lines = text.split("\n")
    kept = [
        ln
        for ln in lines
        if len(ln.split(" ")) >= min_words
        and not any(w in ln.split(" ") for w in blocklist)
    ]
    return len(lines), len(kept), "\n".join(kept)


def test_filter_lines_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept_lines"], r["clean_text"])
        for r in filter_lines(df, min_words=5, blocklist=("slow",)).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_filter(text), doc_id


def test_filter_lines_project_false_rewrites_in_place(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = filter_lines(df, min_words=5, blocklist=("slow",), project=False)
    row = {r["doc_id"]: r for r in out.collect()}[0]
    assert row["text"] == _py_filter(DOCS[0][1])[2]
    assert set(out.columns) == {"doc_id", "text", "n_lines", "n_kept_lines"}


def test_mixture_weights_sum_to_one_and_order(spark):
    rows = [(i, "w " * (10 * (s + 1)), f"src{s}") for i, s in enumerate([0, 0, 1, 2, 2, 2])]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in mixture_weights(df, by="source").collect()}
    total = sum(r["weight"] for r in out.values())
    assert math.isclose(total, 1.0, abs_tol=1e-8)
    # alpha=0.5 compresses the spread: the biggest source's weight share is
    # smaller than its token share
    toks = {s: r["n_tokens"] for s, r in out.items()}
    big = max(toks, key=toks.get)
    assert out[big]["weight"] < toks[big] / sum(toks.values())
    # but ordering is preserved
    ws = sorted(out.values(), key=lambda r: r["n_tokens"])
    assert [r["weight"] for r in ws] == sorted(r["weight"] for r in ws)
