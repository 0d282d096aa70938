"""Winnowing fingerprint tests: lockstep with a pure-Python replica of
the Schleimer-Wilkerson-Aiken spec, the shared-substring guarantee, the
rightmost tie-break, and the short-doc fence."""

import hashlib

import pytest

from fasta_windows_spark.operators import dedup as D

K, W = 8, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _py_winnow(text: str, k: int = K, w: int = W):
    """Spec replica: per-window min, rightmost on ties, distinct
    (pos, hash) selections."""
    t = text.lower()
    hs = [_h(t[i : i + k]) for i in range(len(t) - k + 1)]
    sel = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        mv = min(win)
        pos = j + max(i for i, x in enumerate(win) if x == mv)
        sel.add((pos, mv))
    return sel


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_winnow_matches_python_reference(spark, docs):
    rows = docs.limit(50).collect()
    sub = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows], "doc_id long, text string"
    )
    got = {}
    for r in D.winnow_fingerprints(sub).collect():
        got.setdefault(r.doc, set()).add((r.pos, r.fp))
    expected = {
        r.doc_id: _py_winnow(r.text)
        for r in rows
        if len(r.text) >= K + W - 1
    }
    assert got == expected


def test_winnow_shared_substring_guarantee(spark):
    """The winnowing theorem: a shared substring of length >= k + w - 1
    (here 11) guarantees >= 1 shared fingerprint. Build two otherwise
    disjoint docs around a 24-char shared run."""
    shared = "the quick brown fox here"
    a = "zzzzqqqqvvvv " + shared + " xkcdxkcdxkcd"
    b = "mmmmnnnnpppp " + shared + " wubbawubbawub"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fps = {}
    for r in D.winnow_fingerprints(df).collect():
        fps.setdefault(r.doc, set()).add(r.fp)
    assert fps[1] & fps[2], "shared 24-char substring must share a fingerprint"


def test_winnow_rightmost_tie_break(spark):
    """A run of identical grams hashes identically; the rightmost
    occurrence in each window must win. 'aaaaaaaaaaa' (11 chars) has 4
    identical gram hashes -> one window, selection at pos 3."""
    df = spark.createDataFrame([(1, "a" * 11)], "doc_id long, text string")
    got = [(r.pos, r.fp) for r in D.winnow_fingerprints(df).collect()]
    assert got == [(3, _h("a" * 8))]


def test_winnow_short_doc_fence(spark):
    """Docs shorter than k + w - 1 have no full window and emit nothing."""
    df = spark.createDataFrame(
        [(1, "a" * (K + W - 2)), (2, "b" * (K + W - 1))],
        "doc_id long, text string",
    )
    docs_out = {r.doc for r in D.winnow_fingerprints(df).collect()}
    assert docs_out == {2}


def test_winnow_overlap_pairs_detects_partial_copy(spark, docs):
    """A doc that copies half of another doc must pair with it at
    containment >= 0.5 even when padded with unrelated text."""
    src = docs.limit(1).collect()[0]
    half = src.text[: len(src.text) // 2]
    import random

    rng = random.Random(7)
    pad = " ".join(
        "".join(rng.choice("qxzjvw") for _ in range(6)) for _ in range(30)
    )
    df = spark.createDataFrame(
        [(1, src.text), (2, half + " " + pad)], "doc_id long, text string"
    )
    pairs = D.winnow_overlap_pairs(df).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b) == (1, 2) and p.containment >= 0.5


def test_winnow_xxh_twin_properties(spark, docs):
    """The throughput twin (hash_grams='xxh') isn't oracle-checkable, so
    pin its semantics by property: deterministic across runs and
    partitionings, exact dups share the full fingerprint set, the
    shared-substring guarantee holds, and selection density is in the
    winnowing band (expected ~2/(w+1) of grams)."""
    shared = "the quick brown fox here"
    a = "zzzzqqqqvvvv " + shared + " xkcdxkcdxkcd"
    b = "mmmmnnnnpppp " + shared + " wubbawubbawub"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, a)], "doc_id long, text string"
    )
    fps = {}
    for r in D.winnow_fingerprints(df, hash_grams="xxh").collect():
        fps.setdefault(r.doc, set()).add((r.pos, r.fp))
    assert fps[1] == fps[3]  # dup invariance
    assert {f for _, f in fps[1]} & {f for _, f in fps[2]}  # guarantee
    again = {}
    for r in D.winnow_fingerprints(
        df.repartition(5), hash_grams="xxh"
    ).collect():
        again.setdefault(r.doc, set()).add((r.pos, r.fp))
    assert again == fps
    rows = docs.limit(100).collect()
    sub = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows], "doc_id long, text string"
    )
    n_fp = D.winnow_fingerprints(sub, hash_grams="xxh").count()
    n_grams = sum(len(r.text) - K + 1 for r in rows if len(r.text) >= K + W - 1)
    density = n_fp / n_grams
    assert 0.25 <= density <= 0.55  # theory: 2/(w+1) = 0.4
