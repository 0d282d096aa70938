"""BPE tokenizer tests: committed-merges reproducibility, encoder
invariants, and the vocabulary-only Python boundary (the corpus text must
never cross into the pandas UDF — only the DISTINCT pre-token set does)."""

import pyspark.sql.functions as F

from fasta_windows_spark.functions import bpe


def test_committed_merges_reproducible():
    """Retraining on the committed corpus reproduces the committed table
    bit-for-bit (deterministic trainer: lexicographic tie-breaks)."""
    import duckdb

    texts = (
        duckdb.sql(
            "select text from '/root/testdata/sf0.001/documents.parquet' "
            "order by doc_id"
        )
        .df()["text"]
        .tolist()
    )
    assert bpe.train_bpe(texts, n_merges=40) == bpe.load_merges()


def test_encode_word_invariants():
    ranks = bpe.merge_ranks()
    # concatenation round-trip: tokens re-join to the word, any word
    for w in ["the", "customer", "window", "xyzzy", "a", "", "zzzz"]:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w
        # no mergeable pair remains at the fixpoint
        for x, y in zip(toks, toks[1:]):
            assert (x, y) not in ranks, (w, toks, (x, y))
    # unknown alphabet falls through to characters (no <unk>)
    assert bpe.encode_word("qqq", ranks) == ["q", "q", "q"]


def test_encode_matches_batch_formulation():
    """The leftmost-one-at-a-time loop equals the textbook batch form
    (merge ALL non-overlapping occurrences of the min-rank pair per step)
    — the equivalence the oracle CTE relies on."""

    def encode_batch(word, ranks):
        toks = list(word)
        while len(toks) > 1:
            best = min(
                (r for p, r in (( (toks[i], toks[i+1]), ranks.get((toks[i], toks[i+1])) )
                                for i in range(len(toks) - 1)) if r is not None),
                default=None,
            )
            if best is None:
                break
            a, b = next(p for p, r in ranks.items() if r == best)
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    ranks = bpe.merge_ranks()
    import duckdb

    texts = (
        duckdb.sql(
            "select text from '/root/testdata/sf0.001/documents.parquet' "
            "order by doc_id limit 100"
        )
        .df()["text"]
        .tolist()
    )
    words = {w for t in texts for w in bpe.pretokenize(t)}
    words |= {"aaaa", "abab", "mississippi"}
    for w in sorted(words):
        assert bpe.encode_word(w, ranks) == encode_batch(w, ranks), w


def test_spark_counts_match_python(spark):
    rows = [
        (1, "the customer window"),
        (2, "spark stream aggregate FILTER"),
        (3, ""),
        (4, "zz qq  the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_pretokens, r.n_bpe_tokens)
        for r in bpe.bpe_token_counts(docs).collect()
    }
    ranks = bpe.merge_ranks()
    for did, text in rows:
        pts = bpe.pretokenize(text)
        if not pts:
            assert did not in got
            continue
        n_bpe = sum(len(bpe.encode_word(w, ranks)) for w in pts)
        assert got[did] == (len(pts), n_bpe), (did, got[did])


def test_python_boundary_is_vocabulary_only(spark):
    """The pandas UDF input must be the post-DISTINCT word frame: the
    aggregate (dedup) sits BELOW the ArrowEvalPython node in the plan, so
    corpus rows never cross Arrow. This is the property that makes BPE
    O(|vocab|) instead of O(corpus) in Python."""
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("the customer window stream").alias("text"),
    )
    plan = (
        bpe.bpe_token_counts(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    arrow_subtree = plan[plan.index("ArrowEvalPython"):]
    # the UDF's child plan is the distinct-word aggregate, not the corpus
    assert "HashAggregate" in arrow_subtree
    # and the join back is a broadcast, not a shuffle of the corpus on word
    assert "BroadcastHashJoin" in plan


def test_distributed_trainer_matches_python(spark):
    """train_bpe_distributed == the driver-side train_bpe on the same
    corpus, restricted to the [a-z]+ vocabulary the distributed trainer
    uses (pre-stripping non-alpha makes the full-pattern Python trainer
    see exactly that vocabulary). Covers multi-char-token merges: at
    sf0.001 rank 7 is ('p', 'ar'), consuming rank 6's output."""
    import re

    import duckdb

    texts = (
        duckdb.sql(
            "select text from '/root/testdata/sf0.001/documents.parquet'"
        )
        .df()["text"]
        .tolist()
    )
    alpha = [re.sub(r"[^a-z]+", " ", (t or "").lower()) for t in texts]
    expected = bpe.train_bpe(alpha, n_merges=8)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = bpe.train_bpe_distributed(docs, n_merges=8).collect()
    assert [(r.lft, r.rgt) for r in got] == expected
    assert [r.m_rank for r in got] == list(range(8))
    # a later merge consumes an earlier merge's multi-char output
    assert any(len(r.lft) > 1 or len(r.rgt) > 1 for r in got)
    # frequencies are the pre-merge pair counts: positive, and rank 0
    # carries the global argmax
    assert got[0].freq == max(r.freq for r in got)
    assert all(r.freq > 0 for r in got)


def test_distributed_trainer_early_stop(spark):
    """A vocabulary with no adjacent pairs left stops early instead of
    emitting padded rows (single-char words only)."""
    docs = spark.createDataFrame(
        [("a b c a b",)], "text string"
    )
    got = bpe.train_bpe_distributed(docs, n_merges=8).collect()
    assert got == []


def test_distributed_trainer_tie_break(spark):
    """Equal-frequency pairs resolve to the lexicographically smallest
    (lft, rgt) — the same rule as the committed driver-side trainer."""
    docs = spark.createDataFrame([("zy zy ba ba",)], "text string")
    got = bpe.train_bpe_distributed(docs, n_merges=1).collect()
    assert [(got[0].lft, got[0].rgt, got[0].freq)] == [("b", "a", 2)]
