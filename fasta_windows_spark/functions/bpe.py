"""Byte-pair encoding with a COMMITTED merges table — real tokenizer
semantics for the packing/chunking operators (VERDICT r3 "Next round" #5a).

The reference engine has no tokenizer (its k-mers are fixed-width grams,
kmeru8.rs:35); this exists for the LLM-training-data side of the brief,
where "token count" must mean subword tokens, not whitespace splits.
Dependency-free: the trainer, encoder, and merges file are all in-repo.

Algorithm (the standard BPE formulation):
- pre-tokenize with ``BPE_ISH_PATTERN`` over lowercased text (the same
  pre-tokenizer the cheap ``bpe_tokens`` count uses, so the two counts are
  comparable);
- each pre-token starts as its character sequence; then REPEATEDLY merge
  the leftmost occurrence of the lowest-rank mergeable pair until no
  learned pair remains. One-occurrence-at-a-time leftmost merging is
  exactly equivalent to the batch "merge all non-overlapping occurrences
  of the min-rank pair" form: a merge can only create pairs involving its
  OUTPUT token, and any learned pair containing that token has a strictly
  higher rank, so the current min-rank pair stays minimal until exhausted.

Spark mapping — the 100 TB shape: corpus text NEVER crosses into Python.
``bpe_token_counts`` explodes pre-tokens (JVM regexp), reduces to the
DISTINCT pre-token set (vocabulary-sized: ~10^7 rows at web scale, vs
~10^12 document rows), encodes only that set in one Arrow-batched pass,
and broadcast-joins per-word token counts back onto the exploded stream.
Encoding cost is O(|vocabulary|), independent of corpus size.

Oracle mapping: the SAME merge loop is expressible as a DuckDB recursive
CTE over the distinct pre-token set (contract.py builds it from the same
committed merges file), so BPE token counts are fully hash-checkable
against ANSI SQL — no rows-only exemption needed.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import BPE_ISH_PATTERN

MERGES_FILE = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")

_RX = re.compile(BPE_ISH_PATTERN)


def pretokenize(text: str) -> list:
    """The shared pre-tokenizer: BPE_ISH regex over lowercased text."""
    return _RX.findall(text.lower())


def train_bpe(texts, n_merges: int = 256) -> list:
    """Deterministic BPE trainer. Returns the ordered merges list
    [(left, right), ...]. Tie-break on equal pair frequency is the
    lexicographically smallest (left, right) pair, so retraining on the
    same corpus reproduces the committed table bit-for-bit."""
    vocab = Counter()
    for t in texts:
        for w in pretokenize(t or ""):
            vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, toks in words.items():
            f = vocab[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best_n = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == best_n)
        merges.append(pair)
        a, b = pair
        ab = a + b
        for w, toks in words.items():
            i, out = 0, []
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            words[w] = out
    return merges


def save_merges(merges, path: str = MERGES_FILE) -> None:
    with open(path, "w") as f:
        f.write("# BPE merges, one per line: '<left> <right>', rank = line order\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str = MERGES_FILE) -> list:
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            out.append((a, b))
    return out


def merge_ranks(merges=None) -> dict:
    if merges is None:
        merges = load_merges()
    return {pair: i for i, pair in enumerate(merges)}


def encode_word(word: str, ranks: dict) -> list:
    """Apply merges to one pre-token: repeatedly merge the LEFTMOST
    occurrence of the lowest-rank mergeable pair (see module docstring for
    why this equals the batch formulation). The DuckDB oracle CTE performs
    the identical loop."""
    toks = list(word)
    while len(toks) > 1:
        best_rank, best_i = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def encode(text: str, ranks: dict) -> list:
    out = []
    for w in pretokenize(text):
        out.extend(encode_word(w, ranks))
    return out


def word_token_counts(words: DataFrame, merges=None, word_col: str = "word") -> DataFrame:
    """(word, n_bpe) for a DISTINCT-word DataFrame — the only place BPE
    touches Python, one Arrow batch pass over the vocabulary."""
    ranks = merge_ranks(merges)

    @F.pandas_udf("long")
    def n_bpe(s: pd.Series) -> pd.Series:
        return s.map(lambda w: len(encode_word(w, ranks)))

    return words.select(F.col(word_col), n_bpe(F.col(word_col)).alias("n_bpe"))


def word_tokens(words: DataFrame, merges=None, word_col: str = "word") -> DataFrame:
    """(word, token) exploded subword tokens for a DISTINCT-word frame —
    the vocabulary-statistics companion to word_token_counts (same single
    Arrow pass over the vocabulary, emitting the tokens themselves)."""
    ranks = merge_ranks(merges)

    @F.pandas_udf("array<string>")
    def toks(s: pd.Series) -> pd.Series:
        return s.map(lambda w: encode_word(w, ranks))

    return words.select(
        F.col(word_col),
        F.explode(toks(F.col(word_col))).alias("token"),
    )


def bpe_token_counts(
    docs: DataFrame,
    merges=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts: (id, n_pretokens, n_bpe_tokens).

    Plan shape: JVM regexp explode -> distinct (vocabulary-sized) ->
    Arrow-batched encode of the distinct words only -> broadcast join back
    -> partial-aggregated per-doc sum. Documents with no pre-tokens
    (empty/whitespace text) are excluded, matching the oracle's WHERE.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
            )
        ).alias("word"),
    )
    vocab = words.select("word").distinct()
    enc = word_token_counts(vocab, merges)
    return (
        words.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_pretokens"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
    )


def train_bpe_distributed(
    docs: DataFrame,
    n_merges: int = 8,
    pattern: str = "[a-z]+",
    text_col: str = "text",
) -> DataFrame:
    """Learn BPE merges FROM the corpus as Spark jobs — the distributed
    twin of :func:`train_bpe` (which is driver-side and exists to produce
    the committed merges file). Returns the ordered merges table
    (m_rank, lft, rgt, freq), bit-identical to the driver-side trainer on
    the same corpus: per iteration, the (count DESC, left ASC, right ASC)
    argmax pair is merged across every non-overlapping occurrence,
    scanning left to right (Sennrich et al. 2016's word-frequency
    formulation; the reference engine has no tokenizer — this is
    LLM-pipeline surface, like the rest of functions/bpe.py).

    The training vocabulary is the ``pattern`` pre-tokens of the
    lowercased corpus (default ``[a-z]+`` — alphabetic words only, so
    tokens can never collide with the oracle's chr(31) list separator).

    100 TB shape: the corpus is read ONCE — a JVM regexp explode reduced
    by a partial-aggregated groupBy to the DISTINCT word-frequency table
    (~10^7 rows at web scale vs ~10^12 docs), cached; every one of the
    n_merges iterations then runs on that vocabulary-sized frame only:
    adjacent-pair explode -> map-side-combined sum -> a 1-ROW argmax
    collect (metadata-sized, like the k-means centroid pulls), and the
    merge rewrite is a JVM `aggregate` fold over the token arrays (merged
    generations are cached and the previous one released, so lineage and
    memory stay O(1) per iteration). No Python crossing anywhere; corpus
    text never shuffles. The k-row result broadcasts to any encoder.
    """
    voc = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(pattern), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("cnt", F.split("w", "").alias("toks"))
        .cache()
    )
    spark = docs.sparkSession
    merges = []
    cur = voc
    for i in range(n_merges):
        top = (
            cur.select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(toks, 1, size(toks)-1)").alias("lft"),
                        F.expr("slice(toks, 2, size(toks)-1)").alias("rgt"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("lft"), F.asc("rgt"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lft, rgt, freq = top[0].lft, top[0].rgt, top[0].freq
        merges.append((i, lft, rgt, int(freq)))
        # Greedy left-to-right non-overlapping merge of (lft, rgt) — the
        # same rewrite train_bpe's while-loop performs, as a JVM fold.
        # Safe to inline as literals: pattern-restricted tokens contain
        # no quotes. A merged token can never false-trigger the
        # element_at(acc, -1) check mid-iteration because it differs
        # from lft (rgt is non-empty).
        fold = (
            "aggregate(toks, cast(array() as array<string>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{lft}' "
            f"AND x = '{rgt}' "
            f"THEN concat(slice(acc, 1, size(acc)-1), array('{lft}{rgt}')) "
            "ELSE concat(acc, array(x)) END)"
        )
        nxt = cur.select("cnt", F.expr(fold).alias("toks")).cache()
        nxt.count()
        if cur is not voc:
            cur.unpersist()
        cur = nxt
    if cur is not voc:
        cur.unpersist()
    voc.unpersist()
    return spark.createDataFrame(
        merges, "m_rank bigint, lft string, rgt string, freq bigint"
    )
