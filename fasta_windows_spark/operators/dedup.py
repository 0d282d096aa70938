"""Deduplication operators for web-scale training-data pipelines.

All hashing is md5-derived so the DuckDB oracles can reproduce it exactly:
``hash64(s) = int(md5(s)[:8], 16)`` (32-bit domain for minhash perms,
60-bit for simhash). At 100 TB these run as: narrow per-doc signature
stage (JVM expressions, no Python) -> banded shuffle (LSH buckets spread
load) -> pair verification only within buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MINHASH_P = 1_000_000_007
MINHASH_PERMS = [(2 * i + 1, 97 * i + 13) for i in range(8)]
SIMHASH_BITS = 60  # 15 hex chars of md5 -> < 2^60, fits signed int64
SIMHASH_BANDS = 4  # 15-bit bands for LSH candidate generation


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text). Map-side partial aggregation
    makes this a single shuffle of (hash, partial-count) pairs."""
    return docs.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def _shingle_hashes(text_col: str, k: int = 5) -> F.Column:
    """array<bigint> of 32-bit md5 hashes of all k-char shingles (JVM-side)."""
    return F.expr(
        f"transform(sequence(0, length({text_col})-{k}), p -> "
        f"cast(conv(substr(md5(substring({text_col}, p+1, {k})),1,8),16,10) as bigint))"
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """MinHash signatures: min over shingles of (a*h+b) mod p per permutation.
    Entirely JVM-side expressions — one pass over the text, no shuffle."""
    out = docs.where(F.length(text_col) >= k).withColumn(
        "_hs", _shingle_hashes(text_col, k)
    )
    for i, (a, b) in enumerate(MINHASH_PERMS):
        out = out.withColumn(
            f"sig_{i}",
            F.expr(f"array_min(transform(_hs, h -> ({a}*h + {b}) % {MINHASH_P}))"),
        )
    return out.drop("_hs")


def minhash_band_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH banding (2 bands x 4 rows over 8 sigs): candidate near-dup pairs =
    docs agreeing on all 4 sigs of at least one band. The band-key join is
    the scale path: candidates only, never all-pairs."""
    bands = None
    for b in range(2):
        part = sigs.select(
            F.col(id_col).alias("doc"),
            F.lit(b).alias("band"),
            *[
                F.col(f"sig_{4 * b + i}").alias(f"bk{i}")
                for i in range(4)
            ],
        )
        bands = part if bands is None else bands.unionAll(part)
    left = bands.alias("l")
    right = bands.alias("r")
    cond = (F.col("l.band") == F.col("r.band")) & (F.col("l.doc") < F.col("r.doc"))
    for i in range(4):
        cond = cond & (F.col(f"l.bk{i}") == F.col(f"r.bk{i}"))
    return (
        left.join(right, cond)
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64(60)-bit SimHash over whitespace tokens: per bit j, sum +-1 weighted
    by token-hash bit j; bit set iff sum > 0. Two-stage aggregation keyed by
    (doc, bit) then doc — both shuffles are by doc id, co-partitioned."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(text_col, " ")).alias("tok"),
    ).withColumn(
        "h",
        F.expr("cast(conv(substr(md5(tok),1,15),16,10) as bigint)"),
    )
    bits = (
        toks.select(id_col, "h", F.explode(F.expr(f"sequence(0, {SIMHASH_BITS - 1})")).alias("j"))
        .groupBy(id_col, "j")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(h, j) & 1") == 1, 1).otherwise(-1)
            ).alias("bsum")
        )
    )
    return bits.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("bsum") > 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 12, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: 15-bit band LSH for candidates, then exact
    Hamming via bit_count(xor) <= max_hamming."""
    bands = None
    for b in range(SIMHASH_BANDS):
        part = sh.select(
            F.col(id_col).alias("doc"),
            F.col("simhash").alias("sh"),
            F.lit(b).alias("band"),
            F.expr(f"(simhash >> {b * 15}) & 32767").alias("bk"),
        )
        bands = part if bands is None else bands.unionAll(part)
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.expr("bit_count(l.sh ^ r.sh)").alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


def rare_shingle_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    max_df: int = 20,
    min_jaccard: float = 0.4,
) -> DataFrame:
    """n-gram Jaccard near-dup via an inverted index over *rare* word
    shingles (document frequency <= max_df): the standard trick that keeps
    the pair-generation join from exploding on common shingles at scale."""
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(
                f"transform(sequence(0, size(split({text_col}, ' '))-{shingle_words}), "
                f"i -> array_join(slice(split({text_col}, ' '), i+1, {shingle_words}), ' '))"
            )
        ).alias("shingle"),
    ).distinct()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("shingle")
    )
    rsh = sh.join(rare, "shingle")
    sizes = rsh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    l, r = rsh.alias("l"), rsh.alias("r")
    common = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out.select("doc_a", "doc_b", "n_common", "jaccard")
