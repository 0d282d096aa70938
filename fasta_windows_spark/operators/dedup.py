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


def minhash_signatures_fast(
    docs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Throughput twin of :func:`minhash_signatures` for the real 100 TB
    path: shingle hashing via Spark's builtin xxhash64 (a few cycles per
    shingle) instead of md5 (~a full digest per shingle, the dominant CPU
    cost of the oracle-reproducible variant — md5 exists there only because
    DuckDB can recompute it). Same signature/banding semantics; not
    DuckDB-checkable (xxhash64 is Spark-specific), so verification is
    property-based: identical texts ⇒ identical signatures, and banding
    over these signatures finds planted near-duplicates
    (tests/test_dedup_fast.py)."""
    out = docs.where(F.length(text_col) >= k).withColumn(
        "_hs",
        F.expr(
            f"transform(sequence(0, length({text_col})-{k}), p -> "
            f"pmod(xxhash64(substring({text_col}, p+1, {k})), 4294967296))"
        ),
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
    the scale path: candidates only, never all-pairs.

    Bands come from ONE `inline(array(struct...))` pass (not a unionAll of
    per-band projections, which would recompute the upstream signature
    expressions once per band copy on each join side)."""
    left = _minhash_band_rows(sigs, id_col).alias("l")
    right = _minhash_band_rows(sigs, id_col).alias("r")
    cond = (F.col("l.band") == F.col("r.band")) & (F.col("l.doc") < F.col("r.doc"))
    for i in range(4):
        cond = cond & (F.col(f"l.bk{i}") == F.col(f"r.bk{i}"))
    return (
        left.join(right, cond)
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def _minhash_band_rows(sigs: DataFrame, id_col: str) -> DataFrame:
    """(doc, band, bk0..bk3): one row per LSH band per doc, from ONE
    inline(array(struct...)) pass (see minhash_band_pairs docstring)."""
    rows = ", ".join(
        "struct({b} as band, {ks})".format(
            b=b,
            ks=", ".join(f"sig_{4 * b + i} as bk{i}" for i in range(4)),
        )
        for b in range(2)
    )
    return sigs.select(F.col(id_col).alias("doc"), F.expr(f"inline(array({rows}))"))


def incremental_minhash_pairs(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental near-dup candidates: a NEW crawl increment against an
    EXISTING signature index, plus new-vs-new — the production daily mode.
    Re-pairing index-vs-index (quadratic in corpus age, and work already
    done when each prior increment landed) never happens: the increment
    only joins bands it actually has.

    Output: (doc_new, doc_match, match_src) with match_src in
    {'index', 'new'}; for new-vs-new, doc_new < doc_match.

    Scale shape: at 10^12 docs the index's band rows are a persisted table
    bucketed by the band key, so the daily increment's band join is a
    local (shuffle-one-side) join of increment-size against it; the
    new-vs-new self-join is increment-sized. Both are candidates-only
    (LSH buckets), never all-pairs."""
    nb = _minhash_band_rows(new_sigs, id_col)
    ib = _minhash_band_rows(index_sigs, id_col)
    key_eq = [F.col(f"l.bk{i}") == F.col(f"r.bk{i}") for i in range(4)]

    # re-crawled docs appear in BOTH the increment and the index under the
    # same id: without the != guard every one of them self-matches (and
    # without an orientation rule a pair present on both sides would also
    # emit mirrored duplicates)
    cond_idx = (F.col("l.band") == F.col("r.band")) & (
        F.col("l.doc") != F.col("r.doc")
    )
    for e in key_eq:
        cond_idx = cond_idx & e
    cond_new = (F.col("l.band") == F.col("r.band")) & (F.col("l.doc") < F.col("r.doc"))
    for e in key_eq:
        cond_new = cond_new & e
    vs_new = (
        nb.alias("l")
        .join(nb.alias("r"), cond_new)
        .select(
            F.col("l.doc").alias("doc_new"),
            F.col("r.doc").alias("doc_match"),
            F.lit("new").alias("match_src"),
        )
    )
    # A pair whose BOTH members are in today's increment is the vs_new
    # join's to report (once, doc_new < doc_match). But a re-crawled doc's
    # content may have CHANGED between crawls, so its NEW signature can
    # fail to band-match while its INDEXED signature still does — dropping
    # every index match into the increment by membership alone would lose
    # that real pair (ADVICE r4). Instead: (a) canonicalize the
    # both-in-increment orientation to least<greatest so mirrored
    # (A,B)/(B,A) index rows collapse under distinct(), then (b) suppress
    # only the pairs the vs_new join ACTUALLY reproduces (anti-join on the
    # pair keys, which share that orientation).
    new_ids = new_sigs.select(F.col(id_col).alias("doc_match")).distinct()
    both_new = F.col("_in_new").isNotNull()
    vs_index = (
        nb.alias("l")
        .join(ib.alias("r"), cond_idx)
        .select(
            F.col("l.doc").alias("doc_new"),
            F.col("r.doc").alias("doc_match"),
        )
        .join(new_ids.withColumn("_in_new", F.lit(True)), "doc_match", "left")
        .select(
            F.when(both_new, F.least("doc_new", "doc_match"))
            .otherwise(F.col("doc_new"))
            .alias("doc_new"),
            F.when(both_new, F.greatest("doc_new", "doc_match"))
            .otherwise(F.col("doc_match"))
            .alias("doc_match"),
            F.lit("index").alias("match_src"),
        )
        .join(
            vs_new.select("doc_new", "doc_match"),
            ["doc_new", "doc_match"],
            "left_anti",
        )
    )
    return vs_index.unionByName(vs_new).distinct()


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64(60)-bit SimHash over whitespace tokens: per bit j, sum +-1 weighted
    by token-hash bit j; bit set iff sum > 0.

    ONE narrow pass per document, entirely JVM-side higher-order functions:
    fold the token-hash array into a 60-long ones-count vector, then pack the
    sign bits. No row explosion (the old tokens x 60 explode amplified a
    1,000-token doc into 60,000 pre-shuffle rows) and NO shuffle at all —
    the output is already one row per input doc. bsum > 0  <=>
    2*ones > n_tokens, so only ones-counts are folded."""
    # NULL text folds to a NULL signature; the explode-based formulation (and
    # the DuckDB oracle's unnest) drop such docs entirely — match that
    return docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.expr(simhash_sql_expr(text_col)).alias("simhash")
    )


def simhash_sql_expr(text_col: str = "text") -> str:
    """The SimHash fold as a reusable SQL expression string, so callers
    that must keep their other columns (e.g. the streaming near-dup path,
    which carries url/warc_ts through) can withColumn it instead of
    re-deriving the fold. Semantics documented on :func:`simhash`."""
    b = SIMHASH_BITS
    hs = (
        f"transform(split({text_col}, ' '), tok -> "
        "cast(conv(substr(md5(tok),1,15),16,10) as bigint))"
    )
    # accumulator: slots 0..b-1 = per-bit ones-counts, slot b = token count;
    # the finish lambda packs sign bits (2*ones > n) into the signature. The
    # hash array appears exactly once, so each token is md5'd exactly once.
    return (
        f"aggregate({hs}, array_repeat(cast(0 as bigint), {b + 1}), "
        f"(acc, h) -> transform(acc, (a, j) -> a + if(j < {b}, shiftright(h, j) & 1, 1)), "
        f"acc -> aggregate(zip_with(slice(acc, 1, {b}), sequence(0, {b - 1}), "
        f"(o, j) -> if(2*o > acc[{b}], shiftleft(cast(1 as bigint), j), cast(0 as bigint))), "
        "cast(0 as bigint), (s, x) -> s + x))"
    )


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 12, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: 15-bit band LSH for candidates, then exact
    Hamming via bit_count(xor) <= max_hamming.

    Band rows come from ONE explode pass so the (narrow, md5-folding)
    signature expression upstream is evaluated once per doc per join side,
    not once per band copy."""
    bands = sh.select(
        F.col(id_col).alias("doc"),
        F.col("simhash").alias("sh"),
        F.explode(F.expr(f"sequence(0, {SIMHASH_BANDS - 1})")).alias("band"),
    ).withColumn("bk", F.expr("(sh >> (band * 15)) & 32767"))
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
    stage: bool = True,
    hash_shingles: bool = True,
) -> DataFrame:
    """n-gram Jaccard near-dup via an inverted index over *rare* word
    shingles (document frequency <= max_df): the standard trick that keeps
    the pair-generation join from exploding on common shingles at scale.

    `max_df` is a recall bound, not just a cost dial: a duplicate pair whose
    every shared shingle occurs in > max_df documents is invisible to this
    query (boilerplate-only overlap — usually the desired semantics).

    `stage=True` persists the exploded-shingle subtrees (`sh`, `rsh`), which
    feed 3+ consumers (rare-filter build, both self-join sides, per-doc
    sizes); ReuseExchange alone only covers the identically-partitioned
    join sides, so unstaged plans re-explode the corpus up to 5x (measured:
    10 parquet scans -> 2). Caches are scope-managed: each call releases
    the previous call's pair (staging.stage_scoped), so repeated invocation
    cannot accumulate cache. At 100 TB the same staging is a bucketed
    intermediate table write instead of executor-memory/disk cache.

    `hash_shingles=True` (default) carries shingles as xxhash64 longs
    instead of ~25-byte strings through every downstream shuffle (the
    document-frequency groupBy and both self-join sides): ~3x fewer
    shuffle bytes and cheaper comparisons, measured ~12% wall locally.
    Output exposes only doc pairs and COUNTS, so the only semantic risk
    is a 64-bit collision inflating n_common (P ~ n_shingles^2 / 2^65 —
    ~1e-7 at 10^6 distinct shingles); set False to reproduce exact string
    semantics (the DuckDB oracle's form)."""
    common, sizes = _rare_shingle_counts(
        docs, text_col, id_col, shingle_words, max_df, stage, hash_shingles,
        scope="jaccard",
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


def _rare_shingle_counts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_words: int,
    max_df: int,
    stage: bool,
    hash_shingles: bool,
    scope: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared pair-generation core for rare_shingle_jaccard_pairs and
    rare_shingle_containment_pairs: explode per-doc-distinct word shingles,
    keep only rare ones (document frequency <= max_df — the inverted-index
    bound that keeps the self-join from exploding on boilerplate), and
    return (common, sizes): per-pair shared-rare-shingle counts with
    doc_a < doc_b, and per-doc rare-shingle counts. `scope` namespaces the
    staged caches so the two callers don't evict each other's subtrees."""
    # (doc, shingle) distinct == per-doc dedup, so array_distinct BEFORE the
    # explode does it narrowly — no shuffle-distinct over the exploded table
    shingle_expr = (
        f"array_join(slice(split({text_col}, ' '), i+1, {shingle_words}), ' ')"
    )
    if hash_shingles:
        shingle_expr = f"xxhash64({shingle_expr})"
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(0, size(split({text_col}, ' '))-{shingle_words}), "
                f"i -> {shingle_expr}))"
            )
        ).alias("shingle"),
    )
    if stage:
        from ..staging import stage_scoped

        sh = stage_scoped(sh, f"{scope}_sh")
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("shingle")
    )
    rsh = sh.join(rare, "shingle")
    if stage:
        from ..staging import stage_scoped

        rsh = stage_scoped(rsh, f"{scope}_rsh")
    sizes = rsh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    l, r = rsh.alias("l"), rsh.alias("r")
    common = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return common, sizes


def rare_shingle_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    max_df: int = 20,
    min_overlap: float = 0.6,
    stage: bool = True,
    hash_shingles: bool = True,
) -> DataFrame:
    """Asymmetric near-dup via shingle CONTAINMENT (Broder's resemblance
    companion): overlap = n_common / min(n_a, n_b) — the overlap
    coefficient — plus both directional containments n_common/n_a and
    n_common/n_b. Jaccard misses subset relationships by construction
    (a page quoted inside a 10x-larger page has Jaccard <= 0.1 however
    complete the inclusion); containment is the signal that catches
    quote inclusion, page-plus-boilerplate wrappers, and truncated
    mirrors — the cases a dedup pass over a crawl actually meets.

    Same inverted-index pair generation and same rare-shingle recall
    bound as rare_shingle_jaccard_pairs (`max_df` semantics documented
    there); candidates only ever come from shared RARE shingles, so the
    join stays bucketed at corpus scale. Ratios are round(6) — the
    repo-wide float protocol."""
    common, sizes = _rare_shingle_counts(
        docs, text_col, id_col, shingle_words, max_df, stage, hash_shingles,
        scope="containment",
    )
    out = (
        common.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("overlap", F.round(F.col("n_common") / F.least("n_a", "n_b"), 6))
        .where(F.col("overlap") >= min_overlap)
    )
    return out.select(
        "doc_a",
        "doc_b",
        "n_common",
        F.round(F.col("n_common") / F.col("n_a"), 6).alias("containment_a"),
        F.round(F.col("n_common") / F.col("n_b"), 6).alias("containment_b"),
        "overlap",
    )


def decontaminate_overlap(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    DISTINCT lowercased word `shingle_words`-grams it shares with the
    holdout/benchmark corpus — the standard train/test-overlap check run
    before LLM training (filter or flag every doc with n_shared >=
    min_shared).

    Scale shape: the holdout side is a benchmark suite (MBs), so its
    distinct-shingle set is collapsed and BROADCAST; the 100 TB training
    side is shingled narrowly (array_distinct before the explode — no
    shuffle-distinct over the exploded table) and probes the broadcast
    hash relation in place. The only shuffle is the final tiny
    per-contaminated-doc count, after map-side partial aggregation.
    Returns (id_col, n_shared), n_shared >= min_shared.
    """

    def _shingles(df):
        toks = f"split(lower({text_col}), ' ')"
        return df.where(
            F.expr(f"size({toks})") >= shingle_words
        ).select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(0, size({toks})-{shingle_words}), "
                    f"i -> array_join(slice({toks}, i+1, {shingle_words}), ' ')))"
                )
            ).alias("shingle"),
        )

    hold = F.broadcast(_shingles(holdout).select("shingle").distinct())
    return (
        _shingles(train)
        .join(hold, "shingle")
        .groupBy(F.col("doc").alias(id_col))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def eval_contamination(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> DataFrame:
    """Per-EVAL-document contamination report — the reverse aggregation
    direction of `decontaminate_overlap`: for each HOLDOUT/benchmark
    document, how many of its distinct word n-grams appear anywhere in the
    training corpus (the GPT-3 Appendix-C "dirty eval example" measure;
    eval teams report results on the clean subset rather than filtering
    the training set). Returns (id, n_shingles, n_shared, dirty_fp,
    is_dirty) where dirty_fp is the contaminated fraction in 1e-6 fixed
    point — exact integer floor division, so the driver hashes integers.

    Scale shape (the train side is 100 TB, the holdout is MBs): the
    holdout's distinct-shingle set is broadcast TWICE — first the training
    shingle stream probes it in place (narrow explode over array_distinct,
    left-semi against the broadcast — no train-side shuffle), and the
    SURVIVORS (bounded by the holdout's own shingle count, not by train
    size) are deduped and broadcast back to score each holdout document.
    No corpus-sized shuffle anywhere."""

    def _shingles(df):
        toks = f"split(lower({text_col}), ' ')"
        return df.where(
            F.expr(f"size({toks})") >= shingle_words
        ).select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(0, size({toks})-{shingle_words}), "
                    f"i -> array_join(slice({toks}, i+1, {shingle_words}), ' ')))"
                )
            ).alias("shingle"),
        )

    hsh = _shingles(holdout)
    hset = F.broadcast(hsh.select("shingle").distinct())
    # contaminated shingles: holdout-sized at most, never train-sized
    hits = (
        _shingles(train)
        .join(hset, "shingle", "left_semi")
        .select("shingle")
        .distinct()
    )
    n = hsh.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    shared = (
        hsh.join(F.broadcast(hits), "shingle", "left_semi")
        .groupBy("doc")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        n.join(shared, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        )
        .withColumn(
            "dirty_fp",
            F.expr("(n_shared * 1000000) div n_shingles").cast("long"),
        )
        .withColumn("is_dirty", (F.col("n_shared") > 0).cast("int"))
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 20,
) -> DataFrame:
    """Corpus-level paragraph deduplication (the C4 cleaning step that
    removes every repeated paragraph, keeping only its first occurrence in
    corpus order). Paragraph identity is md5 of the unit text; "first" is
    the smallest (doc, position) pair, so the result is deterministic under
    any execution order. The synthetic corpus has no newlines, so the unit
    here is consecutive `para_words`-word chunks — on crawl text pass the
    '\\n'-split paragraphs through the same keep-first machinery.

    Scale shape: NO join on the exploded paragraph table. Two partial-
    aggregated shuffles — (1) groupBy paragraph hash keeping the min
    (doc, idx), (2) regroup the per-hash winners by doc — then a per-doc
    join of two DOC-sized aggregates (AQE broadcasts the smaller). The
    winner is min over (doc << 21 | idx) packed into ONE bigint: a struct
    min would force SortAggregate (struct agg buffers aren't mutable), the
    packed long keeps the whole reduction in HashAggregate with no sort —
    same trick as the IVF argmin (similarity.py). Bounds: idx < 2^21
    paragraphs per doc (oversized docs are segmented upstream) and doc ids
    < 2^42. Returns per-doc (n_paras, n_kept, kept_frac); n_kept = 0 when
    every paragraph already appeared earlier in the corpus.
    """
    pack = 1 << 21
    toks = f"split({text_col}, ' ')"
    paras = docs.where(F.length(text_col) > 0).select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size({toks})/{para_words}.0) as int) - 1), "
                f"i -> md5(array_join(slice({toks}, i*{para_words} + 1, {para_words}), ' ')))"
            )
        ).alias("idx", "h"),
    )
    totals = paras.groupBy("doc").agg(F.count("*").alias("n_paras"))
    winners = (
        paras.groupBy("h")
        .agg(F.min(F.col("doc") * pack + F.col("idx")).alias("w"))
        .groupBy(F.expr(f"w DIV {pack}").alias("doc"))
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        totals.join(winners, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_paras").cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_paras").cast("double"), 6
            ).alias("kept_frac"),
        )
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTERS from a candidate-pair graph: min-label
    propagation to a fixpoint — every node ends labeled with the smallest
    id reachable through the (undirected) pair edges; docs with no pair
    stay their own singleton component. The downstream dedup policy is
    then one row per component (e.g. keep min doc_id).

    Scale notes: each round is one neighbor-propagation join + one
    min-aggregation + one POINTER-JUMPING join (each node also adopts its
    current label's OWN label — the shortcutting that turns a
    diameter-round walk into O(log n) rounds, so a pathological chain
    graph converges as fast as the clique-ish clusters LSH banding
    actually produces). Raises if the fixpoint is not reached within
    max_iter (silently returning unconverged labels would be a wrong
    answer). At 10^12-doc scale use the sibling
    `connected_components_star` (alternating large-star/small-star — the
    classic MapReduce form), which produces bit-identical labels.
    `localCheckpoint` truncates plan lineage per round so the driver
    never re-plans an iteration-deep DAG; on a cluster use reliable
    `checkpoint` instead."""
    from ..staging import free_local_checkpoint

    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("comp")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor = edges.join(
            labels.select(F.col("id").alias("dst"), "comp"), "dst"
        ).select(F.col("src").alias("id"), "comp")
        merged = (
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jumping: comp := label(comp) when smaller — labels are
        # node ids, so the label node's own label is a valid (closer-to-
        # root) label for us too; doubles the propagation distance/round
        jumped = merged.join(
            merged.select(
                F.col("id").alias("comp"), F.col("comp").alias("comp2")
            ),
            "comp",
            "left",
        ).select(
            "id", F.least("comp", F.coalesce("comp2", "comp")).alias("comp")
        )
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (
            new_labels.join(
                labels.select("id", F.col("comp").alias("old_comp")), "id"
            )
            .where(F.col("comp") < F.col("old_comp"))
            .count()
        )
        # the changed-count action above was the last reader of the old
        # round's checkpoint RDD — free it instead of waiting on Python GC
        free_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    free_local_checkpoint(edges)  # labels is its own checkpoint; edges is dead
    return labels.select(F.col("id").alias(id_col), F.col("comp").alias("component_id"))


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    MapReduce and Beyond", SoCC 2014): the 10^12-edge form that
    `connected_components`' docstring promises, implemented rather than
    cited. Same contract and bit-identical output: every node labeled with
    the smallest id reachable through the undirected pair edges; docs with
    no pair stay their own singleton component.

    Why a second algorithm: label propagation shuffles a LABEL TABLE of
    |V| rows every round alongside the edges; the star alternation
    rewrites only the EDGE multiset, whose size is non-increasing per
    round, and provably converges in O(log^2 n) rounds on ANY graph shape
    (paper Thm 2) — no per-node state, no pointer table, which is why this
    is the classic trillion-edge MapReduce form.

    Edges are kept as a distinct set canonically oriented (u > v):
    - large-star: for every node u, hook every LARGER neighbor onto
      m = min(N(u) ∪ {u}). One symmetric explode, one partial-aggregated
      groupBy(u) min, one u-key equi-join back — the emitted (v, m) pairs
      are already (larger, smaller) by construction.
    - small-star: on the (larger → smaller) orientation directly, re-point
      u and its smaller neighbors at m = min(N<(u) ∪ {u}). Same
      one-groupBy + one-join shape.
    A full round is therefore ~4 hash-partitioned shuffles on node keys,
    all map-side combined, with lineage truncated per round
    (`localCheckpoint`; use reliable `checkpoint` on a cluster) and the
    superseded round's RDD freed eagerly. Convergence = the edge set is
    stable across a full round (both sets are distinct, so count equality
    + empty exceptAll is exact set equality; at real scale the same check
    rides the count + a sum-of-xxhash64 signature instead of exceptAll).
    At the fixpoint every component is a star centered at its minimum
    node (paper Lemma 1), so labels fall out of the final edge set as the
    (child → root) map, left-joined onto `nodes` for singletons. Raises
    if max_iter rounds don't converge — unconverged labels are wrong
    answers, same policy as `connected_components`."""
    from ..staging import free_local_checkpoint

    e = pairs.select(
        F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("u"),
        F.least(F.col(a_col), F.col(b_col)).cast("long").alias("v"),
    )
    edges = e.where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)

    def _large_star(E: DataFrame) -> DataFrame:
        sym = E.select("u", "v").unionAll(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # m = min(N(u) ∪ {u}) = least(u, min over neighbors)
        mins = sym.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))  # hook larger neighbors only
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(E: DataFrame) -> DataFrame:
        # E is oriented (u > v): N<(u) is exactly u's out-neighborhood
        mins = E.groupBy("u").agg(F.min("v").alias("m"))
        repointed = (
            E.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return (
            mins.select("u", F.col("m").alias("v"))
            .unionAll(repointed)
            .distinct()
        )

    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        stable = (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).isEmpty()
        )
        free_local_checkpoint(edges)
        edges = new_edges
        if stable:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint = stars centered at component minima: edges ARE (child, root);
    # groupBy-min is belt-and-braces (a star child has exactly one root)
    # the final checkpoint stays persisted: the returned plan reads it
    # (unpersisting a truncated-lineage RDD with a live reader would fail);
    # it is released when the frame is garbage-collected, as in
    # connected_components' returned `labels`
    roots = edges.groupBy("u").agg(F.min("v").alias("root"))
    return (
        nodes.select(F.col(id_col).cast("long").alias("u"))
        .join(roots, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.coalesce("root", "u").alias("component_id"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS trick): cut the text AFTER
    every position whose trailing `window`-char gram hashes to 0 mod
    `mask` (expected chunk length ~= mask chars). Cut points depend only
    on LOCAL content, so two documents sharing a span — at ANY byte
    offset in each — produce identical chunks inside it; fixed-stride
    shingling would only catch alignment-preserving copies. One narrow
    JVM-HOF pass per doc: (id, chunk_idx, start, chunk_len, h) with a
    56-bit md5-prefix chunk hash (collision-safe at corpus scale where a
    32-bit prefix would birthday-collide). Zero shuffle."""
    n = f"length({text_col})"
    # guard for docs shorter than the gram window: sequence(lo, hi) DESCENDS
    # when hi < lo (unlike DuckDB's empty range), which would evaluate
    # substring at zero/negative positions (Spark counts negatives from the
    # string END) and inject out-of-order cut points → negative chunk_len
    # rows and cross-engine divergence. greatest() keeps the sequence
    # ascending (a single out-of-range candidate) and the `p <= n-1` term
    # filters it, so a short doc yields cuts = [0, n] — one whole-text
    # chunk, exactly the oracle's empty-range behaviour.
    cuts = (
        f"concat(array(0L), "
        f"filter(sequence({window}L, greatest({n} - 1L, {window}L)), p -> "
        f"  p <= {n} - 1L AND "
        f"  cast(conv(substr(md5(substring({text_col}, cast(p - {window - 1} as int), {window})), 1, 4), 16, 10) as bigint) % {mask} = 0), "
        f"array(cast({n} as bigint)))"
    )
    chunks = (
        "transform(sequence(2, size(_cuts)), i -> struct("
        "  element_at(_cuts, i - 1) as start,"
        "  element_at(_cuts, i) - element_at(_cuts, i - 1) as chunk_len,"
        f" cast(conv(substr(md5(substring({text_col},"
        "      cast(element_at(_cuts, i - 1) + 1 as int),"
        "      cast(element_at(_cuts, i) - element_at(_cuts, i - 1) as int))), 1, 14), 16, 10) as bigint) as h))"
    )
    return (
        docs.where(F.length(text_col) > 0)
        .withColumn("_cuts", F.expr(cuts))
        .select(id_col, F.posexplode(F.expr(chunks)).alias("idx", "c"))
        .select(
            id_col,
            (F.col("idx") + 1).alias("chunk_idx"),
            F.col("c.start").alias("start"),
            F.col("c.chunk_len").alias("chunk_len"),
            F.col("c.h").alias("h"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
) -> DataFrame:
    """Cross-document duplicated exact spans: CDC chunks that appear in
    more than one document — the exact-substring dedup class (detects
    shared boilerplate, quoted blocks, and whole-document copies at any
    offset), complementing the doc-level MinHash/SimHash families.
    One partial-aggregated groupBy on the chunk hash after the narrow
    chunking pass; at 100 TB that shuffle carries one short row per
    chunk (~1/mask of the corpus rows), and the output is the dedup
    policy's input (drop/keep-first per duplicated span)."""
    c = cdc_chunks(docs, text_col, id_col, window, mask)
    return (
        c.groupBy("h")
        .agg(
            F.min("chunk_len").alias("chunk_len"),
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("example_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_spans_keep_first(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
) -> DataFrame:
    """Corpus-wide exact-substring dedup REWRITE (the C4-style cleaning
    step `duplicate_spans` only reports): drop every CDC chunk that
    already occurred earlier in corpus order — first occurrence = the
    smallest (doc, chunk_idx), a packed-BIGINT HashAggregate argmin (the
    paragraph_dedup / IVF trick) — and reassemble each document from its
    kept chunks, in order. Returns per doc
    (id, total_chars, kept_chars, n_chunks, n_kept, cleaned_md5);
    kept_chars == total_chars and cleaned_md5 == md5(text) for documents
    with no earlier-duplicated span.

    Scale shape: the TEXT never shuffles. Chunk-hash rows (short) cross
    three hash exchanges (winner argmin, winner membership join,
    per-doc regroup of kept RANGES); the ranges then join to the docs
    table on the doc id and the reassembly is one in-place HOF
    substring-concat over the original text column. Bounds: chunk_idx <
    2^21 per doc, doc ids < 2^42 (the paragraph_dedup packing bounds).
    """
    pack = 1 << 21
    c = cdc_chunks(docs, text_col, id_col, window, mask)
    packed = F.col(id_col) * pack + F.col("chunk_idx")
    winners = c.groupBy("h").agg(F.min(packed).alias("w"))
    kept = (
        c.join(winners, "h")
        .where(packed == F.col("w"))
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("chunk_idx", "start", "chunk_len"))
            ).alias("_rs"),
            F.count("*").alias("n_kept"),
            F.sum("chunk_len").alias("kept_chars"),
        )
    )
    cleaned = F.expr(
        f"aggregate(coalesce(_rs, array()), '', (acc, r) -> "
        f"concat(acc, substring({text_col}, cast(r.start + 1 as int), "
        f"cast(r.chunk_len as int))))"
    )
    n_chunks = (
        c.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    )
    return (
        docs.where(F.length(text_col) > 0)
        .join(kept, id_col, "left")
        .join(n_chunks, id_col)
        .select(
            id_col,
            F.length(text_col).cast("long").alias("total_chars"),
            F.coalesce("kept_chars", F.lit(0)).cast("long").alias("kept_chars"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.md5(cleaned).alias("cleaned_md5"),
        )
    )


# --- Bloom-prefiltered decontamination ----------------------------------------
#
# decontaminate_overlap broadcasts the holdout's EXACT distinct-shingle set —
# right when the holdout is a benchmark suite (MBs). When the "holdout" is
# itself corpus-sized (a full eval-suite union, a previous crawl), the exact
# hash relation no longer fits an executor; the classic remedy is a Bloom
# filter: ~10 bits/element instead of the string bytes, probed in place.
# Spark's internal BloomFilterAggregate is not in the public function
# registry (probed round 4), so the bitmap is built HERE from public
# expressions: double-hashed bit positions -> per-word bit_or partials ->
# one (array<bigint>) row, broadcast, probed with shift/AND arithmetic.
# The final output stays EXACT: bloom false positives are removed by a
# confirm join against the true shingle set — which now sees only the
# pruned candidate stream, so it can be a shuffle join instead of a
# broadcast (the plan shape the premise requires).


def bloom_bitmap(
    keys: DataFrame,
    col: str = "shingle",
    n_bits: int = 1 << 17,
    n_hashes: int = 2,
) -> DataFrame:
    """ONE-ROW DataFrame (bits: array<bigint>, n_bits words*64) — a Bloom
    bitmap over `keys[col]`, built distributed: positions via double
    hashing (h1 + j*h2, the Kirsch-Mitzenmacher construction), per-64-bit-
    word bit_or partial aggregation (map-side combine), then a single-row
    assembly. The bitmap travels as DATA (broadcast join), never as a
    plan literal."""
    assert n_bits % 64 == 0
    n_words = n_bits // 64
    # reduce each hash mod n_bits BEFORE combining: h1 + j*h2 on raw
    # xxhash64 values overflows int64 (ANSI mode rejects it), and
    # (a + j*b) mod M == ((a mod M) + j*(b mod M)) mod M
    h1 = f"pmod(xxhash64({col}), {n_bits}L)"
    h2 = f"pmod(xxhash64({col}, 1099511628211L), {n_bits}L)"
    pos = (
        f"transform(sequence(0, {n_hashes - 1}), "
        f"j -> pmod({h1} + j * {h2}, {n_bits}L))"
    )
    words = (
        keys.select(F.explode(F.expr(pos)).alias("p"))
        .select(
            F.expr("p div 64").alias("widx"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("widx", "bits")))
        ).alias("_m")
    ).select(
        F.expr(
            f"transform(sequence(0L, {n_words - 1}L), "
            f"w -> coalesce(element_at(_m, w), 0L))"
        ).alias("bits")
    )


def bloom_might_contain(
    col: str, bits_col: str = "bits", n_bits: int = 1 << 17, n_hashes: int = 2
) -> F.Column:
    """JVM probe predicate: every double-hashed position's bit is set."""
    h1 = f"pmod(xxhash64({col}), {n_bits}L)"
    h2 = f"pmod(xxhash64({col}, 1099511628211L), {n_bits}L)"
    return F.expr(
        f"forall(sequence(0, {n_hashes - 1}), j -> "
        f"(shiftright(element_at({bits_col}, "
        f"cast(pmod({h1} + j * {h2}, {n_bits}L) div 64 as int) + 1), "
        f"cast(pmod({h1} + j * {h2}, {n_bits}L) % 64 as int)) & 1) = 1)"
    )


def decontaminate_overlap_bloom(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 5,
    min_shared: int = 1,
    n_bits: int = 1 << 17,
    n_hashes: int = 2,
) -> DataFrame:
    """decontaminate_overlap for holdouts too large to broadcast exactly:
    broadcast a Bloom BITMAP (~n_bits/8 bytes regardless of shingle
    length), prune the training shingle stream in place, then confirm the
    survivors with an exact shuffle join (hinted SHUFFLE_HASH — the
    premise is the holdout must not be broadcast). Output is IDENTICAL to
    decontaminate_overlap: the bloom only prunes, the confirm join
    removes its false positives — so the same SQL oracle gates both.
    Size n_bits ~ 10x the holdout's distinct-shingle count for ~1% fpp."""

    def _shingles(df):
        toks = f"split(lower({text_col}), ' ')"
        return df.where(
            F.expr(f"size({toks})") >= shingle_words
        ).select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(0, size({toks})-{shingle_words}), "
                    f"i -> array_join(slice({toks}, i+1, {shingle_words}), ' ')))"
                )
            ).alias("shingle"),
        )

    hold_sh = _shingles(holdout).select("shingle").distinct()
    bm = bloom_bitmap(hold_sh, "shingle", n_bits, n_hashes)
    cand = (
        _shingles(train)
        .join(F.broadcast(bm))  # 1-row bitmap
        .where(bloom_might_contain("shingle", "bits", n_bits, n_hashes))
        .drop("bits")
    )
    return (
        cand.join(hold_sh.hint("shuffle_hash"), "shingle")
        .groupBy(F.col("doc").alias(id_col))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def split_leakage_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 5,
    valid_frac: float = 0.05,
    test_frac: float = 0.05,
) -> DataFrame:
    """Cross-split contamination audit: after the deterministic md5-bucket
    train/valid/test assignment (operators/sampling.py:split_assign), how
    much of the TRAIN split leaks into each holdout split through shared
    word shingles — the pre-training sign-off report that composes the
    split assigner with the decontamination shingle probe. One row per
    holdout split: distinct leaky train docs, distinct shared shingles,
    and the leaky fraction of the train split.

    Scale shape mirrors decontaminate_overlap: the holdout shingle set
    (valid+test are a few percent of the corpus) collapses to a DISTINCT
    (split, shingle) relation and broadcasts; train shingles are
    array_distinct'ed per doc before the explode and probe it in place.
    The report aggregate is 2 rows."""
    from .sampling import split_assign

    d = split_assign(docs, valid_frac, test_frac, key_col=id_col)
    toks = f"split(lower({text_col}), ' ')"
    sh = F.explode(
        F.expr(
            f"array_distinct(transform(sequence(0, size({toks})-{shingle_words}), "
            f"i -> array_join(slice({toks}, i+1, {shingle_words}), ' ')))"
        )
    ).alias("shingle")
    long_enough = F.expr(f"size({toks})") >= shingle_words
    hold = F.broadcast(
        d.where((F.col("split") != "train") & long_enough)
        .select("split", sh)
        .distinct()
    )
    train_sh = (
        d.where((F.col("split") == "train") & long_enough)
        .select(F.col(id_col).alias("doc"), sh)
    )
    per_split = (
        train_sh.join(hold, "shingle")
        .groupBy("split")
        .agg(
            F.countDistinct("doc").alias("n_leaky_train_docs"),
            F.countDistinct("shingle").alias("n_shared_shingles"),
        )
    )
    total = d.where(F.col("split") == "train").agg(
        F.count("*").alias("n_train")
    )
    return per_split.crossJoin(F.broadcast(total)).select(
        "split",
        "n_leaky_train_docs",
        "n_shared_shingles",
        F.round(F.col("n_leaky_train_docs") / F.col("n_train"), 6).alias(
            "leak_frac"
        ),
    )


def components_incremental(
    old_labels: DataFrame,
    new_pairs: DataFrame,
    new_nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Incremental near-dup clustering: fold a crawl increment's candidate
    pairs into EXISTING component labels without re-walking the old graph.

    Old components are contracted to their representative (the label IS
    the min member id, so reps of distinct old components are distinct
    nodes), increment edges are rewritten onto reps, and min-label
    propagation runs over that DELTA graph only — iteration cost scales
    with the increment, not the corpus. Because every rep is already the
    minimum of its old component and new docs rep themselves, the min
    label reachable over the contracted graph equals the min doc id
    reachable over the full (old ∪ new) edge set: the result is exactly
    the from-scratch clustering, which is how the contract oracle checks
    it (same recursive-CTE fixpoint as docs_dup_components).

    Scale shape: at 10^12 docs `old_labels` is a persisted table bucketed
    on id; the two corpus-sized operations are the rep-lookup join for
    the increment's edge endpoints (increment-driven, shuffle-one-side)
    and the final label-update join keyed by rep. Everything iterative
    touches only the contracted delta graph."""
    old = old_labels.select(
        F.col(id_col).alias("id"), F.col("component_id").alias("rep")
    )
    # a re-crawled doc appears in BOTH old_labels and new_nodes: it must
    # keep its old rep (one row per id — a naive union would hand it two
    # conflicting reps and the final join would emit both), and its new
    # edges then rewrite onto that old rep, which is exactly the
    # from-scratch connectivity
    fresh = new_nodes.select(F.col(id_col).alias("id")).join(
        old, "id", "left_anti"
    )
    base = old.unionByName(
        fresh.select("id", F.col("id").cast("long").alias("rep"))
    )
    rewritten = (
        new_pairs.select(F.col(a_col).alias("ea"), F.col(b_col).alias("eb"))
        .join(base.select(F.col("id").alias("ea"), F.col("rep").alias("ra")), "ea")
        .join(base.select(F.col("id").alias("eb"), F.col("rep").alias("rb")), "eb")
        .where(F.col("ra") != F.col("rb"))
        .select(F.col("ra").alias(a_col), F.col("rb").alias(b_col))
        .distinct()
    )
    reps = base.select(F.col("rep").alias(id_col)).distinct()
    delta = connected_components(
        rewritten, reps, id_col=id_col, a_col=a_col, b_col=b_col, max_iter=max_iter
    )
    return base.join(
        delta.select(F.col(id_col).alias("rep"), "component_id"), "rep"
    ).select(F.col("id").alias(id_col), "component_id")


def word_shingle_array_sql(
    toks_col: str, shingle_words: int, hash_shingles: bool = True
) -> str:
    """SQL for the DISTINCT word-shingle array over a pre-projected token
    array column — the one spelling shared by batch increment_novelty and
    the streaming novelty monitor (pipeline.window_novelty_stream /
    index_shingle_table), so the 'same shingling' batch==stream contract
    cannot drift. Callers must project split(lower(text), ' ') ONCE per
    row into `toks_col` first: higher-order-function lambdas are
    interpreted and do not hoist loop-invariant subexpressions, so
    inlining the split would re-tokenize the document per shingle index
    (O(tokens^2) on the hot path)."""
    sh = f"array_join(slice({toks_col}, i + 1, {shingle_words}), ' ')"
    if hash_shingles:
        sh = f"xxhash64({sh})"
    return (
        f"array_distinct(transform(sequence(0, size({toks_col}) - {shingle_words}), "
        f"i -> {sh}))"
    )


def increment_novelty(
    new_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    hash_shingles: bool = True,
) -> DataFrame:
    """Per-increment-doc NOVELTY against the existing corpus: of a new
    doc's distinct word `shingle_words`-grams, how many were never seen
    in the index — the daily corpus-growth signal (a crawl whose novelty
    collapses is re-fetching what it already has; a doc with ~0 novelty
    is a near-dup the MinHash pass will confirm). The incremental
    companion to `decontaminate_overlap`, with the roles flipped: here
    the REFERENCE side is the 10^12-doc index, so its shingle set cannot
    broadcast — novelty is a left_anti join on the shingle key, i.e. a
    bucketed probe of the persisted index shingle table (at 100 TB that
    table is bucketed by shingle hash and the daily increment probes it
    shuffle-one-side, the incremental_minhash_pairs shape).

    `hash_shingles` carries shingles as xxhash64 longs (8 bytes vs the
    joined string) — the oracle-gated contract call pins it explicitly
    per the round-3 advice on mutable defaults. Returns
    (id, n_shingles, n_novel, novelty_frac round 6) for every increment
    doc with at least one shingle."""
    def _sh(df):
        return df.select(
            F.col(id_col).alias("doc"),
            F.expr(f"split(lower({text_col}), ' ')").alias("toks"),
        ).where(F.expr("size(toks)") >= shingle_words).select(
            "doc",
            F.explode(
                F.expr(word_shingle_array_sql("toks", shingle_words, hash_shingles))
            ).alias("shingle"),
        )

    new_sh = _sh(new_docs)
    index_sh = _sh(index_docs).select("shingle").distinct()
    totals = new_sh.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    novel = (
        new_sh.join(index_sh, "shingle", "left_anti")
        .groupBy("doc")
        .agg(F.count("*").alias("n_novel"))
    )
    return (
        totals.join(novel, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0))
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty_frac"),
        )
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    tau_num: int = 2,
    tau_den: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    cluster the embeddings with the trained fixed-point k-means
    (`cluster.kmeans_fit`), then inside each cell mark every vector that has
    an EARLIER-id cell-mate with cosine similarity >= tau as a semantic
    duplicate — the repo's keep-first convention (`dedup_spans_keep_first`),
    deterministic where the paper's random-representative choice is not.
    Returns (id, cell, kept int 0/1).

    Oracle-exact cosine thresholding without a single float: with quantized
    vectors (cluster.SCALE), cos(a,b) >= tau_num/tau_den iff
        dot(fa,fb) > 0  AND  tau_den^2 * dot^2 >= tau_num^2 * |fa|^2 * |fb|^2,
    all integer products. dot, |f|^2 <= d * SCALE^2 * |v|_max^2 ~ 6.4e13 for
    unit-norm d=64, so the cubic-ish products reach ~1e29 — past int64 but
    exact in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), which is what both
    sides compare in. No rounding anywhere -> the kept/removed partition is
    bit-identical across engines and any partitioning.

    100 TB shape: the whole point of SemDeDup's clustering is that the
    O(cell^2) pair scan is bounded — k grows with the corpus (the paper uses
    n/k ~ 10^4 at web scale) so `cell` is a fine-grained shuffle key and the
    per-cell candidate sets stay small. Plan: one narrow JVM assignment pass
    (centroids are plan literals; the quantized frame is localCheckpoint-
    pinned so the fit and the assignment quantize the corpus exactly once),
    then ONE shuffle on `cell` into a per-cell vectorized pair scan
    (`applyInPandas`). Full-corpus text never moves; only (id, cell, fv)
    rows — one quantized copy of the embeddings — cross the wire.

    Why the pair scan is an Arrow boundary and not a self-join: the
    equivalent DataFrame form (equi-join on cell + zip_with/aggregate dot
    per pair + DECIMAL(38,0) threshold) evaluates an interpreted
    higher-order lambda per candidate pair — HOFs are CodegenFallback — and
    four BigDecimal multiplies per survivor; measured 4-6 s at sf0.1
    (250k pairs) vs ~0.3 s for the per-cell integer GEMM below. This is the
    `linalg.pca` Gramian precedent: O(cell^2 * d) dense integer arithmetic
    is exactly what the built-in operators can't express efficiently.

    Exactness is unchanged from the DECIMAL form:
    - dots are computed with an int64 matmul, exact under the documented
      budget d * max|fx|^2 < 2^63 (asserted per cell, not assumed);
    - the tau comparison den2*dot^2 >= num2*|fa|^2*|fb|^2 (~1e29, past
      int64) first runs in float64 with a certainty band: each side incurs
      <= 3 roundings from exactly-representable int64 inputs (< 2^53), so
      relative error < 1e-15 — when the sides differ by > 1e-9 relative the
      float verdict provably equals the integer one. Only ambiguous pairs
      (exact ties from true duplicates, essentially) are re-checked in
      Python arbitrary-precision ints — the very arithmetic the streaming
      twin (`streaming/semdedup.py`) and the HUGEINT oracle use. The
      kept/removed partition is bit-identical across engines and
      partitionings."""
    import numpy as np
    import pandas as pd

    from . import cluster as C

    q0 = C.quantize(emb, id_col, vec_col).localCheckpoint(eager=True)
    if centroids is None:
        # pass pretrained centroids to skip the fit (the streaming twin and
        # any assign-only rerun share one quantizer, as at real scale)
        centroids, _ = C.kmeans_fit(
            emb, k, n_iter, id_col, vec_col, with_inertia=False,
            _quantized=q0,
        )
    base = C._assign(q0, centroids, id_col, keep_fv=True).select(
        F.col(id_col).alias("vid"), "cell", "fv"
    )
    num2, den2 = tau_num * tau_num, tau_den * tau_den

    def scan_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        # keep-first needs a total order; mergesort = stable, deterministic
        pdf = pdf.sort_values("vid", kind="mergesort")
        fm = np.array([np.asarray(v, dtype=np.int64) for v in pdf["fv"]])
        n, d = fm.shape
        mx = int(np.abs(fm).max()) if n else 0
        if mx and d * mx * mx >= 2**63:  # int64 dot budget (docstring)
            raise OverflowError(
                f"semdedup: |fv| max {mx} at d={d} exceeds the exact int64 "
                "dot budget; lower cluster.SCALE"
            )
        n2 = (fm * fm).sum(axis=1)
        n2f = n2.astype(np.float64)
        removed = np.zeros(n, dtype=bool)
        blk = 256  # bounds the G block at blk * cell_size int64s
        for a in range(1, n, blk):
            b = min(a + blk, n)
            g = fm[a:b] @ fm.T  # exact int64 dots, rows a..b vs all
            lo = np.arange(a, b)[:, None] > np.arange(n)[None, :]
            pos = (g > 0) & lo  # only earlier-id cell-mates count
            lhs = den2 * g.astype(np.float64) ** 2
            rhs = num2 * n2f[a:b, None] * n2f[None, :]
            hit = pos & (lhs >= rhs * (1.0 + 1e-9))
            amb = pos & ~hit & (lhs > rhs * (1.0 - 1e-9))
            for i, j in zip(*np.nonzero(amb)):
                dd = int(g[i, j])
                if den2 * dd * dd >= num2 * int(n2[a + i]) * int(n2[j]):
                    hit[i, j] = True
            removed[a:b] = hit.any(axis=1)
        return pd.DataFrame(
            {
                "vid": pdf["vid"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "kept": np.where(removed, 0, 1).astype(np.int32),
            }
        )

    return (
        base.groupBy("cell")
        .applyInPandas(scan_cell, schema="vid long, cell int, kept int")
        .select(F.col("vid").alias(id_col), "cell", "kept")
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash_grams: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken 2003,
    the MOSS algorithm): hash every k-char gram of lower(text), slide a
    w-hash window, select each window's minimum (rightmost on ties), and
    keep the distinct (position, hash) selections. The winnowing
    guarantee: any substring of length >= k + w - 1 shared by two
    documents yields at least one shared fingerprint — POSITIONAL local
    overlap detection, between SimHash (global signature, no locality)
    and CDC chunk dedup (exact chunks only) in the near-dup ladder.

    Everything up to the output explode is per-row JVM array HOFs (gram
    hashing reuses _shingle_hashes' md5 convention so the oracle replays
    it; the per-window min+rightmost-argmin is ONE aggregate fold with a
    struct accumulator and a finish lambda) — zero shuffle, work linear
    in corpus bytes * w. Docs shorter than k + w - 1 grams' worth of text
    are fenced out (no full window exists; the guarantee above is empty
    for them anyway). Output: (doc, pos, fp), distinct by construction.

    ``hash_grams="xxh"`` is the throughput twin for the real 100 TB path
    (the minhash_signatures_fast convention): xxhash64 costs a few cycles
    per gram where md5 runs a full digest — md5 is the default only
    because DuckDB can recompute it. Identical selection/window/tie
    semantics, different hash values, so it is property-tested (the
    shared-substring guarantee and dup invariance hold for any gram
    hash) rather than oracle-gated.
    """
    if hash_grams == "xxh":
        grams = F.expr(
            f"transform(sequence(0, length({text_col})-{k}), p -> "
            f"pmod(xxhash64(substring(lower({text_col}), p+1, {k})), "
            f"4294967296))"
        )
    else:
        grams = _shingle_hashes(f"lower({text_col})", k)
    sel = (
        f"array_distinct(transform(sequence(0, size(_hs) - {w}), j -> "
        f"aggregate("
        f"zip_with(slice(_hs, j + 1, {w}), sequence(0, {w - 1}), "
        f"(h, i) -> named_struct('h', h, 'i', i)), "
        f"named_struct('fp', cast(null as bigint), 'pos', -1), "
        f"(acc, x) -> IF(acc.fp IS NULL OR x.h <= acc.fp, "
        f"named_struct('fp', x.h, 'pos', x.i), acc), "
        f"r -> named_struct('pos', j + r.pos, 'fp', r.fp))))"
    )
    return (
        docs.where(F.length(text_col) >= k + w - 1)
        .select(
            F.col(id_col).alias("doc"),
            grams.alias("_hs"),
        )
        .select("doc", F.explode(F.expr(sel)).alias("s"))
        .select(
            "doc",
            F.col("s.pos").cast("long").alias("pos"),
            F.col("s.fp").alias("fp"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    max_df: int = 20,
    min_containment: float = 0.5,
    hash_grams: str = "md5",
) -> DataFrame:
    """Local-overlap candidate pairs over the winnowing fingerprint index:
    two docs pair when they share rare fingerprints (document frequency
    <= max_df — the same inverted-index bound the shingle-Jaccard path
    uses, so boilerplate fingerprints can't explode the join) covering
    >= min_containment of the smaller doc's fingerprint set. Catches
    partial-copy/quotation overlap that whole-doc Jaccard dilutes away.

    Scale shape: distinct (doc, fp) is narrow (array_distinct before the
    explode); the pair join is bucketed on the fingerprint hash; staged
    subtrees feed the rare-filter build, both join sides, and the
    per-doc sizes without re-exploding the corpus.
    """
    from ..staging import stage_scoped

    fps = stage_scoped(
        winnow_fingerprints(docs, text_col, id_col, k, w, hash_grams).select(
            "doc", "fp"
        ).distinct(),
        "winnow_fps",
    )
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp")
    )
    rfps = fps.join(rare, "fp")
    sizes = rfps.groupBy("doc").agg(F.count("*").alias("n_fp"))
    a = rfps.select(F.col("doc").alias("doc_a"), "fp")
    b = rfps.select(F.col("doc").alias("doc_b"), "fp")
    common = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        common.join(
            sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_fp", "n_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_fp", "n_b"),
            "doc_b",
        )
        .withColumn(
            "containment",
            F.round(F.col("n_shared") / F.least("n_a", "n_b"), 6),
        )
        .where(F.col("containment") >= min_containment)
    )
    return out.select("doc_a", "doc_b", "n_shared", "containment")


# =============================================================================
# exact Jaccard threshold join via prefix filtering (AllPairs / PPJoin)
# =============================================================================


def jaccard_threshold_join(
    docs: DataFrame,
    tau_num: int = 1,
    tau_den: int = 2,
    shingle_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity join: every pair of documents whose word-shingle
    sets have Jaccard >= tau_num/tau_den — no recall cap, unlike the
    MinHash-LSH and rare-shingle paths (whose misses are probabilistic /
    df-bounded respectively). The candidate generator is the prefix filter
    of AllPairs/PPJoin (Bayardo et al. WWW'07; Xiao et al. WWW'08):

    order the shingle universe by ascending document frequency (rarest
    first, ties by value); a doc with n shingles exposes only its first
    n - ceil(tau*n) + 1 shingles in that order as its PREFIX. Two sets
    with Jaccard >= tau must overlap in >= ceil(tau*max(|A|,|B|))
    elements, so skipping the last ceil(tau*n)-1 positions cannot skip
    every shared element: any qualifying pair shares >= 1 PREFIX shingle.
    Candidates = the inverted-index self-join on prefix shingles only;
    each candidate is then verified with exact integer counts
    (inter * tau_den >= tau_num * union — no float ever decides).

    Scale shape: the prefix keeps exactly the RAREST shingles of each doc,
    so the candidate join's key distribution is anti-skewed by
    construction (the boilerplate shingles that blow up naive
    shingle-joins are precisely the ones the prefix drops); ceil() is
    integer arithmetic ((n*num + den - 1) DIV den), the per-doc ordering
    is one row_number window partitioned by doc (bounded partitions), and
    verification joins on pair keys. All shuffles are key-bucketed; no
    cartesian anywhere (plan-tested).

    Returns (doc_a, doc_b, n_inter, n_union, jaccard) with doc_a < doc_b,
    ordered by (doc_a, doc_b); jaccard rounded to 6 dp.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError(f"tau must be in (0, 1]: {tau_num}/{tau_den}")
    from pyspark.sql import Window

    # token array staged in its own projection: referenced twice below, so
    # CollapseProject keeps it materialized (no per-element re-tokenize),
    # and short docs guard the sequence() (sequence(0,-1) DESCENDS in
    # Spark: [0,-1] -> slice start 0 -> runtime error; the CASE mirrors
    # the oracle's WHERE len >= shingle_words)
    sh = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.expr(f"filter(split(lower({text_col}), ' '), x -> x <> '')").alias(
                "_toks"
            ),
        )
        .select(
            "doc",
            F.explode(
                F.expr(
                    f"CASE WHEN size(_toks) >= {shingle_words} THEN "
                    f"array_distinct(transform(sequence(0, size(_toks) - {shingle_words}), "
                    f"i -> array_join(slice(_toks, i + 1, {shingle_words}), ' '))) "
                    f"ELSE array() END"
                )
            ).alias("s"),
        )
    )
    from ..staging import stage_scoped

    sh = stage_scoped(sh, "ppjoin_sh")
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    sized = sh.groupBy("doc").agg(F.count("*").alias("n"))
    # prefix length uses integer ceil: (n*num + den - 1) DIV den
    ranked = (
        sh.join(dfreq, "s")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc").orderBy("df", "s")),
        )
        .join(sized, "doc")
        .where(
            F.expr(
                f"rn <= n - (n * {tau_num} + {tau_den} - 1) DIV {tau_den} + 1"
            )
        )
        .select("doc", "s")
    )
    l, r = ranked.alias("l"), ranked.alias("r")
    cand = (
        l.join(r, (F.col("l.s") == F.col("r.s")) & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )
    inter = (
        cand.join(sh.select(F.col("doc").alias("doc_a"), "s"), "doc_a")
        .join(sh.select(F.col("doc").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    na = sized.select(F.col("doc").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sized.select(F.col("doc").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("n_union", (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("long"))
        .where(F.col("n_inter") * tau_den >= F.lit(tau_num) * F.col("n_union"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            F.round(F.col("n_inter") / F.col("n_union"), 6).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
