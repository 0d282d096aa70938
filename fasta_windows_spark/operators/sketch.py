"""Count-min sketch: sublinear heavy-hitter detection for token streams.

The sketch is a depth x width counter table — a few KB regardless of corpus
size — with the one-sided guarantee estimate >= exact count. It is exactly
the structure a 100 TB token-frequency pass wants: each partition builds its
partial table map-side (the groupBy(row, bucket) partial aggregate IS the
per-partition sketch; counter tables merge by cell-wise addition, which is
what the final aggregate performs), and candidate lookups probe the finished
table as a broadcast join. Hashing uses the repo's portable 32-bit-md5 +
linear-permutation scheme (operators/dedup.py MINHASH convention) so the
whole sketch is integer-exact and replayable in ANSI SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CMS_P = 1_000_000_007
# pairwise-independent-ish linear permutations over the md5 token hash, one
# per sketch row (the MINHASH_PERMS convention with different constants)
CMS_PERMS = [(2 * i + 3, 101 * i + 17) for i in range(8)]


def _tok_hash(col: str) -> F.Column:
    """32-bit md5 integer of a token (portable: DuckDB spells it
    ('0x'||substr(md5(t),1,8))::BIGINT)."""
    return F.expr(f"cast(conv(substr(md5({col}),1,8),16,10) as bigint)")


def _bucket_array(depth: int, width: int) -> F.Column:
    return F.array(
        *[
            (F.lit(a) * F.col("h") + F.lit(b)) % CMS_P % width
            for a, b in CMS_PERMS[:depth]
        ]
    )


def cms_sketch(
    docs: DataFrame, text_col: str = "text", width: int = 32, depth: int = 4
) -> DataFrame:
    """Build the depth x width counter table over whitespace tokens of
    lower(text). One corpus pass: explode tokens -> depth (row, bucket)
    pairs -> partial+final count aggregate. Output is depth*width rows at
    most — broadcastable by construction."""
    toks = docs.select(F.explode(F.split(F.lower(text_col), " ")).alias("tok"))
    pairs = toks.select(_tok_hash("tok").alias("h")).select(
        F.posexplode(_bucket_array(depth, width)).alias("row", "bucket")
    )
    return pairs.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimates(
    candidates: DataFrame,
    sketch: DataFrame,
    tok_col: str = "tok",
    width: int = 32,
    depth: int = 4,
) -> DataFrame:
    """CMS point queries: estimate(token) = min over sketch rows of the
    counter at that row's bucket. The sketch broadcasts; candidates fan
    out to depth rows each and fold back with a min — candidate-sized
    work, never corpus-sized."""
    probes = candidates.select(
        F.col(tok_col), _tok_hash(tok_col).alias("h")
    ).select(
        tok_col, F.posexplode(_bucket_array(depth, width)).alias("row", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(tok_col)
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 32,
    depth: int = 4,
    frac: int = 50,
) -> DataFrame:
    """End-to-end heavy hitters: tokens whose CMS ESTIMATE is at least
    1/frac of the total token count, with the exact count alongside so
    the sketch's one-sided error (est_cnt >= exact_cnt, inflated only by
    bucket collisions) is visible per row. The candidate set is the
    distinct-token vocabulary (vocabulary-sized, not corpus-sized); the
    selection threshold is a 1-row scalar broadcast."""
    toks = docs.select(F.explode(F.split(F.lower(text_col), " ")).alias("tok"))
    sketch = cms_sketch(docs, text_col, width, depth)
    exact = toks.groupBy("tok").agg(F.count("*").cast("long").alias("exact_cnt"))
    est = cms_estimates(exact, sketch, "tok", width, depth)
    total = toks.agg((F.count("*") / frac).alias("thresh"))
    return (
        est.join(exact, "tok")
        .crossJoin(F.broadcast(total))
        .where(F.col("est_cnt") >= F.col("thresh"))
        .select("tok", "est_cnt", "exact_cnt")
    )


# =============================================================================
# exact threshold heavy hitters (the batch face of streaming/topk.py)
# =============================================================================


def bigram_items(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-bigram item stream: 'tok_i tok_{i+1}' per adjacent token pair
    of lower(text), as one JVM HOF projection + explode (no Python). The
    SAME function feeds the batch face and the streaming Misra-Gries
    candidate pass, so the two operators count an identical item space."""
    # token array staged in its own projection: it is referenced four
    # times below, and subexpression elimination does NOT reach inside
    # lambda bodies — unstaged, every bigram position re-tokenized the
    # whole text (O(L^2) per doc). CollapseProject keeps a multi-use
    # non-cheap alias materialized, so this stays two projections.
    return docs.select(
        F.expr(f"filter(split(lower({text_col}), ' '), x -> x <> '')").alias(
            "_toks"
        )
    ).select(
        F.explode(
            F.expr(
                """CASE WHEN size(_toks) >= 2
                THEN transform(sequence(1, size(_toks) - 1),
                  i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))
                ELSE array() END"""
            )
        ).alias("item")
    )


def heavy_hitters_exact(
    docs: DataFrame, threshold: int = 45, text_col: str = "text"
) -> DataFrame:
    """EXACT threshold heavy hitters over word bigrams: every item with
    count >= threshold — the HAVING-shaped twin of cms_heavy_hitters'
    one-sided sketch and docs_top_tokens' top-k. One partial-aggregated
    groupBy; output (item, cnt) ordered (cnt DESC, item). This is also
    the ground truth the streaming Misra-Gries pass (streaming/topk.py)
    must reproduce exactly after its rescore."""
    return (
        bigram_items(docs, text_col)
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .orderBy(F.desc("cnt"), F.asc("item"))
    )


def char_ngram_items(docs: DataFrame, n: int = 4, text_col: str = "text") -> DataFrame:
    """Character n-gram item stream (the reference's own item space —
    fasta_windows' k-mers ARE char n-grams of the page text): one JVM
    substring transform + explode, no Python. Feeds the same
    heavy-hitter machinery as bigram_items."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return docs.select(
        F.explode(
            F.expr(
                f"""CASE WHEN length({text_col}) >= {n}
                THEN transform(sequence(1, length({text_col}) - {n - 1}),
                               i -> substring({text_col}, i, {n}))
                ELSE array() END"""
            )
        ).alias("item")
    )


# =============================================================================
# AMS second-moment (F2) sketch — join/self-join size estimation
# =============================================================================


def f2_moment(
    docs: DataFrame, d: int = 8, text_col: str = "text"
) -> DataFrame:
    """Second frequency moment F2 = sum_t count(t)^2 of the token stream —
    the self-join size, THE statistic a join planner wants before shuffling
    two token-keyed tables — computed two ways in one query:

    - EXACT: one partial-agg groupBy to per-token counts, one sum of
      squares (vocabulary-sized intermediate);
    - AMS sketch (Alon-Matias-Szegedy 1996): d estimators, each a single
      BIGINT X_i = sum_t sign_i(t) * count(t) with sign_i a +/-1 md5 hash;
      E[X_i^2] = F2. The sketch side needs NO vocabulary intermediate —
      d running sums, mergeable across partitions/streams (it is the
      linear-sketch complement to the CMS above: CMS answers point
      queries, AMS answers the quadratic aggregate).

    Everything is integer (signs, counts, squares; the estimate averages
    d squares with DIV), so both paths are hash-gateable and the reported
    error is a measured fact, not a float artifact. Returns ONE row:
    (n_tokens, f2_exact, f2_ams, err_ppm)."""
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    tok = docs.select(
        F.explode(
            F.expr(f"filter(split(lower({text_col}), ' '), x -> x <> '')")
        ).alias("t")
    )
    counts = tok.groupBy("t").agg(F.count("*").alias("c"))
    sign = lambda i: (  # noqa: E731
        f"(CASE WHEN cast(conv(substr(md5(concat(t, ':', '{i}')), 1, 8), 16, 10) as bigint) % 2 = 0 "
        f"THEN 1 ELSE -1 END)"
    )
    aggs = [
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"),
    ] + [
        F.sum(F.expr(f"{sign(i)} * c")).cast("long").alias(f"x_{i}")
        for i in range(d)
    ]
    row = counts.agg(*aggs)
    est = " + ".join(f"x_{i} * x_{i}" for i in range(d))
    return row.selectExpr(
        "n_tokens",
        "f2_exact",
        f"cast(({est}) DIV {d} as bigint) AS f2_ams",
        f"cast(abs(f2_exact - ({est}) DIV {d}) * 1000000 DIV f2_exact as bigint) AS err_ppm",
    )


def mg_threshold_certificate(
    docs: DataFrame, capacity: int = 64, n_shards: int = 4, text_col: str = "text"
) -> DataFrame:
    """The planning/certification query for the streaming Misra-Gries pass
    (streaming/topk.py): per-md5-shard item totals and the smallest
    threshold the MG bound certifies as COMPLETE — any item with count >
    max_shard N_shard/(capacity+1) is guaranteed in the shard summary, so
    thresholds >= certified_threshold make candidates-plus-rescore EXACT.
    Run it on yesterday's corpus to pick capacity/threshold for today's
    stream — in BOTH directions: certified_threshold is the best
    threshold the given capacity supports, capacity_needed_t45 is the
    per-shard capacity a threshold-45 pass would need. The test suite
    runs the same arithmetic per-run as a live certificate. One explode
    + one |shards|-row groupBy."""
    # the certificate is only sound if it shards EXACTLY like the
    # streaming pass — import the stream's own shard expression rather
    # than duplicating the string (review finding)
    from ..streaming.topk import _shard_col

    items = bigram_items(docs, text_col)
    per = items.select(_shard_col(n_shards).alias("shard")).groupBy("shard").agg(
        F.count("*").cast("long").alias("n_items")
    )
    return per.agg(
        F.sum("n_items").cast("long").alias("n_items"),
        F.max("n_items").cast("long").alias("max_shard_items"),
    ).selectExpr(
        "n_items",
        "max_shard_items",
        f"cast({capacity} as bigint) AS capacity",
        f"cast({n_shards} as bigint) AS n_shards",
        f"cast(max_shard_items DIV {capacity + 1} + 1 as bigint) AS certified_threshold",
        # inverse direction: the capacity that would certify threshold 45
        # (the docs_heavy_hitters_exact target): need T > N_s/(cap+1)
        f"cast(max_shard_items DIV 45 + 1 as bigint) AS capacity_needed_t45",
    )
