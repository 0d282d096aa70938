"""Sequence packing for LLM pretraining: concat-and-split of tokenized
documents into fixed-length training blocks (the GPT-style packing that
`token_chunks` — per-doc chunking — deliberately does not do).

The primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM over a global document
order. The naive Spark expression, ``sum(tok) OVER (ORDER BY doc_id)``,
compiles to ``Exchange SinglePartition`` + one Window task — every row of a
100 TB corpus through one core. This module computes the identical values
with the classic segmented-scan decomposition:

1. group rows by an ORDER-ALIGNED key (``order_col DIV group_size`` —
   monotone in the order column, so group i's rows all precede group
   i+1's). One hash Exchange on the group key — the minimum data movement
   for any global running total, and deterministic (no range-sampler
   boundaries, so the plan is replay-stable and needs no caching).
2. per-group exclusive cumsum via a Window partitioned by the group key
   (same clustering as the Exchange — no second shuffle).
3. cross-group offsets: the per-group totals (ONE ROW PER GROUP) go
   through a single-partition running sum — fine, it is metadata-sized —
   and broadcast-join back onto the groups.

Scale shape: one full-data shuffle + one broadcast join; the only
SinglePartition exchange carries #groups rows. Group size trades skew
against tiny-side width; order keys without a cheap monotone bucketing
rule need a range rule from an approx-quantile sketch (same decomposition,
different step 1).

Packing semantics (``pack_sequences``): documents are laid end-to-end in
doc_id order on a token tape; block b of length ``seq_len`` covers tape
positions [b*L, (b+1)*L). Each document reports the block range it lands
in — first_block..last_block — and n_blocks (>1 means the doc straddles a
block boundary and will be split across training sequences). Token counts
use the BPE-ish regex tokenizer shared with `docs_token_counts` so the
DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.text import BPE_ISH_PATTERN


def running_offset(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "offset",
    group_size: int = 4096,
) -> DataFrame:
    """Adds ``out_col`` = sum of ``val_col`` over all rows STRICTLY before
    this one in ``order_col`` order (exclusive prefix sum). ``order_col``
    must be unique and numeric; ``group_size`` buckets it into the
    order-aligned segments of the scan (pick it so #rows/group_size lands
    in the hundreds-to-thousands of groups at the target scale)."""
    # integer `div`, not float-divide-then-cast: float division is exact for
    # power-of-two divisors only — near 2^53 a non-power-of-two group_size
    # could round across an integer boundary (same reason cluster._assign
    # uses integer div)
    grp = F.expr(f"cast({order_col} as bigint) div {int(group_size)}")
    d = df.withColumn("_grp", grp)
    w_in = Window.partitionBy("_grp").orderBy(order_col)
    d = d.withColumn(
        "_local", F.sum(val_col).over(w_in) - F.col(val_col)
    )
    totals = d.groupBy("_grp").agg(F.sum(val_col).alias("_tot"))
    w_across = (
        Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "_grp", F.coalesce(F.sum("_tot").over(w_across), F.lit(0)).alias("_goff")
    )
    return (
        d.join(F.broadcast(offs), "_grp")
        .withColumn(out_col, (F.col("_local") + F.col("_goff")).cast("long"))
        .drop("_grp", "_local", "_goff")
    )


def token_count_expr(text_col: str = "text") -> Column:
    """BPE-ish token count — the exact expression `with_token_counts` uses
    for bpe_tokens, shared so packing and counting cannot drift."""
    return F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
        )
    ).cast("long")


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_size: int = 4096,
) -> DataFrame:
    """Block placement of every non-empty document on the packed token
    tape: (id, n_tok, tok_offset, first_block, last_block, n_blocks).
    A materializing packer would follow with one explode over the block
    range + groupBy(block) concat; the placement table is the shuffle-
    and arithmetic-complete part (and what an oracle can verify)."""
    toks = docs.select(
        F.col(id_col), token_count_expr(text_col).alias("n_tok")
    ).where(F.col("n_tok") > 0)
    return place_token_counts(
        toks, seq_len=seq_len, id_col=id_col, group_size=group_size
    )


def place_token_counts(
    toks: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    group_size: int = 4096,
) -> DataFrame:
    """The tokenizer-agnostic half of packing: block placement from an
    (id, n_tok) frame — so the regex counter (pack_sequences) and the real
    BPE counter (functions.bpe.bpe_token_counts) share one placement
    implementation. Drops n_tok <= 0 rows defensively."""
    placed = running_offset(
        toks.where(F.col("n_tok") > 0),
        order_col=id_col, val_col="n_tok", out_col="tok_offset",
        group_size=group_size,
    )
    first = F.expr(f"tok_offset div {int(seq_len)}")
    last = F.expr(f"(tok_offset + n_tok - 1) div {int(seq_len)}")
    return placed.select(
        id_col,
        "n_tok",
        "tok_offset",
        first.alias("first_block"),
        last.alias("last_block"),
        (last - first + 1).alias("n_blocks"),
    )


def pack_segments(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_size: int = 4096,
) -> DataFrame:
    """The materializing half of packing: one row per (block, doc) segment
    — which token slice of each document lands in which training block:
    (block_id, id, doc_tok_start, n_block_toks). A trainer groups by
    block_id and concatenates slices in doc order to build each sequence;
    every block holds exactly ``seq_len`` tokens except the final partial
    one (test-pinned). The explode is narrow (n_blocks rows per doc,
    corpus_tokens/seq_len rows total — a constant factor of the input);
    the grouping shuffle, if materialized, is one hash Exchange on
    block_id with near-perfect balance BY CONSTRUCTION (every key carries
    exactly seq_len tokens — packing is its own skew remedy)."""
    placed = pack_sequences(
        docs, seq_len=seq_len, text_col=text_col, id_col=id_col,
        group_size=group_size,
    )
    b = F.col("block_id")
    seg_start = F.greatest(F.lit(0), b * seq_len - F.col("tok_offset"))
    seg_end = F.least(
        F.col("n_tok"), (b + 1) * seq_len - F.col("tok_offset")
    )
    return (
        placed.select(
            id_col,
            "tok_offset",
            "n_tok",
            F.explode(F.sequence("first_block", "last_block")).alias("block_id"),
        )
        .select(
            "block_id",
            id_col,
            seg_start.cast("long").alias("doc_tok_start"),
            (seg_end - seg_start).cast("long").alias("n_block_toks"),
        )
    )


def span_corruption_plan(
    docs: DataFrame,
    block: int = 10,
    span_len: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5-style span-corruption mask plan (Raffel et al. 2020): for each
    document, a deterministic set of NON-OVERLAPPING token spans to mask
    for the denoising objective. The corruption rate is span_len/block
    (default 3/10 of blocks touched at one span each ~ 15% tokens when
    half the blocks qualify... the exact rate is a pure function of the
    parameters and doc length, reported per row).

    Non-overlap without sequential scanning: the token tape is cut into
    fixed `block`-token blocks and each block hosts AT MOST ONE span,
    offset inside the block by md5(doc_id:block) — so spans cannot
    collide BY CONSTRUCTION, membership is a pure function of
    (doc_id, block) (rerun/resume/repartition-stable, the md5-sampling
    convention), and the plan is one narrow HOF projection + explode,
    zero shuffle, replayable in ANSI SQL. Blocks shorter than span_len
    (the tail) host no span.

    Returns (doc_id, span_id, span_start, span_text) with span_start a
    0-based token index and span_id the block index — the (input, target)
    pair builder downstream groups by doc_id and stitches sentinel ids in
    span_id order."""
    if span_len < 1 or block < span_len:
        raise ValueError(f"need 1 <= span_len <= block, got {span_len}/{block}")
    # per block b: offset = md5(doc:b) % (block - span_len + 1); start =
    # b*block + offset; emit only if the whole span fits the doc. The
    # token array is staged in its own projection first (referenced by
    # sequence bound, fit filter, and the slice) so the lambda never
    # re-tokenizes the text per block.
    spans = (
        f"filter(transform(sequence(0, size(_toks) DIV {block}), b -> "
        f"named_struct('span_id', cast(b as bigint), 'span_start', "
        f"cast(b * {block} + pmod(cast(conv(substr(md5(concat(cast({id_col} as string), ':', cast(b as string))), 1, 8), 16, 10) as bigint), {block - span_len + 1}) as bigint))), "
        f"s -> s.span_start + {span_len} <= size(_toks))"
    )
    return (
        docs.select(
            F.col(id_col),
            F.expr(f"filter(split(lower({text_col}), ' '), x -> x <> '')").alias(
                "_toks"
            ),
        )
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.explode(F.expr(spans)).alias("s"),
        )
        .select(
            id_col,
            F.col("s.span_id").alias("span_id"),
            F.col("s.span_start").alias("span_start"),
            F.expr(
                f"array_join(slice(_toks, cast(s.span_start as int) + 1, {span_len}), ' ')"
            ).alias("span_text"),
        )
        .orderBy(id_col, "span_id")
    )
