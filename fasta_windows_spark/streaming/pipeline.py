"""Structured Streaming graphs: the event-time re-expression of the
reference's windowed statistics (SURVEY.md §2.7, north_rule).

Hot path shape: watermark-bounded windowed hash-aggregate in the RocksDB
state store (partial aggregation before the shuffle is automatic for
streaming aggs), fed by JVM count expressions / Arrow-batched kernels —
zero per-row Python.

Sinks: the production target is an Iceberg table (exactly-once via
idempotent epoch commits); this sandbox has no Iceberg runtime jar, so the
tested sink is Spark's file sink (parquet + _spark_metadata transaction
log — the same exactly-once contract: batch commits are atomic and replay
is idempotent). ``sink_format()`` picks iceberg when available.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

LANG_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("detect_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source (sandbox stand-in for the Iceberg/ Kafka
    pages stream). maxFilesPerTrigger controls micro-batch granularity."""
    r = spark.readStream.schema(PAGE_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.option("latestFirst", "false").parquet(path)


def with_host(df: DataFrame) -> DataFrame:
    """id-trimming analog (entropy.rs:109-113): the grouping key is the
    url-host, extracted JVM-side."""
    return df.withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))


def _char_count(col: str, ch: str) -> F.Column:
    # occurrences of a literal char, case-folded — pure JVM expression
    base = F.length(col) - F.length(F.replace(F.col(col), F.lit(ch)))
    low = F.length(col) - F.length(F.replace(F.col(col), F.lit(ch.lower())))
    return (base + low).cast("long")


def positional_window_counts(
    df: DataFrame,
    window: int = 1000,
    id_cols: tuple = ("host", "warc_ts"),
    text_col: str = "text",
    chars: tuple = ("c", "g"),
) -> DataFrame:
    """JVM-expression twin of ``functions.udfs.window_stats`` for the count
    fields (win_len, cnt_*): positional tumbling windows via
    explode(sequence), per-window counts via substring + case-folded
    replace — whole-stage codegen end to end, ZERO Arrow/Python crossing.

    Why it exists: the round-3 scaling ledger (BENCH/BASELINE.md)
    attributed the stats-mode 2→8 efficiency gap largely to 0.39 GB of
    Arrow IPC crossing into Python per run (DRAM-bandwidth-sensitive, so
    it inflates disproportionately at higher core counts). For jobs whose
    downstream agg consumes only count fields, this path keeps the whole
    map side inside the JVM; the Arrow kernel path remains the one that
    can emit entropies/k-mer vectors. Window semantics are pinned to the
    kernel by tests (kernels.window_bounds: tumbling from 0, final window
    truncated, zero-length text yields no windows; counts fold case like
    stats_table's unmasked branch).

    Unit-of-length note: this path (and the SQL oracles) counts
    CHARACTERS — Spark/DuckDB length/substring are codepoint-based —
    while the Arrow kernel counts UTF-8 BYTES (the reference's u8
    contract, seq_statsu8.rs). The two coincide exactly on ASCII text
    (the reference's whole domain, and the engine's synthetic corpora);
    on multi-byte web text windows differ by design, pinned in
    tests/test_streaming.py::test_positional_window_counts_unicode_semantics.
    """
    w = int(window)
    d = (
        df.where(F.length(text_col) > 0)
        .withColumn(
            "w_start",
            F.explode(F.expr(f"sequence(0L, length({text_col}) - 1L, {w})")),
        )
        .withColumn(
            "_win",
            F.expr(f"substring({text_col}, cast(w_start + 1 as int), {w})"),
        )
    )
    out = [
        *id_cols,
        F.col("w_start"),
        (F.col("w_start") + F.length("_win")).cast("long").alias("w_end"),
        F.length("_win").cast("long").alias("win_len"),
    ]
    for ch in chars:
        cnt = (
            2 * F.length("_win")
            - F.length(F.replace(F.col("_win"), F.lit(ch.upper())))
            - F.length(F.replace(F.col("_win"), F.lit(ch.lower())))
        ).cast("long")
        out.append(cnt.alias(f"cnt_{ch.lower()}"))
    return d.select(*out)


def page_count_columns(
    df: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """Per-page associative state: length + case-folded ACGTN counts, as
    whole-stage-codegen JVM expressions (the streaming-merge unit; merging
    = summing these columns). `extra_cols` ride through (e.g. a salt key)."""
    return df.select(
        "host",
        "warc_ts",
        *extra_cols,
        F.length(text_col).cast("long").alias("n_chars"),
        _char_count(text_col, "A").alias("cnt_a"),
        _char_count(text_col, "C").alias("cnt_c"),
        _char_count(text_col, "G").alias("cnt_g"),
        _char_count(text_col, "T").alias("cnt_t"),
        _char_count(text_col, "N").alias("cnt_n"),
    )


def _entropy6_finisher() -> F.Column:
    """Closed-form 6-bin Shannon entropy from merged counts (column arith)."""
    ln = F.col("total_chars").cast("double")
    oth = (
        F.col("total_chars")
        - F.col("cnt_a")
        - F.col("cnt_c")
        - F.col("cnt_g")
        - F.col("cnt_t")
        - F.col("cnt_n")
    ).cast("double")
    terms = []
    for c in ("cnt_a", "cnt_c", "cnt_g", "cnt_t", "cnt_n"):
        x = F.col(c).cast("double")
        terms.append(F.when(x > 0, (x / ln) * F.log2(x / ln)).otherwise(0.0))
    terms.append(F.when(oth > 0, (oth / ln) * F.log2(oth / ln)).otherwise(0.0))
    return -sum(terms[1:], start=terms[0])


def _finish_host_window(agg: DataFrame) -> DataFrame:
    """Shared finisher: scalar stats from merged (w, host) count columns."""
    gc_den = (F.col("cnt_g") + F.col("cnt_c") + F.col("cnt_a") + F.col("cnt_t")).cast(
        "double"
    )
    return agg.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        "host",
        "n_pages",
        "total_chars",
        "cnt_a",
        "cnt_c",
        "cnt_g",
        "cnt_t",
        "cnt_n",
        F.round(_entropy6_finisher(), 6).alias("entropy6_merged"),
        F.round(
            (F.col("cnt_g") + F.col("cnt_c")).cast("double") / F.nullif(gc_den, F.lit(0)),
            6,
        ).alias("gc_prop"),
    )


_SUM_COLS = ("total_chars", "cnt_a", "cnt_c", "cnt_g", "cnt_t", "cnt_n")


def host_window_stats(
    pages: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time windowed aggregation keyed by url-host:
    the F.window analog of chunks(window_size) (fw.rs:83). Append-mode
    emission once the watermark passes the window end; late rows dropped."""
    p = with_host(pages).withWatermark("warc_ts", watermark)
    counts = page_count_columns(p)
    win = F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    agg = counts.groupBy(win.alias("w"), "host").agg(
        F.count("*").alias("n_pages"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("cnt_a").alias("cnt_a"),
        F.sum("cnt_c").alias("cnt_c"),
        F.sum("cnt_g").alias("cnt_g"),
        F.sum("cnt_t").alias("cnt_t"),
        F.sum("cnt_n").alias("cnt_n"),
    )
    return _finish_host_window(agg)


def salted_host_window_partials(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    salt_buckets: int = 8,
) -> DataFrame:
    """Stage 1 of the salted hot-host aggregation: group by (window, host,
    salt) so one viral host's rows land on `salt_buckets` state-store keys
    (and shuffle partitions) instead of one. Salt is DETERMINISTIC per url
    (xxhash64 mod buckets) — a replayed micro-batch after failure re-salts
    identically, which rand() would not (exactly-once safety)."""
    p = with_host(pages).withWatermark("warc_ts", watermark)
    p = p.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).cast("int")
    )
    counts = page_count_columns(p, extra_cols=("salt",))
    return counts.groupBy(
        F.window("warc_ts", window).alias("w"), "host", "salt"
    ).agg(
        F.count("*").alias("n_pages"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("cnt_a").alias("cnt_a"),
        F.sum("cnt_c").alias("cnt_c"),
        F.sum("cnt_g").alias("cnt_g"),
        F.sum("cnt_t").alias("cnt_t"),
        F.sum("cnt_n").alias("cnt_n"),
    )


def host_window_stats_salted(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    salt_buckets: int = 8,
) -> DataFrame:
    """Hot-host-skew-safe twin of `host_window_stats` (north_rule skew item,
    VERDICT r2 item 5): salted pre-aggregation into `salt_buckets` keys per
    host, then a second CHAINED streaming aggregation (window_time-keyed,
    supported since Spark 3.5) merges the partials back to one row per
    (window, host). Output is identical to the unsalted aggregation — only
    the state/shuffle distribution changes: per-key state rows and per-task
    merge input are bounded by 1/salt_buckets of the hot host's traffic,
    while the stage-2 merge handles salt_buckets tiny rows per host."""
    partials = salted_host_window_partials(pages, window, watermark, salt_buckets)
    merged = partials.groupBy(
        F.window(F.window_time("w"), window).alias("w"), "host"
    ).agg(
        F.sum("n_pages").alias("n_pages"),
        *[F.sum(c).alias(c) for c in _SUM_COLS],
    )
    return _finish_host_window(merged)


def host_session_stats(
    pages: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows keyed by url-host (SURVEY.md §2.7)."""
    p = with_host(pages).withWatermark("warc_ts", watermark)
    return (
        page_count_columns(p)
        .groupBy(F.session_window("warc_ts", gap).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"), F.sum("n_chars").alias("total_chars"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "host",
            "n_pages",
            "total_chars",
        )
    )


KMER_LONG_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def kmer_long_rows(pages: DataFrame, ks=(2, 3, 4), window_chars: int | None = None) -> DataFrame:
    """Per-page k-mer count vectors in LONG format (host, warc_ts, k, idx,
    cnt): the scalable streaming representation of the dense 4^k arrays —
    merging = built-in sum per (window, host, k, idx), so the streaming
    hash-aggregate needs no array UDAF and state stays per-key-small.
    window_chars: optionally split pages into positional windows first
    (None = whole page, the event-time-window use case)."""
    from ..kernels import batch_window_stats

    import pandas as pd

    def compute(batches):
        for pdf in batches:
            texts = pdf["text"].tolist()
            w = window_chars or (1 << 30)
            _, starts, _, _, kvecs, _ = batch_window_stats(texts, w, ks=ks)
            # long-format: one row per nonzero (page, k, idx)
            out = {"host": [], "warc_ts": [], "k": [], "idx": [], "cnt": []}
            import numpy as np

            for k in ks:
                mat = kvecs[k]
                page_i, idx = np.nonzero(mat)
                out["host"].extend(pdf["host"].to_numpy()[page_i])
                out["warc_ts"].extend(pdf["warc_ts"].to_numpy()[page_i])
                out["k"].extend([k] * len(idx))
                out["idx"].extend(idx.tolist())
                out["cnt"].extend(mat[page_i, idx].tolist())
            yield pd.DataFrame(out)

    return with_host(pages).select("host", "warc_ts", "text").mapInPandas(
        compute, KMER_LONG_SCHEMA
    )


def host_window_kmer_agg(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    ks=(2,),
) -> DataFrame:
    """Streaming count-vector merge (SURVEY.md §4 custom item 2) in long
    format: groupBy(window, host, k, idx).sum(cnt) — built-in incremental
    aggregation, RocksDB state, watermark eviction."""
    rows = kmer_long_rows(pages, ks=ks).withWatermark("warc_ts", watermark)
    return (
        rows.groupBy(F.window("warc_ts", window).alias("w"), "host", "k", "idx")
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            F.col("w.start").alias("w_start"),
            "host",
            "k",
            "idx",
            "cnt",
        )
    )


def join_lang_stream(
    pages: DataFrame,
    lang: DataFrame,
    bound: str = "1 hour",
    pages_watermark: str = "10 minutes",
    lang_watermark: str = "30 minutes",
) -> DataFrame:
    """J1: stateful stream-stream left-outer join — page rows correlated with
    late-arriving lang detections for the same host within +/- `bound` of
    warc_ts. Watermarks on both sides bound the join state (RocksDB)."""
    p = with_host(pages).withWatermark("warc_ts", pages_watermark).alias("p")
    l = lang.withWatermark("detect_ts", lang_watermark).alias("l")
    cond = (
        (F.col("p.host") == F.col("l.host"))
        & (F.col("l.detect_ts") >= F.col("p.warc_ts") - F.expr(f"INTERVAL {bound}"))
        & (F.col("l.detect_ts") <= F.col("p.warc_ts") + F.expr(f"INTERVAL {bound}"))
    )
    return p.join(l, cond, "leftOuter").select(
        F.col("p.url").alias("url"),
        F.col("p.warc_ts").alias("warc_ts"),
        F.col("p.host").alias("host"),
        F.col("p.lang").alias("page_lang"),
        F.col("l.lang").alias("detected_lang"),
        F.col("l.confidence").alias("confidence"),
    )


def north_star_stats_with_lang(
    pages: DataFrame,
    lang: DataFrame,
    window: str = "10 minutes",
    bound: str = "30 minutes",
    pages_watermark: str = "10 minutes",
    lang_watermark: str = "30 minutes",
) -> DataFrame:
    """The BASELINE.json north-star sentence as ONE chained-stateful plan:
    per-page window-stats counts, correlated with the late-arriving
    lang-detection side stream (stateful stream-stream join), aggregated
    into event-time tumbling windows keyed by (host, detected_lang), ready
    for the exactly-once sink. Two scale decisions:

    1. Counts REDUCE BEFORE the join: each page collapses to six longs
       (length + case-folded ACGTN counts, whole-stage-codegen JVM
       expressions) before touching join state, so the RocksDB join buffer
       holds ~50 bytes/page instead of the page text — at 10^12 pages the
       difference between a working join and an OOM.
    2. The join is INNER within ±`bound` of warc_ts with watermarks on
       both sides (state eviction), then the windowed aggregation chains
       as a SECOND stateful operator (supported since Spark 3.5's multiple
       stateful operators; watermark propagates through the join). Each
       (page, detection) correlation contributes once — the same relational
       semantics the batch twin computes, so stream == batch is exact.

    Batch twin: this SAME function over static frames (withWatermark is a
    no-op in batch plans — EliminateEventTimeWatermark), pinned by
    `test_north_star_pipeline_stream_matches_batch`."""
    p = with_host(pages).withWatermark("warc_ts", pages_watermark)
    counts = page_count_columns(p).alias("p")
    l = lang.withWatermark("detect_ts", lang_watermark).alias("l")
    cond = (
        (F.col("p.host") == F.col("l.host"))
        & (F.col("l.detect_ts") >= F.col("p.warc_ts") - F.expr(f"INTERVAL {bound}"))
        & (F.col("l.detect_ts") <= F.col("p.warc_ts") + F.expr(f"INTERVAL {bound}"))
    )
    joined = counts.join(l, cond, "inner").select(
        F.col("p.host").alias("host"),
        F.col("p.warc_ts").alias("warc_ts"),
        F.col("l.lang").alias("detected_lang"),
        "n_chars",
        "cnt_a",
        "cnt_c",
        "cnt_g",
        "cnt_t",
        "cnt_n",
    )
    agg = joined.groupBy(
        F.window("warc_ts", window).alias("w"), "host", "detected_lang"
    ).agg(
        F.count("*").alias("n_pages"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("cnt_a").alias("cnt_a"),
        F.sum("cnt_c").alias("cnt_c"),
        F.sum("cnt_g").alias("cnt_g"),
        F.sum("cnt_t").alias("cnt_t"),
        F.sum("cnt_n").alias("cnt_n"),
    )
    gc_den = (
        F.col("cnt_g") + F.col("cnt_c") + F.col("cnt_a") + F.col("cnt_t")
    ).cast("double")
    return agg.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        "host",
        "detected_lang",
        "n_pages",
        "total_chars",
        "cnt_a",
        "cnt_c",
        "cnt_g",
        "cnt_t",
        "cnt_n",
        F.round(_entropy6_finisher(), 6).alias("entropy6_merged"),
        F.round(
            (F.col("cnt_g") + F.col("cnt_c")).cast("double")
            / F.nullif(gc_den, F.lit(0)),
            6,
        ).alias("gc_prop"),
    )


def filter_blocklist_stream(
    pages: DataFrame, hosts: DataFrame, anti: bool = True
) -> DataFrame:
    """Stream-static join: filter the page stream against a STATIC host
    table — the crawl-hygiene step (spam/adult/opt-out domain blocklists,
    or a curated allowlist). The static side re-resolves per micro-batch
    (so an updated blocklist table takes effect on the next trigger) and
    plans as a broadcast hash semi/anti join: unlike a stream-stream join
    this touches NO state store and needs no watermark, so it adds zero
    state at 10^12-row scale. anti=True drops listed hosts (LEFT ANTI);
    anti=False keeps only listed hosts (LEFT SEMI)."""
    p = with_host(pages)
    return p.join(
        F.broadcast(hosts.select("host")), "host", "left_anti" if anti else "left_semi"
    )


def host_window_distinct_urls(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    rsd: float = 0.05,
) -> DataFrame:
    """Streaming unique-visitors metric: approx distinct urls per
    (event-time window, host) via HLL++ sketches merged in the state store.
    The sketch register array is the per-group state — constant size per
    group regardless of url cardinality, which is the point at 10^12 rows:
    exact distinct state grows with the key universe, the sketch does not.
    Register merge is a commutative max, so the streamed estimate is
    IDENTICAL to the batch estimate on the same input (asserted in
    tests), not merely close."""
    return (
        with_host(pages)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(
            F.approx_count_distinct("url", rsd).alias("n_urls_approx"),
            F.count("*").alias("n_pages"),
        )
        .select(
            F.col("w.start").alias("w_start"), "host", "n_urls_approx", "n_pages"
        )
    )


def window_token_sketch(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    width: int = 32,
    depth: int = 4,
) -> DataFrame:
    """Streaming count-min sketch per event-time window: the depth x width
    token-counter table of each window, maintained as a watermarked
    windowed aggregate. Counter cells are plain additive counts, so (a)
    per-window state is bounded at depth*width groups no matter how many
    distinct tokens the window sees — the sketch point at 10^12 pages —
    and (b) the streamed table is IDENTICAL to the batch sketch
    (operators/sketch.py cms_sketch) on the same input, not merely close.
    Downstream heavy-hitter probes read the emitted table with
    cms_estimates against any candidate set."""
    from ..operators.sketch import _bucket_array, _tok_hash

    pairs = (
        pages.withWatermark("warc_ts", watermark)
        .select(
            "warc_ts",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .select("warc_ts", _tok_hash("tok").alias("h"))
        .select(
            "warc_ts",
            F.posexplode(_bucket_array(depth, width)).alias("row", "bucket"),
        )
    )
    return (
        pairs.groupBy(F.window("warc_ts", window).alias("w"), "row", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "row", "bucket", "cnt")
    )


def window_novelty_stream(
    pages: DataFrame,
    index_shingles: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    shingle_words: int = 3,
) -> DataFrame:
    """Live corpus-novelty monitor: per event-time window, how many of
    the arriving pages' distinct word n-gram shingles the EXISTING index
    has never seen — the streaming face of `operators/dedup.
    increment_novelty` (same xxhash64 shingling), watched as a rate: a
    window whose novelty collapses means the crawl is re-fetching what
    the corpus already has. Emits (w_start, n_pages, n_shingles,
    n_novel, novelty_frac).

    Plan shape: one narrow shingle explode on the stream, a
    stream-static LEFT OUTER join against the persisted index shingle
    table (per micro-batch; at 10^12 docs that table is bucketed on
    shingle so the probe is shuffle-one-side — do NOT broadcast it),
    then a watermarked windowed aggregate whose state is one counter row
    per window. The same call composes in batch for the stream==batch
    differential (withWatermark is a no-op on static frames)."""
    from ..operators.dedup import word_shingle_array_sql

    sh = (
        pages.withWatermark("warc_ts", watermark)
        # project the token array ONCE per row (HOF lambdas don't hoist
        # the split), and filter short pages out instead of generating a
        # backwards index range — Spark sequence(0, stop) DESCENDS when
        # stop < 0 (the cdc_chunks lesson)
        .select("warc_ts", F.expr("split(lower(text), ' ')").alias("toks"))
        .where(F.expr("size(toks)") >= shingle_words)
        .select(
            "warc_ts",
            # pos marks each page's FIRST shingle row: count_if(pos = 0)
            # is an exact page count without a distinct aggregate (which
            # streaming aggregation rejects)
            F.posexplode(
                F.expr(word_shingle_array_sql("toks", shingle_words))
            ).alias("pos", "shingle"),
        )
    )
    # dedupe the probe side: the production index is appended per
    # increment, so a shingle seen by two increments has two rows — a
    # left_outer match against k rows would multiply every counter by k
    idx = index_shingles.select("shingle").distinct().select(
        F.col("shingle"), F.lit(True).alias("_seen")
    )
    joined = sh.join(idx, "shingle", "left_outer")
    return (
        joined.groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count_if(F.col("pos") == 0).cast("long").alias("n_pages"),
            F.count("*").alias("n_shingles"),
            F.count_if(F.col("_seen").isNull()).alias("n_novel"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "n_pages",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_shingles").cast("double"), 6).alias(
                "novelty_frac"
            ),
        )
    )


def index_shingle_table(
    docs: DataFrame, text_col: str = "text", shingle_words: int = 3
) -> DataFrame:
    """The persisted index side `window_novelty_stream` probes: distinct
    xxhash64 word-shingle hashes of the existing corpus (at 10^12 docs
    this is written once, bucketed by shingle, and appended per
    increment)."""
    from ..operators.dedup import word_shingle_array_sql

    return (
        docs.select(F.expr(f"split(lower({text_col}), ' ')").alias("toks"))
        .where(F.expr("size(toks)") >= shingle_words)
        .select(
            F.explode(
                F.expr(word_shingle_array_sql("toks", shingle_words))
            ).alias("shingle")
        )
        .distinct()
    )


def clean_pages_stream(
    pages: DataFrame,
    blocklist: DataFrame | None = None,
    watermark: str = "10 minutes",
    min_words: int = 20,
    line_min_words: int = 0,
    line_blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """End-to-end streaming corpus curation — the full C4/Gopher cleaning
    pass as ONE streaming plan: host blocklist (broadcast anti-join, no
    state) -> URL dedup within the watermark horizon (the only stateful
    stage, state bounded by the horizon) -> line-level cleaning
    (`filter_lines`, when line_min_words > 0 or a line blocklist is given)
    -> Gopher quality gate over the CLEANED text -> PII scrub (all
    stateless JVM projections). Emits cleaned page rows ready for an
    exactly-once sink or the window-statistics aggregation.

    The same call composes in BATCH mode, where the dedup stage is plain
    dropDuplicates on url (dropDuplicatesWithinWatermark rejects static
    Datasets) — which is what the stream==batch differential test
    exploits."""
    from ..functions.text import filter_lines, gopher_filters, scrub_pii

    s = with_host(pages)
    if blocklist is not None:
        s = s.join(F.broadcast(blocklist.select("host")), "host", "left_anti")
    s = dedup_urls_stream(s, watermark) if s.isStreaming else s.dropDuplicates(["url"])
    if line_min_words > 0 or line_blocklist:
        s = filter_lines(
            s,
            text_col="text",
            min_words=line_min_words,
            blocklist=line_blocklist,
            project=False,
        )
    s = gopher_filters(
        s, text_col="text", id_col="url", min_words=min_words, project=False
    )
    s = s.where(F.col("gopher_keep")).drop("gopher_keep")
    return scrub_pii(s, text_col="text", id_col="url", project=False)


def dedup_urls_stream(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact deduplication by url within the watermark horizon
    (``dropDuplicatesWithinWatermark``): the training-pipeline guard against
    re-crawled pages. State per url is evicted once the watermark passes
    warc_ts + horizon, so state stays bounded at 10^12-row scale — unlike
    plain dropDuplicates, whose state grows without bound on a stream."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def write_topn_hosts_per_window(
    agg: DataFrame,
    out_path: str,
    checkpoint: str,
    n: int = 3,
    once: bool = True,
):
    """Streaming top-N (hosts by total_chars per event-time window) via
    foreachBatch: ranking is not expressible inside an append-mode
    streaming aggregation, but every (window, host) row of a given window
    FINALIZES in the same micro-batch (the watermark crosses the window
    end exactly once), so a per-batch window-local rank over the emitted
    rows is exact — the foreachBatch post-processing pattern the reference
    TSV sinks also use (SURVEY.md §2.1 S4). Idempotent under micro-batch
    replay by construction: foreachBatch writes are BATCH writes outside
    the streaming commit log, so a crash between the sink write and the
    checkpoint commit replays the batch — each batch therefore OVERWRITES
    its own `batch_id=<id>` partition directory (the canonical
    foreachBatch exactly-once recipe; same effect as Iceberg's
    replace-partition commit), making the replay a no-op instead of an
    append-mode duplicate. Pinned by
    `test_foreachbatch_replay_is_idempotent`, which deletes the last
    checkpoint commit to force a real replay."""
    from pyspark.sql import Window as PW

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        w = PW.partitionBy("w_start").orderBy(
            F.desc("total_chars"), F.asc("host")
        )
        top = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n)
        )
        top.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    w = (
        agg.writeStream.foreachBatch(emit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if once:
        w = w.trigger(availableNow=True)
    return w.start()


def write_bpe_token_counts_stream(
    pages: DataFrame,
    out_path: str,
    checkpoint: str,
    merges=None,
    once: bool = True,
):
    """Per-page BPE token counts on the STREAM, by running the BATCH
    operator on each micro-batch via foreachBatch — the operator-reuse
    pattern: `functions.bpe.bpe_token_counts`'s vocabulary trick (JVM
    explode → DISTINCT words → one Arrow encode pass → broadcast join
    back) applies per micro-batch unchanged, so corpus text still never
    crosses into Python and the Arrow pass stays vocabulary-sized per
    batch. Counting is stateless per page, so per-batch execution is
    exact (no cross-batch state needed). Idempotent under replay the
    same way as write_topn_hosts_per_window: each batch overwrites its
    own `batch_id=<id>` partition directory."""
    from ..functions.bpe import bpe_token_counts

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        counts = bpe_token_counts(
            batch_df.select(F.col("url").alias("doc_id"), "text"), merges
        )
        counts.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    w = (
        pages.writeStream.foreachBatch(emit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if once:
        w = w.trigger(availableNow=True)
    return w.start()


def sink_format(spark: SparkSession) -> str:
    """Iceberg when the runtime is on the classpath, else the parquet file
    sink (same exactly-once commit contract in this sandbox)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return "iceberg"
    except Exception:
        return "parquet"


def write_exactly_once(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    once: bool = True,
):
    """Exactly-once append sink with checkpointing; resumable (same
    checkpoint dir -> no dupes on restart)."""
    w = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        w = w.trigger(availableNow=True)
    return w.start()


# --- exactly-once sink snapshot reads (time travel over commit manifests) ----


def sink_batches(out_path: str) -> list[int]:
    """Committed batch ids of a file-sink output, from _spark_metadata."""
    import os

    meta = os.path.join(out_path, "_spark_metadata")
    ids = set()
    for name in os.listdir(meta):
        base = name[: -len(".compact")] if name.endswith(".compact") else name
        if not name.startswith(".") and base.isdigit():
            ids.add(int(base))
    return sorted(ids)


def _manifest_files(out_path: str, up_to_batch: int) -> list[str]:
    """Resolve the committed file set as of `up_to_batch` from the sink's
    transaction log (Spark FileStreamSinkLog v1 format: per-batch JSON-line
    manifests, periodically rolled into <b>.compact files that carry the
    full history up to b). Only manifest-listed 'add' actions count —
    orphan parquet files from failed/zombie attempts are invisible, which
    is exactly the sink's exactly-once contract."""
    import json
    import os

    meta = os.path.join(out_path, "_spark_metadata")
    compacts, plains = {}, {}
    for name in os.listdir(meta):
        if name.startswith("."):
            continue
        if name.endswith(".compact") and name[: -len(".compact")].isdigit():
            b = int(name[: -len(".compact")])
            if b <= up_to_batch:
                compacts[b] = name
        elif name.isdigit():
            b = int(name)
            if b <= up_to_batch:
                plains[b] = name
    start = max(compacts) if compacts else None
    names = ([compacts[start]] if start is not None else []) + [
        plains[b] for b in sorted(plains) if start is None or b > start
    ]
    paths: dict[str, bool] = {}
    for name in names:
        with open(os.path.join(meta, name)) as f:
            header = f.readline().strip()
            assert header == "v1", f"unknown sink log version {header!r}"
            for line in f:
                if not line.strip():
                    continue
                entry = json.loads(line)
                paths[entry["path"]] = entry.get("action", "add") == "add"
    return [p for p, added in paths.items() if added]


def read_sink_snapshot(
    spark: SparkSession, out_path: str, up_to_batch: int | None = None
) -> DataFrame:
    """Time-travel read of an exactly-once file sink: the rows committed
    as of `up_to_batch` (default: latest). The manifest IS the table —
    a batch's files become visible atomically with its manifest write,
    so this read is consistent under a concurrently running stream, and
    replayed/aborted attempts never surface. The Iceberg-snapshot
    semantics of the north rule, expressed over the file sink this
    sandbox can run."""
    batches = sink_batches(out_path)
    if up_to_batch is None:
        up_to_batch = batches[-1] if batches else -1
    elif batches and up_to_batch not in batches:
        # a log file below the retention window may have been deleted by
        # the running query; silently returning a partial file set would
        # be a WRONG snapshot, so refuse instead
        raise ValueError(
            f"batch {up_to_batch} has no manifest in {out_path} "
            f"(available: {batches[0]}..{batches[-1]})"
        )
    files = _manifest_files(out_path, up_to_batch)
    if not files:
        # schema from the full sink dir, rows from nothing
        return spark.read.parquet(out_path).limit(0)
    return spark.read.parquet(*files)


def read_sink_increment(
    spark: SparkSession,
    out_path: str,
    since_batch: int,
    up_to_batch: int | None = None,
) -> DataFrame:
    """INCREMENTAL snapshot read: only the rows committed AFTER
    `since_batch` (exclusive) up to `up_to_batch` (inclusive; default
    latest) — Iceberg's incremental-scan semantics over the file sink's
    manifest log. Because the sink is append-only (no 'delete' actions in
    practice), the increment is exactly the set difference of the two
    manifests' file lists, so a downstream consumer can process each
    batch range once and never rescan history — the consumption pattern
    that makes an exactly-once PRODUCER useful to an exactly-once
    CONSUMER. Raises like read_sink_snapshot when `since_batch` predates
    the retained manifest window (a silent partial diff would be wrong)."""
    batches = sink_batches(out_path)
    if up_to_batch is None:
        up_to_batch = batches[-1] if batches else -1
    elif batches and up_to_batch not in batches:
        raise ValueError(
            f"batch {up_to_batch} has no manifest in {out_path} "
            f"(available: {batches[0]}..{batches[-1]})"
        )
    if batches and since_batch not in batches:
        raise ValueError(
            f"batch {since_batch} has no manifest in {out_path} "
            f"(available: {batches[0]}..{batches[-1]})"
        )
    base = set(_manifest_files(out_path, since_batch))
    new_files = [
        f for f in _manifest_files(out_path, up_to_batch) if f not in base
    ]
    if not new_files:
        return spark.read.parquet(out_path).limit(0)
    return spark.read.parquet(*new_files)


def vacuum_sink_orphans(
    out_path: str, min_age_seconds: float = 3600.0, dry_run: bool = False
) -> list[str]:
    """Delete data files present in the sink directory but ABSENT from the
    latest committed manifest — the leftovers of crashed/zombie write
    attempts, which the manifest-based readers above already ignore but
    which hold disk (at 10^12 rows: real money) until removed. Safety:
    only files older than `min_age_seconds` are touched, so an IN-FLIGHT
    batch's files (written before their manifest commits) are never
    deleted — the same age guard Iceberg's remove_orphan_files uses, and
    for the same reason the DEFAULT is a nonzero hour, not 0 (a zero
    default would race a mid-commit batch and lose committed data; pass
    an explicit 0 only when no writer can possibly be running).
    Returns the deleted (or would-delete, when dry_run) relative paths.
    Never touches _spark_metadata: manifests are the table's history and
    time travel depends on them."""
    import os
    import time

    batches = sink_batches(out_path)
    referenced = set(_manifest_files(out_path, batches[-1])) if batches else set()
    # manifest paths may be absolute or relative to the sink root
    ref_names = {os.path.basename(p) for p in referenced}
    now = time.time()
    victims = []
    for name in sorted(os.listdir(out_path)):
        full = os.path.join(out_path, name)
        if name == "_spark_metadata" or not os.path.isfile(full):
            continue
        if not name.endswith(".parquet") or name.startswith("."):
            continue
        if name in ref_names:
            continue
        if now - os.path.getmtime(full) < min_age_seconds:
            continue
        victims.append(name)
        if not dry_run:
            os.remove(full)
    return victims


def encode_embeddings_stream(
    emb: DataFrame, centroids, books, m: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Online ANN index ingest: PQ-encode a stream of new embeddings under
    ALREADY-FITTED tables (fit offline on a sample — operators/cluster.py
    pq_fit — encode forever). The encode is pure narrow column arithmetic
    (no aggregation, no join: codebooks ride as plan literals), so it is
    stream-safe as-is and emits one (id, cell, code_0..m-1) row per input
    row, exactly the batch encoder's output — appendable straight into the
    exactly-once sink as index segments."""
    from ..operators.cluster import pq_encode_with

    return pq_encode_with(emb, centroids, books, m, id_col, vec_col)


def write_lang_id_stream(
    pages: DataFrame,
    profiles_rows: list,
    out_path: str,
    checkpoint: str,
    n: int = 3,
    top: int = 64,
    once: bool = True,
):
    """In-stream language ID with OFFLINE-trained rank profiles (train
    once on labelled data — functions/text.py char_ngram_profiles — then
    classify every arriving page): foreachBatch operator reuse, because
    the per-doc top-N gram ranking is a window function (unsupported in a
    streaming query) but each page's grams derive from its single row, so
    a batch-local classification is exact. Idempotent under micro-batch
    replay via the batch_id=<id> overwrite recipe (same contract as
    write_topn_hosts_per_window). `profiles_rows` is the collected
    (lang, gram, rank) table — profile-sized, rides the closure and
    broadcasts inside each batch."""
    from ..functions.text import classify_rank_profile

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            prof = batch_df.sparkSession.createDataFrame(
                profiles_rows, ["lang", "gram", "rank"]
            )
            out = classify_rank_profile(
                batch_df.select("url", "text"), prof, n=n, top=top, id_col="url"
            )
        else:
            out = batch_df.sparkSession.createDataFrame(
                [], "url string, pred_lang string, dist long"
            )
        out.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    w = (
        pages.writeStream.foreachBatch(emit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if once:
        w = w.trigger(availableNow=True)
    return w.start()
