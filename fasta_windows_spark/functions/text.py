"""Text-analysis column functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All JVM-side
expressions (no Python in the hot path), oracle-reproducible in ANSI SQL."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "a", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un"],
}

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _stop_count(tokens_col: str, words: list[str]) -> F.Column:
    arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
    return F.expr(f"size(filter({tokens_col}, t -> array_contains({arr}, t)))")


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-heuristic language ID: argmax of per-language stopword
    hit counts; ties resolve en > de > fr (deterministic)."""
    d = docs.withColumn("_toks", F.split(F.lower(text_col), " "))
    for lang, words in STOPWORDS.items():
        d = d.withColumn(f"score_{lang}", _stop_count("_toks", words))
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_fr")),
            "en",
        )
        .when(F.col("score_de") >= F.col("score_fr"), "de")
        .otherwise("fr")
    )
    return d.withColumn("pred_lang", pred).drop("_toks")


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, token stats, punctuation ratio, stopword
    ratio, and a keep/drop flag (the C4-style heuristic family)."""
    lower = F.lower(F.col(text_col))
    n_chars = F.length(text_col)
    toks = F.split(lower, " ")
    n_tokens = F.size(toks)
    n_spaces = n_tokens - 1
    punct = F.length(F.regexp_replace(lower, "[a-z0-9 ]", ""))
    stop = _stop_count("_toks", STOPWORDS["en"])
    return (
        docs.withColumn("_toks", toks)
        .select(
            "doc_id",
            n_chars.alias("n_chars"),
            n_tokens.alias("n_tokens"),
            F.round((n_chars - n_spaces) / n_tokens.cast("double"), 6).alias(
                "avg_token_len"
            ),
            F.round(punct / n_chars.cast("double"), 6).alias("punct_ratio"),
            F.round(stop / n_tokens.cast("double"), 6).alias("stopword_ratio"),
            (
                (n_tokens >= 10) & ((stop / n_tokens.cast("double")) > 0.02)
            ).alias("quality_ok"),
        )
    )


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single punctuation)."""
    lower = F.lower(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(F.split(lower, " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(lower, F.lit(BPE_ISH_PATTERN), F.lit(0))).alias(
            "bpe_tokens"
        ),
    )


def token_chunks(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-data chunking: split each document into chunks of
    `chunk_tokens` whitespace tokens, consecutive chunks sharing `overlap`
    tokens (stride = chunk_tokens - overlap) — the LLM-pretraining analog of
    the engine's positional windows, as pure JVM expressions. One narrow
    pass: tokenize once, explode chunk starts, slice + re-join. The final
    (possibly short) chunk starts at the last stride boundary < n_tokens.

    Emits (id, chunk_idx, tok_start, n_chunk_tokens, chunk_md5) — the md5
    fingerprints chunk text so an oracle can verify content without moving
    it; a materializing variant would keep the joined string column."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be < chunk_tokens")
    toks = f"split({text_col}, ' ')"
    # n_chunk_tokens comes from arithmetic (least(chunk, n_toks - start)),
    # not from re-splitting the joined chunk string; every reference to the
    # split() subtree is the identical expression, so whole-stage codegen's
    # subexpression elimination tokenizes each doc once
    chunks = (
        f"transform(sequence(0, greatest(1, cast(ceil((size({toks}) - "
        f"{overlap}) / {stride}.0) as int)) - 1), i -> named_struct("
        f"'n', least({chunk_tokens}, size({toks}) - i*{stride}), "
        f"'h', md5(array_join(slice({toks}, i*{stride} + 1, {chunk_tokens}), ' '))))"
    )
    return (
        docs.where(F.length(text_col) > 0)
        .select(
            F.col(id_col),
            F.posexplode(F.expr(chunks)).alias("chunk_idx", "_c"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("tok_start"),
            F.col("_c.n").cast("long").alias("n_chunk_tokens"),
            F.col("_c.h").alias("chunk_md5"),
        )
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Document fingerprint (winnowing-lite): min/max 32-bit hash over all
    k-char grams + distinct gram count. Content-defined, order-independent
    of document layout — usable as a cheap near-dup prefilter key."""
    grams = F.expr(
        f"transform(sequence(0, length({text_col})-{k}), p -> "
        f"cast(conv(substr(md5(substring({text_col}, p+1, {k})),1,8),16,10) as bigint))"
    )
    return (
        docs.where(F.length(text_col) >= k)
        .withColumn("_grams", grams)  # materialize once; 3 consumers below
        .select(
            "doc_id",
            F.array_min("_grams").alias("fp_min"),
            F.array_max("_grams").alias("fp_max"),
            F.size(F.array_distinct("_grams")).alias("n_distinct_grams"),
        )
    )


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition screens from the Gopher/MassiveText quality-filter family:
    per document, the fraction of word bigrams taken by the single most
    frequent bigram (`top_bigram_frac`) and the fraction of word 5-grams
    that are duplicates (`dup_5gram_frac`). High values mark boilerplate /
    template / degenerate-repetition pages that LLM corpus cleaning drops.

    Scale shape: the 5-gram duplicate fraction is a pure narrow HOF pass
    (array_distinct inside the row — no shuffle). Only the bigram mode
    needs distribution: explode -> partial-aggregated groupBy on
    (doc, bigram) -> per-doc max, both shuffles keyed on the doc id so AQE
    coalesces them; the per-doc constants ride the grouping keys so no
    join is ever needed.
    """
    toks = f"split(lower({text_col}), ' ')"
    d = docs.where(F.expr(f"size({toks})") >= 5).select(
        F.col(id_col).alias("doc"), F.expr(toks).alias("_t")
    )
    d = d.select(
        "doc",
        F.expr(
            "transform(sequence(0, size(_t)-2), i -> concat(_t[i], ' ', _t[i+1]))"
        ).alias("_bg"),
        (F.size("_t") - F.lit(4)).cast("long").alias("n_g5"),
        F.expr(
            "size(array_distinct(transform(sequence(0, size(_t)-5), "
            "i -> array_join(slice(_t, i+1, 5), ' '))))"
        )
        .cast("long")
        .alias("d_g5"),
    )
    agg = (
        d.select("doc", "n_g5", "d_g5", F.explode("_bg").alias("bigram"))
        .groupBy("doc", "n_g5", "d_g5", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc", "n_g5", "d_g5")
        .agg(F.max("c").alias("top_cnt"), F.sum("c").alias("n_bg"))
    )
    return agg.select(
        F.col("doc").alias(id_col),
        F.col("n_bg").cast("long").alias("n_bigrams"),
        F.col("top_cnt").cast("long").alias("top_bigram_cnt"),
        F.round(F.col("top_cnt") / F.col("n_bg"), 6).alias("top_bigram_frac"),
        F.round(F.lit(1.0) - F.col("d_g5") / F.col("n_g5"), 6).alias(
            "dup_5gram_frac"
        ),
    )


def gopher_filters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.80,
    min_stop_hits: int = 2,
    project: bool = True,
) -> DataFrame:
    """The Gopher/MassiveText document-level rule battery (Rae et al. 2021,
    §A1.1): word-count bounds, mean-word-length bounds, fraction of words
    containing an alphabetic character, and a minimum stop-word hit count.
    Emits every signal plus the combined `keep` flag so downstream mixes can
    re-weight individual rules instead of re-scanning the corpus.
    project=False appends the signal columns to the input row instead of
    projecting (`keep` plus prefixed metrics), for pipeline/stream use.

    Scale shape: one narrow JVM projection — tokenize once (codegen
    subexpression elimination shares the split() across all consumers),
    higher-order filters in-row, no shuffle, no Python."""
    toks = F.split(F.lower(text_col), " ")
    d = docs.withColumn("_toks", toks)
    n_words = F.size("_toks")
    # sum of word lengths == chars minus the (n-1) separators
    mean_len = (F.length(text_col) - (n_words - 1)) / n_words.cast("double")
    alpha = F.expr("size(filter(_toks, t -> t rlike '[a-z]'))")
    stop = _stop_count("_toks", STOPWORDS["en"])
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (alpha / n_words.cast("double") >= min_alpha_frac)
        & (stop >= min_stop_hits)
    )
    if not project:
        return (
            d.withColumn("gopher_n_words", n_words.cast("long"))
            .withColumn("gopher_keep", keep)
            .drop("_toks")
        )
    return d.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha / n_words.cast("double"), 6).alias("alpha_word_frac"),
        stop.cast("long").alias("stop_hits"),
        keep.alias("keep"),
    )


def unigram_surprisal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cross-entropy (bits/token) under the corpus's own
    unigram LM — the dependency-free stand-in for a KenLM perplexity filter:
    boilerplate and templated pages score low, lexically odd pages high.

    bits/token = log2(T) - (1/n_d) * sum_w tf(w,d) * log2(cnt(w))
    with T = total corpus tokens, cnt = corpus frequency (every token seen
    at least once, so the model is self-smoothed).

    Scale shape: per-doc term frequencies first (explode -> partial-agg
    groupBy, so join traffic is distinct-terms-per-doc, not total tokens),
    then a token-keyed join against the vocabulary. No broadcast hint: the
    web-scale vocabulary can exceed executor memory, and AQE promotes the
    join to broadcast at runtime whenever the vocab side is actually small
    (as it is here). The scalar total rides a 1-row cross join."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(text_col), " ")).alias("tok"),
    )
    tf = toks.groupBy("doc", "tok").agg(F.count("*").alias("tf"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    per_doc = (
        tf.join(vocab, "tok")
        .groupBy("doc")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.log2("cnt")).alias("_sl"),
        )
    )
    return per_doc.crossJoin(total).select(
        F.col("doc").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.log2("total") - F.col("_sl") / F.col("n_tokens"), 6).alias(
            "bits_per_token"
        ),
    )


def with_compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib-compressibility quality signal — the classic two-sided filter:
    boilerplate/template text compresses far below normal prose (drop the
    low tail), random garbage barely compresses (drop the high tail).
    ratio = deflate_bytes / utf8_bytes.

    Codec-shaped work (per-row C calls inside an Arrow-batched pandas UDF,
    like the multimodal decode path) — the stage is narrow and scales
    linearly with corpus bytes. No SQL engine exposes deflate, so the
    contract entry is rows-only, pinned by a direct python-zlib
    differential test."""

    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        _ratio(F.col(text_col)).alias("compression_ratio"),
    )


def bigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document bits/bigram under an interpolated bigram LM trained on
    the corpus itself: p(cur|prev) = lam * c(prev,cur)/c(prev) +
    (1-lam) * c(cur)/T. The next step up from unigram_surprisal — template
    boilerplate scores even lower (its bigrams are near-deterministic),
    shuffled/garbled text scores high even when its unigram profile is
    normal, which is exactly the failure mode unigram filters miss.

    Scale shape: per-doc bigram term frequencies first (tf-first, as in
    unigram_surprisal), then three token-keyed shuffle joins (bigram
    counts, prev-unigram, cur-unigram) — each partial-aggregated before
    its shuffle, AQE broadcasting whichever side fits. The arithmetic is
    written operand-for-operand identically to the SQL oracle so both
    engines produce the same doubles."""
    toks = F.split(F.lower(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("_t")).where(
        F.size("_t") >= 2
    )
    pairs = base.select(
        "doc",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t)-1), "
                "i -> struct(_t[i-1] as prev, _t[i] as cur))"
            )
        ).alias("p"),
    ).select("doc", "p.prev", "p.cur")
    tf = pairs.groupBy("doc", "prev", "cur").agg(F.count("*").alias("tf"))
    bg = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("total"))
    j = (
        tf.join(bg, ["prev", "cur"])
        .join(uni.select(F.col("tok").alias("prev"), F.col("cnt").alias("c_prev")), "prev")
        .join(uni.select(F.col("tok").alias("cur"), F.col("cnt").alias("c_cur")), "cur")
        .crossJoin(total)
    )
    p = F.lit(lam) * (
        F.col("c2").cast("double") / F.col("c_prev").cast("double")
    ) + F.lit(1.0 - lam) * (
        F.col("c_cur").cast("double") / F.col("total").cast("double")
    )
    per_doc = j.groupBy("doc").agg(
        F.sum("tf").alias("n_bigrams"),
        F.sum(F.col("tf") * F.log2(p)).alias("_sl"),
    )
    return per_doc.select(
        F.col("doc").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(-F.col("_sl") / F.col("n_bigrams"), 6).alias("bits_per_bigram"),
    )


def trigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l3: float = 0.6,
    l2: float = 0.3,
    l1: float = 0.1,
) -> DataFrame:
    """Per-document bits/trigram under a Jelinek-Mercer-interpolated
    trigram LM trained on the corpus itself — the top of the n-gram
    ladder (unigram_surprisal, bigram_surprisal): p(cur|p2,p1) =
    l3*c3/c(p2,p1) + l2*c(p1,cur)/c(p1) + l1*c(cur)/T. Trigram context
    separates fluent text from 2-gram-plausible word salad — the
    strongest KenLM-free fluency screen here.

    Every component count is taken over the TRIGRAM-SITE stream (each
    position with two predecessors), so all three mixture terms are
    properly normalized over the same event space and the estimator is
    self-consistent — and the oracle can replay it exactly.

    Scale shape: tf-first per-doc trigram frequencies, then five
    token-keyed partial-aggregated joins (trigram, context-bigram,
    (p1,cur)-bigram, p1-unigram, cur-unigram) + a 1-row total broadcast —
    the bigram_surprisal pattern one order up. Arithmetic is written
    operand-for-operand identically to the SQL oracle."""
    toks = F.split(F.lower(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("_t")).where(
        F.size("_t") >= 3
    )
    trip = base.select(
        "doc",
        F.explode(
            F.expr(
                "transform(sequence(2, size(_t)-1), i -> "
                "struct(_t[i-2] as p2, _t[i-1] as p1, _t[i] as cur))"
            )
        ).alias("g"),
    ).select("doc", "g.p2", "g.p1", "g.cur")
    tf = trip.groupBy("doc", "p2", "p1", "cur").agg(F.count("*").alias("tf"))
    c3 = trip.groupBy("p2", "p1", "cur").agg(F.count("*").alias("c3"))
    cctx = trip.groupBy("p2", "p1").agg(F.count("*").alias("cctx"))
    c2b = trip.groupBy("p1", "cur").agg(F.count("*").alias("c2b"))
    c1p = trip.groupBy("p1").agg(F.count("*").alias("c1p"))
    c1c = trip.groupBy("cur").agg(F.count("*").alias("c1c"))
    total = trip.agg(F.count("*").alias("total"))
    j = (
        tf.join(c3, ["p2", "p1", "cur"])
        .join(cctx, ["p2", "p1"])
        .join(c2b, ["p1", "cur"])
        .join(c1p, "p1")
        .join(c1c, "cur")
        .crossJoin(total)
    )
    p = (
        F.lit(l3) * (F.col("c3").cast("double") / F.col("cctx").cast("double"))
        + F.lit(l2)
        * (F.col("c2b").cast("double") / F.col("c1p").cast("double"))
        + F.lit(l1)
        * (F.col("c1c").cast("double") / F.col("total").cast("double"))
    )
    per_doc = j.groupBy("doc").agg(
        F.sum("tf").alias("n_trigrams"),
        F.sum(F.col("tf") * F.log2(p)).alias("_sl"),
    )
    return per_doc.select(
        F.col("doc").alias(id_col),
        F.col("n_trigrams").cast("long").alias("n_trigrams"),
        F.round(-F.col("_sl") / F.col("n_trigrams"), 6).alias(
            "bits_per_trigram"
        ),
    )


# URL canonicalization patterns, Java-regex/RE2 common subset (verbatim in
# the DuckDB oracle). `utm_[^&#]*&` eats every utm param followed by another
# param; the trailing-utm pattern then cleans the last one; the final two fix
# a dangling '?'/'&' left when utm params were the only query string.
_URL_FRAGMENT = r"#.*"
_URL_UTM_MID = r"utm_[^&#]*&"
_URL_UTM_TAIL = r"[?&]utm_[^&#]*$"
_URL_DANGLING = r"[?&]$"


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl URL canonicalization: lowercase scheme+host, strip a leading
    `www.`, drop default port 80, drop the fragment, drop `utm_*` tracking
    params. Adds `host` (the canonical host key used for partitioning /
    sessionization) and `url_norm`; dedup on `url_norm` collapses the
    tracking-param aliases a crawler sees for the same page.

    Pure JVM regexp projection — narrow, shuffle-free."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1)),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*:([0-9]+)", 1)
    port_part = F.when(port.isin("", "80"), F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, _URL_FRAGMENT, "")
    rest = F.regexp_replace(rest, _URL_UTM_MID, "")
    rest = F.regexp_replace(rest, _URL_UTM_TAIL, "")
    rest = F.regexp_replace(rest, _URL_DANGLING, "")
    return df.withColumn("host", host).withColumn(
        "url_norm", F.concat(scheme, F.lit("://"), host, port_part, rest)
    )


# PII patterns restricted to the Java-regex/RE2 common subset so the same
# pattern string runs verbatim in Spark and in the DuckDB oracle.
PII_EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_PATTERN = r"\b\d{3}-\d{4}\b"


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    project: bool = True,
) -> DataFrame:
    """PII redaction (the C4-style scrub stage): replace every email address
    and phone-shaped digit run with typed placeholders, and count what was
    redacted. project=False replaces `text_col` in place (plus counts) for
    pipeline/stream use. Pure JVM regexp expressions — narrow, shuffle-free,
    scales linearly with corpus bytes."""
    c = F.col(text_col)
    # patterns go in as Column literals, NOT through F.expr — the SQL
    # parser would eat the \b/\d backslashes in a SQL string literal
    n_emails = F.size(
        F.regexp_extract_all(c, F.lit(PII_EMAIL_PATTERN), F.lit(0))
    ).cast("long")
    n_phones = F.size(
        F.regexp_extract_all(c, F.lit(PII_PHONE_PATTERN), F.lit(0))
    ).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL_PATTERN, "<EMAIL>"),
        PII_PHONE_PATTERN,
        "<PHONE>",
    )
    if not project:
        return (
            docs.withColumn("n_emails", n_emails)
            .withColumn("n_phones", n_phones)
            .withColumn(text_col, redacted)
        )
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        redacted.alias("redacted"),
    )


def filter_lines(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    blocklist: tuple[str, ...] = (),
    id_col: str = "doc_id",
    project: bool = True,
) -> DataFrame:
    """C4-style LINE-level cleaning: split `text_col` on '\\n', keep lines
    with >= min_words whitespace tokens and no blocklisted token, rejoin
    with '\\n'. (C4 additionally requires terminal punctuation and drops
    lines containing "javascript"/"cookie" boilerplate markers — the
    blocklist parameter is that hook; the punctuation rule is meaningless
    on tokenized corpora so it is not hard-coded.)

    Finer-grained than document filters (gopher_filters) and different from
    paragraph DEDUP: this drops low-signal lines within a kept document.

    Scale shape: one narrow JVM higher-order-function projection per row —
    no explode, no shuffle, no Python. project=False rewrites `text_col`
    in place (plus counts) for pipeline/stream composition.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(ln):
        toks = F.split(ln, " ")
        cond = F.size(toks) >= F.lit(min_words)
        for w in blocklist:
            cond = cond & ~F.array_contains(toks, w)
        return cond

    kept = F.filter(lines, _keep)
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    clean = F.array_join(kept, "\n")
    if not project:
        return (
            docs.withColumn("n_lines", n_lines)
            .withColumn("n_kept_lines", n_kept)
            .withColumn(text_col, clean)
        )
    return docs.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        clean.alias("clean_text"),
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    site_col: str = "source",
    line_words: int = 10,
    min_site_docs: int = 3,
) -> DataFrame:
    """SITE-level boilerplate removal: a line that recurs verbatim on >=
    `min_site_docs` DISTINCT pages of the same site (nav menus, footers,
    cookie banners — the trafilatura/RefinedWeb duplicate-element signal)
    is dropped from EVERY page of that site; unique content survives.
    Complements `filter_lines` (per-line quality, no corpus context) and
    `dedup.paragraph_dedup` (keep-FIRST global dedup — boilerplate must
    instead be removed from the first page too). The synthetic corpus has
    no newlines, so the unit is consecutive `line_words`-word chunks (the
    `paragraph_dedup` convention); on crawl text pass '\\n'-split lines.

    Scale shape — text never shuffles (the CDC-dedup protocol):
      1. explode to (site, doc, idx, md5(line)) — hashes and ids only;
      2. boilerplate set = groupBy(site, h) HAVING count(DISTINCT doc) >=
         min_site_docs (partial-agg shuffle on bounded keys; a nav line on
         millions of pages is ONE row here, which is why this is a join
         and not a collected broadcast);
      3. per-doc KEPT-INDEX list via left_anti join on (site, h) then a
         collect_list of ints (doc-sized rows, no text);
      4. rebuild = one join of that int list back to `docs`, slicing the
         original token array JVM-side.
    Returns (id, n_lines, n_removed, clean_text) — clean_text hash-gates
    the rebuilt content exactly."""
    toks = f"split({text_col}, ' ')"
    w = int(line_words)
    units = docs.select(
        F.col(id_col).alias("doc"),
        F.col(site_col).alias("site"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size({toks})/{w}.0) as int) - 1), "
                f"i -> md5(array_join(slice({toks}, i*{w} + 1, {w}), ' ')))"
            )
        ).alias("idx", "h"),
    )
    bp = (
        units.groupBy("site", "h")
        .agg(F.countDistinct("doc").alias("df_docs"))
        .where(F.col("df_docs") >= min_site_docs)
        .select("site", "h")
    )
    kept = (
        units.join(bp, ["site", "h"], "left_anti")
        .groupBy("doc")
        .agg(F.sort_array(F.collect_list("idx")).alias("keep"))
    )
    n_lines = F.expr(f"cast(ceil(size({toks})/{w}.0) as bigint)")
    return (
        docs.join(kept, F.col(id_col) == F.col("doc"), "left")
        .select(
            F.col(id_col),
            n_lines.alias("n_lines"),
            (n_lines - F.coalesce(F.size("keep"), F.lit(0))).cast("long").alias(
                "n_removed"
            ),
            F.expr(
                f"array_join(flatten(transform(coalesce(keep, array()), "
                f"i -> slice({toks}, i*{w} + 1, {w}))), ' ')"
            ).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# Cavnar-Trenkle rank-profile language identification (the real classifier
# behind the lang_id heuristic above): per-language character n-gram rank
# profiles trained from labelled text, classification by out-of-place rank
# distance. Everything is JVM expressions + bounded windows; the trained
# profile is a (n_langs x top)-row table that broadcasts.
# ---------------------------------------------------------------------------


def _char_gram_array(text_col: str, n: int) -> F.Column:
    """array<string> of all character n-grams of lower(text), JVM-side.
    Guarded so sub-n-length text yields an EMPTY array — Spark's
    sequence(1, 0) would otherwise descend (the cdc_chunks lesson)."""
    return F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"  transform(sequence(1, length({text_col}) - {n - 1}), "
        f"            i -> substring(lower({text_col}), i, {n})) "
        f"ELSE array() END"
    )


def char_ngram_profiles(
    docs: DataFrame,
    n: int = 3,
    top: int = 64,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Train Cavnar-Trenkle profiles: for each language label, the `top`
    most frequent character n-grams ranked 1..top (count desc, gram asc —
    deterministic ties). One corpus-wide partial+final aggregate, then a
    per-language window over at most |distinct grams| rows; the result is
    profile-table-sized (n_langs x top), not corpus-sized."""
    from pyspark.sql import Window

    grams = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(_char_gram_array(text_col, n)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        counts.select(
            "lang", "gram", F.row_number().over(w).alias("rank")
        ).where(F.col("rank") <= top)
    )


def classify_rank_profile(
    docs: DataFrame,
    profiles: DataFrame,
    n: int = 3,
    top: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify each document against the trained profiles by the
    out-of-place measure: build the document's own top-`top` gram ranking
    (window partitioned by doc — bounded per-doc state), fan out across
    the language list (a tiny broadcast nested loop), LEFT-join the
    broadcast profile to score |doc_rank - profile_rank| per gram with
    `top` as the missing-gram penalty, and take the min-distance language
    (ties: lang asc). Output: (doc_id, pred_lang, dist) — one row per doc.

    At 100 TB the only corpus-sized stages are the gram explode and its
    immediate partial aggregate; everything after the per-doc top-`top`
    truncation is (docs x top x n_langs) rows of integer arithmetic
    against broadcast tables."""
    from pyspark.sql import Window

    dprof = (
        docs.select(
            F.col(id_col), F.explode(_char_gram_array(text_col, n)).alias("gram")
        )
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
        .select(
            id_col,
            "gram",
            F.row_number()
            .over(
                Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
            )
            .alias("drank"),
        )
        .where(F.col("drank") <= top)
    )
    langs = profiles.select("lang").distinct()
    prof = profiles.select(
        F.col("lang").alias("p_lang"),
        F.col("gram").alias("p_gram"),
        F.col("rank").alias("p_rank"),
    )
    dist = (
        dprof.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(prof),
            (F.col("p_lang") == F.col("lang"))
            & (F.col("p_gram") == F.col("gram")),
            "left",
        )
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("p_rank")), F.lit(top)
                )
            )
            .cast("long")
            .alias("dist")
        )
    )
    pick = Window.partitionBy(id_col).orderBy(F.asc("dist"), F.asc("lang"))
    return (
        dist.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "dist")
    )


# ---------------------------------------------------------------------------
# Registrable-domain (eTLD+1) extraction: the per-domain key every crawl
# curation quota/dedup actually groups by (host groups "a.example.com" and
# "b.example.com" apart; the registrable domain unites them, while keeping
# "a.co.uk" and "b.co.uk" separate because "co.uk" is a public suffix).
# ---------------------------------------------------------------------------

# Committed public-suffix subset (declared: the real PSL is ~10k entries —
# at that size swap the literal arrays for a broadcast join; the longest-
# match semantics below are the PSL algorithm either way).
PUBLIC_SUFFIX_SUBSET = [
    "com", "org", "net", "uk", "co.uk", "org.uk", "au", "com.au",
    "blogspot.com",
]


def with_registrable_domain(
    df: DataFrame, host_col: str = "host", suffixes: list[str] | None = None
) -> DataFrame:
    """Adds `public_suffix` (the LONGEST suffix-list entry matching the
    host's trailing labels — the PSL rule, so the private-registry entry
    "blogspot.com" beats "com") and `registrable_domain` (one label more
    than the suffix; NULL when the host IS a bare suffix). Pure JVM
    expressions, zero joins, zero shuffles — a narrow projection at any
    corpus size."""
    sfx = suffixes if suffixes is not None else PUBLIC_SUFFIX_SUBSET
    labels = f"split({host_col}, '\\\\.')"

    def lastk(k: int) -> str:
        return (
            f"array_join(slice({labels}, size({labels}) - {k - 1}, {k}), '.')"
        )

    def lit_arr(vals: list[str]) -> str:
        return "array(" + ", ".join(f"'{v}'" for v in vals) + ")"

    max_k = max(s.count(".") + 1 for s in sfx)
    branches = []
    for k in range(max_k, 0, -1):  # longest match first
        of_len = [s for s in sfx if s.count(".") + 1 == k]
        if of_len:
            branches.append(
                f"WHEN size({labels}) >= {k} "
                f"AND array_contains({lit_arr(of_len)}, {lastk(k)}) "
                f"THEN {lastk(k)}"
            )
    suffix_expr = "CASE " + " ".join(branches) + " END"
    out = df.withColumn("public_suffix", F.expr(suffix_expr))
    n_sfx = F.size(F.split("public_suffix", "\\."))
    n_all = F.expr(f"size({labels})")
    reg = F.expr(
        f"array_join(slice({labels}, size({labels}) - size(split(public_suffix, '\\\\.')), "
        f"size(split(public_suffix, '\\\\.')) + 1), '.')"
    )
    return out.withColumn(
        "registrable_domain",
        F.when(
            F.col("public_suffix").isNotNull() & (n_all > n_sfx), reg
        ),
    )


def collocation_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-wide collocation mining: pointwise mutual information of
    adjacent token bigrams, PMI(x,y) = log2(P(xy) / (P(x)P(y))) — the
    classic phrase/multi-word-expression detector (Church & Hanks 1990)
    a tokenizer-training or term-mining pass runs over a crawl.

    Returns (w1, w2, c_xy, pmi) for bigrams with c_xy >= min_count. The
    ROW SET is decided purely by the integer count threshold (never by
    the float PMI), so the result is engine-exact; pmi itself is
    round(log2((c_xy*N*N)/(M*c_x*c_y)), 6) with the products evaluated
    left-associated in DOUBLE — the same expression form as the oracle,
    so both engines round the same float. N = total tokens, M = total
    bigrams.

    Scale shape: two map-side-combined aggregations (unigram + bigram
    counts, both vocabulary-sized after the combine), two joins of the
    bigram table to the unigram table (both shrink to vocabulary size
    long before the join), and two broadcast 1-row totals. The token
    explosion is never cached or shuffled at corpus width: bigrams are
    built narrowly with zip_with over two slices of the SAME split
    array, so nothing Python-side and nothing row-multiplied beyond the
    (w1, w2) pairs themselves. min_count prunes the singleton tail —
    the zipfian mass — before any join."""
    toks = F.split(F.col(text_col), " ")
    uni = docs.select(F.explode(toks).alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_tot = ucnt.agg(F.sum("c").cast("long").alias("n"))

    sz = F.size(toks)
    bg = docs.where(sz >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, sz - 1),
                F.slice(toks, 2, sz - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    m_tot = bg.agg(F.count(F.lit(1)).cast("long").alias("m"))
    bcnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    u1 = ucnt.select(F.col("w").alias("u1w"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("w").alias("u2w"), F.col("c").alias("c2"))
    return (
        bcnt.join(u1, F.col("w1") == F.col("u1w"))
        .join(u2, F.col("w2") == F.col("u2w"))
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(m_tot))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.log2(
                    (F.col("c_xy").cast("double") * F.col("n") * F.col("n"))
                    / (F.col("m").cast("double") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def vocab_growth(
    docs: DataFrame,
    checkpoints=(100, 200, 300, 400, 500),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: at each corpus checkpoint
    (docs with id < k, the deterministic ingestion order), the cumulative
    token count and the cumulative DISTINCT vocabulary — the curve whose
    flattening tells a crawl when new data stops buying new language.

    Exact distinct-so-far without per-checkpoint rescans: a token is in
    the vocabulary at checkpoint k iff its FIRST occurrence (min doc id)
    is < k — so one explode + min-groupBy produces a vocabulary-sized
    first-seen table, and every checkpoint is a conditional count over it.
    Token totals are likewise |checkpoints| conditional sums over per-doc
    counts. Two partial-agg passes, 1-row wide aggregate each, stacked to
    |checkpoints| rows JVM-side; at 10^12 docs the only sized intermediate
    is the (vocabulary) first-seen table, which shuffles as (token, min)
    partials. Returns (n_docs, n_tokens, vocab) per checkpoint."""
    ck = sorted(checkpoints)
    tok = docs.select(
        F.col(id_col).alias("did"),
        F.explode(
            F.expr(f"filter(split(lower({text_col}), ' '), x -> x <> '')")
        ).alias("tok"),
    )
    first = tok.groupBy("tok").agg(F.min("did").alias("first_did"))
    v_aggs = [
        F.sum(F.when(F.col("first_did") < k, 1).otherwise(0))
        .cast("long")
        .alias(f"v_{k}")
        for k in ck
    ]
    vrow = first.agg(*v_aggs)
    per_doc = docs.select(
        F.col(id_col).alias("did"),
        F.expr(
            f"cast(size(filter(split(lower({text_col}), ' '), x -> x <> '')) as bigint)"
        ).alias("n_toks"),
    )
    t_aggs = []
    for k in ck:
        t_aggs.append(
            F.sum(F.when(F.col("did") < k, F.col("n_toks")).otherwise(0))
            .cast("long")
            .alias(f"t_{k}")
        )
        t_aggs.append(
            F.sum(F.when(F.col("did") < k, 1).otherwise(0))
            .cast("long")
            .alias(f"d_{k}")
        )
    trow = per_doc.agg(*t_aggs)
    wide = trow.crossJoin(F.broadcast(vrow))  # 1 row x 1 row
    stack = ", ".join(f"{k}L, d_{k}, t_{k}, v_{k}" for k in ck)
    return wide.selectExpr(
        f"stack({len(ck)}, {stack}) AS (checkpoint, n_docs, n_tokens, vocab)"
    ).orderBy("checkpoint")


# Luhn double-map: digit d at an even distance-from-right stays d; at odd
# distance it becomes 2d with decimal digits summed (0,2,4,6,8,1,3,5,7,9).
_LUHN_MAP = "array(0, 2, 4, 6, 8, 1, 3, 5, 7, 9)"


def luhn_valid_expr(s: str) -> str:
    """Spark SQL boolean: string column/expr `s` of digits passes the Luhn
    checksum (ISO/IEC 7812) — the validator real PII scrubbers apply to
    card-number candidates so random digit runs don't redact. Pure integer
    JVM fold; the DuckDB twin lives in the contract oracle."""
    return (
        f"aggregate(sequence(1, length({s})), 0, (acc, i) -> acc + "
        f"CASE WHEN pmod(length({s}) - i, 2) = 1 "
        f"THEN element_at({_LUHN_MAP}, cast(substring({s}, i, 1) as int) + 1) "
        f"ELSE cast(substring({s}, i, 1) as int) END) % 10 = 0"
    )


def luhn_card_audit(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Card-number candidate audit: every maximal digit run of 13-19 digits
    (the PAN length range), Luhn-validated, masked to its last 4 digits.
    Output (doc_id, masked, n_digits, luhn_valid) per candidate, ordered.

    The run extraction avoids lookbehind (RE2-incompatible) by taking all
    maximal `[0-9]+` runs and length-filtering — portable to every regex
    engine. The checksum is a JVM integer fold per candidate (no Python);
    raw numbers never leave the plan: masking happens in the same
    projection that validates. One narrow scan, no shuffle until the
    output sort."""
    runs = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all({text_col}, '[0-9]+', 0)")
        ).alias("run"),
    ).where(F.expr("length(run) between 13 and 19"))
    return runs.select(
        F.col(id_col),
        F.expr(
            "concat(repeat('*', length(run) - 4), substring(run, -4, 4))"
        ).alias("masked"),
        F.expr("cast(length(run) as bigint)").alias("n_digits"),
        F.expr(luhn_valid_expr("run")).alias("luhn_valid"),
    ).orderBy(id_col, "masked")
