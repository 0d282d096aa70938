"""Driver-contract queries: every operator exposed as a (Spark callable,
DuckDB oracle SQL) pair with IDENTICAL column names and rounded values.

Conventions (driver compares row-count + schema + order-insensitive
value-hash):
- every computed column is aliased identically on both sides;
- floating point is rounded (usually 6 dp) on both sides;
- 0/0 is NULL on both sides (numpy NaN -> Arrow NULL; SQL nullif);
- timestamps are exported as epoch-second BIGINTs (floor) to avoid
  timezone/precision canonicalization mismatches.

Window parameters: positional windows use W=100 characters over
``documents.text`` — the batch stand-in for pages.text (FIXTURES.md §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .functions.udfs import window_stats, ctw_udf_frame
from .kernels import kmer_names

W = 100  # positional window size (chars) for the documents table

# --- shared DuckDB CTE: positional tumbling windows over documents -----------

SQL_WINS = f"""
wins AS (
  SELECT doc_id, text,
         unnest(range(CAST(ceil(length(text)/{W}.0) AS BIGINT))) AS w
  FROM documents
  WHERE length(text) > 0
),
win2 AS (
  SELECT doc_id,
         (w*{W})::BIGINT AS w_start,
         LEAST(w*{W}+{W}, length(text))::BIGINT AS w_end,
         substring(text, (w*{W}+1)::INT, {W}) AS wt
  FROM wins
)
"""


def _cnt(ch: str) -> str:
    """SQL: occurrences of literal char `ch` in wt."""
    return f"(length(wt) - length(replace(wt, '{ch}', '')))"


def _cnt_fold(upper: str) -> str:
    return f"({_cnt(upper)} + {_cnt(upper.lower())})"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ws(spark, sf_dir, **kw) -> DataFrame:
    kw.setdefault("window", W)
    kw.setdefault("id_cols", ["doc_id"])
    kw.setdefault("f32", False)
    return window_stats(_docs(spark, sf_dir), **kw)


def _r6(c):
    return F.round(c, 6)


QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# =============================================================================
# §1 positional window kernel over documents (A1-A11, P1-P2)
# =============================================================================


@q(
    "doc_windows_mononuc",
    f"""
WITH {SQL_WINS}
SELECT doc_id, w_start, w_end,
       {_cnt_fold('A')}::BIGINT AS cnt_a,
       {_cnt_fold('C')}::BIGINT AS cnt_c,
       {_cnt_fold('G')}::BIGINT AS cnt_g,
       {_cnt_fold('T')}::BIGINT AS cnt_t,
       {_cnt_fold('N')}::BIGINT AS cnt_n
FROM win2
""",
)
def doc_windows_mononuc(spark, sf_dir):
    """A2/mononuc TSV analog (fw.rs:310, seq_statsu8.rs:113)."""
    return _ws(spark, sf_dir).select(
        "doc_id", "w_start", "w_end", "cnt_a", "cnt_c", "cnt_g", "cnt_t", "cnt_n"
    )


@q(
    "doc_windows_composition",
    f"""
WITH {SQL_WINS},
counts AS (
  SELECT doc_id, w_start, w_end, (w_end - w_start)::DOUBLE AS wlen,
         {_cnt_fold('A')}::DOUBLE AS a, {_cnt_fold('C')}::DOUBLE AS c,
         {_cnt_fold('G')}::DOUBLE AS g, {_cnt_fold('T')}::DOUBLE AS t,
         {_cnt_fold('N')}::DOUBLE AS n,
         {_cnt_fold('W')}::DOUBLE AS wb, {_cnt_fold('S')}::DOUBLE AS sb
  FROM win2
)
SELECT doc_id, w_start, w_end,
       round((g+c+sb)/nullif(g+c+sb+a+t+wb,0), 6) AS gc_prop,
       round((g-c)/nullif(g+c,0), 6) AS gc_skew,
       round((a-t)/nullif(a+t,0), 6) AS at_skew,
       round(g/wlen, 6) AS prop_g,
       round(c/wlen, 6) AS prop_c,
       round(a/wlen, 6) AS prop_a,
       round(t/wlen, 6) AS prop_t,
       round(n/wlen, 6) AS prop_n
FROM counts
""",
)
def doc_windows_composition(spark, sf_dir):
    """A3-A5: GC proportion (with S/W ambiguity codes, seq_statsu8.rs:108-109),
    skews (NULL on 0/0), per-base proportions."""
    ws = _ws(spark, sf_dir)
    return ws.select(
        "doc_id",
        "w_start",
        "w_end",
        _r6("gc_prop").alias("gc_prop"),
        _r6("gc_skew").alias("gc_skew"),
        _r6("at_skew").alias("at_skew"),
        _r6("prop_g").alias("prop_g"),
        _r6("prop_c").alias("prop_c"),
        _r6("prop_a").alias("prop_a"),
        _r6("prop_t").alias("prop_t"),
        _r6("prop_n").alias("prop_n"),
    )


_SQL_SIX = f"""
six AS (
  SELECT doc_id, w_start, w_end, (w_end - w_start)::DOUBLE AS wlen,
         {_cnt_fold('A')}::DOUBLE AS a, {_cnt_fold('C')}::DOUBLE AS c,
         {_cnt_fold('G')}::DOUBLE AS g, {_cnt_fold('T')}::DOUBLE AS t,
         {_cnt_fold('N')}::DOUBLE AS n
  FROM win2
),
six2 AS (
  SELECT *, wlen - (a+c+g+t+n) AS oth FROM six
)
"""

_ENT6_TERMS = " + ".join(
    f"(CASE WHEN {x} > 0 THEN ({x}/wlen)*log2({x}/wlen) ELSE 0 END)"
    for x in ("a", "c", "g", "t", "n", "oth")
)


@q(
    "doc_windows_entropy6",
    f"""
WITH {SQL_WINS}, {_SQL_SIX}
SELECT doc_id, w_start, w_end, round(-({_ENT6_TERMS}), 6) + 0.0 AS entropy6
FROM six2
""",
)
def doc_windows_entropy6(spark, sf_dir):
    """A7: 6-bin entropy-mode Shannon entropy (entropy.rs:49-74)."""
    return _ws(spark, sf_dir).select(
        "doc_id", "w_start", "w_end", _r6("entropy6").alias("entropy6")
    )


@q(
    "doc_windows_entropy256",
    f"""
WITH {SQL_WINS},
chars AS (
  SELECT doc_id, w_start, w_end,
         translate(unnest(string_split(wt, '')), 'acgtn', 'ACGTN') AS ch
  FROM win2
),
hist AS (
  SELECT doc_id, w_start, w_end, ch, count(*)::DOUBLE AS cnt
  FROM chars GROUP BY ALL
)
SELECT doc_id, w_start, w_end,
       round(-sum((cnt/(w_end-w_start))*log2(cnt/(w_end-w_start))), 6) + 0.0
         AS shannon_entropy
FROM hist GROUP BY doc_id, w_start, w_end
""",
)
def doc_windows_entropy256(spark, sf_dir):
    """A6: 256-bin byte entropy, acgtn folded, exotic bytes distinct
    (seq_statsu8.rs:90-106)."""
    return _ws(spark, sf_dir).select(
        "doc_id", "w_start", "w_end", _r6("shannon_entropy").alias("shannon_entropy")
    )


# Deterministic "DNA-ization" of webtext: maps a..z onto a repeating acgt
# cycle (spaces/punct untouched -> exercise N-skip semantics); gives dense
# 4-gram counts on English text so the k=4 dense-vector path is non-trivial.
_DNA_FROM = "abcdefghijklmnopqrstuvwxyz"
_DNA_TO = ("acgt" * 7)[: len(_DNA_FROM)]


def _dna_docs(spark, sf_dir) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.translate(F.lower("text"), _DNA_FROM, _DNA_TO).alias("text")
    )


_SQL_DNA_DOCS = (
    f"(SELECT doc_id, translate(lower(text), '{_DNA_FROM}', '{_DNA_TO}') AS text "
    "FROM documents) documents_dna"
)


def _kmer_long(spark, sf_dir, k: int) -> DataFrame:
    src = _dna_docs(spark, sf_dir) if k == 4 else _docs(spark, sf_dir)
    ws = window_stats(src, window=W, id_cols=["doc_id"], f32=False, with_vectors=True)
    names = F.array(*[F.lit(s) for s in kmer_names(k)])
    return (
        ws.select(
            "doc_id",
            "w_start",
            F.posexplode(f"k{k}_vec").alias("idx", "cnt"),
        )
        .where(F.col("cnt") > 0)
        .select(
            "doc_id",
            "w_start",
            F.element_at(names, F.col("idx") + 1).alias("gram"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def _kmer_long_sql(k: int) -> str:
    wins_src = SQL_WINS if k != 4 else SQL_WINS.replace(
        "FROM documents", f"FROM {_SQL_DNA_DOCS}"
    )
    return f"""
WITH {wins_src},
grams AS (
  SELECT doc_id, w_start, upper(substring(wt, (p+1)::INT, {k})) AS gram
  FROM win2, LATERAL (SELECT unnest(range(length(wt)-{k - 1})) AS p) l
  WHERE length(wt) >= {k}
)
SELECT doc_id, w_start, gram, count(*)::BIGINT AS cnt
FROM grams
WHERE regexp_matches(gram, '^[ACGT]+$')
GROUP BY doc_id, w_start, gram
"""


for _k in (2, 3, 4):
    QUERIES[f"doc_windows_kmer{_k}"] = (
        lambda spark, sf_dir, k=_k: _kmer_long(spark, sf_dir, k)
    )
    ORACLES[f"doc_windows_kmer{_k}"] = _kmer_long_sql(_k)


_SQL_DIVERSITY = (
    f"WITH {SQL_WINS},\n"
    + ",\n".join(
        f"""
g{k} AS (
  SELECT doc_id, w_start, upper(substring(wt, (p+1)::INT, {k})) AS gram
  FROM win2, LATERAL (SELECT unnest(range(length(wt)-{k - 1})) AS p) l
  WHERE length(wt) >= {k}
),
c{k} AS (
  SELECT doc_id, w_start, gram, count(*)::DOUBLE AS cnt
  FROM g{k} WHERE regexp_matches(gram, '^[ACGT]+$')
  GROUP BY doc_id, w_start, gram
),
d{k} AS (
  SELECT doc_id, w_start,
         -sum((cnt/tot)*log2(cnt/tot)) AS div
  FROM (SELECT *, sum(cnt) OVER (PARTITION BY doc_id, w_start) AS tot FROM c{k})
  GROUP BY doc_id, w_start
)"""
        for k in (2, 3, 4)
    )
    + f""",
cpg AS (
  SELECT doc_id, w_start, sum(CASE WHEN gram = 'CG' THEN 1 ELSE 0 END)::DOUBLE AS cg
  FROM g2 GROUP BY doc_id, w_start
)
SELECT w.doc_id, w.w_start, w.w_end,
       round(coalesce(d2.div, 0.0), 6) + 0.0 AS dinuc_shannon,
       round(coalesce(d3.div, 0.0), 6) + 0.0 AS trinuc_shannon,
       round(coalesce(d4.div, 0.0), 6) + 0.0 AS tetranuc_shannon,
       round(coalesce(cpg.cg, 0.0) / (w.w_end - w.w_start), 6) AS cpg_prop
FROM win2 w
LEFT JOIN d2 ON w.doc_id = d2.doc_id AND w.w_start = d2.w_start
LEFT JOIN d3 ON w.doc_id = d3.doc_id AND w.w_start = d3.w_start
LEFT JOIN d4 ON w.doc_id = d4.doc_id AND w.w_start = d4.w_start
LEFT JOIN cpg ON w.doc_id = cpg.doc_id AND w.w_start = cpg.w_start
"""
)


@q("doc_windows_diversity", _SQL_DIVERSITY)
def doc_windows_diversity(spark, sf_dir):
    """A9+A10: k-mer Shannon diversity (kmeru8.rs:113-123; denominator =
    counted grams, N-containing grams excluded) and CpG proportion
    (di vector index 6 / window length, fw.rs:120)."""
    return _ws(spark, sf_dir).select(
        "doc_id",
        "w_start",
        "w_end",
        _r6("dinuc_shannon").alias("dinuc_shannon"),
        _r6("trinuc_shannon").alias("trinuc_shannon"),
        _r6("tetranuc_shannon").alias("tetranuc_shannon"),
        _r6("cpg_prop").alias("cpg_prop"),
    )


@q(
    "doc_windows_kt0",
    f"""
WITH {SQL_WINS},
counts AS (
  SELECT doc_id, w_start, w_end,
         {_cnt_fold('A')}::BIGINT AS a, {_cnt_fold('C')}::BIGINT AS c,
         {_cnt_fold('G')}::BIGINT AS g, {_cnt_fold('T')}::BIGINT AS t
  FROM win2
),
k AS (SELECT *, (a+c+g+t) AS n_eff FROM counts)
SELECT doc_id, w_start, w_end,
       round(CASE WHEN n_eff = 0 THEN 0.0 ELSE
         -((lgamma(a+0.5)+lgamma(c+0.5)+lgamma(g+0.5)+lgamma(t+0.5)
            - 4*lgamma(0.5) - lgamma(n_eff+2.0)) / ln(2)) / n_eff
       END, 6) AS kt0
FROM k
""",
)
def doc_windows_kt0(spark, sf_dir):
    """A11: zero-order Krichevsky-Trofimov code length, bits/base
    (kmeru8.rs:127-159) via the telescoped lgamma closed form."""
    return _ws(spark, sf_dir).select(
        "doc_id", "w_start", "w_end", _r6("kt0").alias("kt0")
    )


# flagship: the freq_windows.tsv analog — every scalar stat in one row
_SQL_STATS = f"""
WITH {SQL_WINS},
counts AS (
  SELECT doc_id, w_start, w_end, (w_end - w_start)::DOUBLE AS wlen,
         {_cnt_fold('A')}::DOUBLE AS a, {_cnt_fold('C')}::DOUBLE AS c,
         {_cnt_fold('G')}::DOUBLE AS g, {_cnt_fold('T')}::DOUBLE AS t,
         {_cnt_fold('N')}::DOUBLE AS n,
         {_cnt_fold('W')}::DOUBLE AS wb, {_cnt_fold('S')}::DOUBLE AS sb
  FROM win2
),
six2 AS (SELECT *, wlen - (a+c+g+t+n) AS oth FROM counts),
chars AS (
  SELECT doc_id, w_start,
         translate(unnest(string_split(wt, '')), 'acgtn', 'ACGTN') AS ch
  FROM win2
),
hist AS (
  SELECT doc_id, w_start, ch, count(*)::DOUBLE AS cnt FROM chars GROUP BY ALL
),
e256 AS (
  SELECT h.doc_id, h.w_start,
         -sum((cnt/s.wlen)*log2(cnt/s.wlen)) AS shannon_entropy
  FROM hist h JOIN six2 s ON h.doc_id = s.doc_id AND h.w_start = s.w_start
  GROUP BY h.doc_id, h.w_start
),
g2 AS (
  SELECT doc_id, w_start, upper(substring(wt, (p+1)::INT, 2)) AS gram
  FROM win2, LATERAL (SELECT unnest(range(length(wt)-1)) AS p) l
  WHERE length(wt) >= 2
),
c2 AS (
  SELECT doc_id, w_start, gram, count(*)::DOUBLE AS cnt
  FROM g2 WHERE regexp_matches(gram, '^[ACGT]+$') GROUP BY ALL
),
d2 AS (
  SELECT doc_id, w_start, -sum((cnt/tot)*log2(cnt/tot)) AS div
  FROM (SELECT *, sum(cnt) OVER (PARTITION BY doc_id, w_start) AS tot FROM c2)
  GROUP BY doc_id, w_start
),
cpg AS (
  SELECT doc_id, w_start, sum(CASE WHEN gram = 'CG' THEN 1 ELSE 0 END)::DOUBLE AS cg
  FROM g2 GROUP BY doc_id, w_start
),
kt AS (
  SELECT doc_id, w_start,
         (a+c+g+t)::BIGINT AS n_eff,
         CASE WHEN (a+c+g+t) = 0 THEN 0.0 ELSE
           -((lgamma(a+0.5)+lgamma(c+0.5)+lgamma(g+0.5)+lgamma(t+0.5)
              - 4*lgamma(0.5) - lgamma(a+c+g+t+2.0)) / ln(2)) / (a+c+g+t)
         END AS kt0
  FROM counts
)
SELECT s.doc_id, s.w_start, s.w_end,
       round((g+c+sb)/nullif(g+c+sb+a+t+wb,0), 6) AS gc_prop,
       round((g-c)/nullif(g+c,0), 6) AS gc_skew,
       round((a-t)/nullif(a+t,0), 6) AS at_skew,
       round(e256.shannon_entropy, 6) + 0.0 AS shannon_entropy,
       round(-({_ENT6_TERMS}), 6) + 0.0 AS entropy6,
       round(g/wlen, 6) AS prop_g,
       round(c/wlen, 6) AS prop_c,
       round(a/wlen, 6) AS prop_a,
       round(t/wlen, 6) AS prop_t,
       round(n/wlen, 6) AS prop_n,
       round(coalesce(cpg.cg, 0.0)/wlen, 6) AS cpg_prop,
       round(coalesce(d2.div, 0.0), 6) + 0.0 AS dinuc_shannon,
       round(kt.kt0, 6) AS kt0
FROM six2 s
JOIN e256 ON s.doc_id = e256.doc_id AND s.w_start = e256.w_start
JOIN kt ON s.doc_id = kt.doc_id AND s.w_start = kt.w_start
LEFT JOIN d2 ON s.doc_id = d2.doc_id AND s.w_start = d2.w_start
LEFT JOIN cpg ON s.doc_id = cpg.doc_id AND s.w_start = cpg.w_start
"""


@q("doc_windows_stats", _SQL_STATS)
def doc_windows_stats(spark, sf_dir):
    """Flagship: the {out}_freq_windows.tsv analog (fw.rs:236-283) — one row
    per (doc, window) with the full scalar statistics suite."""
    ws = _ws(spark, sf_dir)
    return ws.select(
        "doc_id",
        "w_start",
        "w_end",
        _r6("gc_prop").alias("gc_prop"),
        _r6("gc_skew").alias("gc_skew"),
        _r6("at_skew").alias("at_skew"),
        _r6("shannon_entropy").alias("shannon_entropy"),
        _r6("entropy6").alias("entropy6"),
        _r6("prop_g").alias("prop_g"),
        _r6("prop_c").alias("prop_c"),
        _r6("prop_a").alias("prop_a"),
        _r6("prop_t").alias("prop_t"),
        _r6("prop_n").alias("prop_n"),
        _r6("cpg_prop").alias("cpg_prop"),
        _r6("dinuc_shannon").alias("dinuc_shannon"),
        _r6("kt0").alias("kt0"),
    )


@q("doc_windows_ctw")  # no oracle: CTW is sequential/non-SQL (rows-only check)
def doc_windows_ctw(spark, sf_dir):
    """A12: CTW depth-6 compressibility per window (kmeru8.rs:170-319) — the
    entropy-mode BED analog (entropy.rs:123-136). Not ANSI-SQL-expressible."""
    return ctw_udf_frame(
        _docs(spark, sf_dir), window=W, id_cols=["doc_id"]
    ).select("doc_id", "w_start", "w_end", _r6("entropy6").alias("entropy6"), _r6("ctw").alias("ctw"))


@q(
    "doc_windows_sliding",
    f"""
WITH swins AS (
  SELECT doc_id, text,
         unnest(range(CAST(ceil(length(text)/50.0) AS BIGINT))) AS w
  FROM documents WHERE length(text) > 0
),
swin2 AS (
  SELECT doc_id, (w*50)::BIGINT AS w_start,
         LEAST(w*50+{W}, length(text))::BIGINT AS w_end,
         substring(text, (w*50+1)::INT, {W}) AS wt
  FROM swins WHERE w*50 < length(text)
),
six AS (
  SELECT doc_id, w_start, w_end, (w_end - w_start)::DOUBLE AS wlen,
         {_cnt_fold('A')}::DOUBLE AS a, {_cnt_fold('C')}::DOUBLE AS c,
         {_cnt_fold('G')}::DOUBLE AS g, {_cnt_fold('T')}::DOUBLE AS t,
         {_cnt_fold('N')}::DOUBLE AS n
  FROM swin2
),
six2 AS (SELECT *, wlen - (a+c+g+t+n) AS oth FROM six)
SELECT doc_id, w_start, w_end, round(-({_ENT6_TERMS}), 6) + 0.0 AS entropy6
FROM six2
""",
)
def doc_windows_sliding(spark, sf_dir):
    """Sliding positional windows W=100 step=50 (the -w/-s generalization,
    SURVEY.md §2.7): per-window 6-bin entropy."""
    return _ws(spark, sf_dir, step=50).select(
        "doc_id", "w_start", "w_end", _r6("entropy6").alias("entropy6")
    )


_MERGED_ENT_TERMS = " + ".join(
    f"(CASE WHEN {x} > 0 THEN ({x}/len)*log2({x}/len) ELSE 0 END)"
    for x in ("a", "c", "g", "t", "n", "oth")
)


@q(
    "doc_source_ngram_agg",
    f"""
WITH per AS (
  SELECT source,
         sum(length(text))::BIGINT AS total_len,
         sum({_cnt_fold('A').replace('wt', 'text')})::BIGINT AS cnt_a,
         sum({_cnt_fold('C').replace('wt', 'text')})::BIGINT AS cnt_c,
         sum({_cnt_fold('G').replace('wt', 'text')})::BIGINT AS cnt_g,
         sum({_cnt_fold('T').replace('wt', 'text')})::BIGINT AS cnt_t,
         sum({_cnt_fold('N').replace('wt', 'text')})::BIGINT AS cnt_n
  FROM documents GROUP BY source
),
m AS (
  SELECT source, total_len, cnt_a, cnt_c, cnt_g, cnt_t, cnt_n,
         total_len::DOUBLE AS len,
         cnt_a::DOUBLE AS a, cnt_c::DOUBLE AS c, cnt_g::DOUBLE AS g,
         cnt_t::DOUBLE AS t, cnt_n::DOUBLE AS n,
         (total_len - cnt_a - cnt_c - cnt_g - cnt_t - cnt_n)::DOUBLE AS oth
  FROM per
)
SELECT source, total_len, cnt_a, cnt_c, cnt_g, cnt_t, cnt_n,
       round(-({_MERGED_ENT_TERMS}), 6) + 0.0 AS entropy6_merged
FROM m
""",
)
def doc_source_ngram_agg(spark, sf_dir):
    """The streaming-aggregate shape in batch form: per-window count vectors
    merged per key (source = host analog) by JVM-side partial+final sums, then
    a closed-form entropy finisher — merge is associative vector addition
    (SURVEY.md §4 custom item 2), finisher is pure column arithmetic."""
    ws = _ws(spark, sf_dir, id_cols=["doc_id", "source"])
    agg = ws.groupBy("source").agg(
        F.sum("win_len").alias("total_len"),
        F.sum("cnt_a").alias("cnt_a"),
        F.sum("cnt_c").alias("cnt_c"),
        F.sum("cnt_g").alias("cnt_g"),
        F.sum("cnt_t").alias("cnt_t"),
        F.sum("cnt_n").alias("cnt_n"),
    )
    ln = F.col("total_len").cast("double")
    oth = (
        F.col("total_len")
        - F.col("cnt_a")
        - F.col("cnt_c")
        - F.col("cnt_g")
        - F.col("cnt_t")
        - F.col("cnt_n")
    ).cast("double")
    terms = []
    for colname in ("cnt_a", "cnt_c", "cnt_g", "cnt_t", "cnt_n"):
        x = F.col(colname).cast("double")
        terms.append(F.when(x > 0, (x / ln) * F.log2(x / ln)).otherwise(0.0))
    terms.append(F.when(oth > 0, (oth / ln) * F.log2(oth / ln)).otherwise(0.0))
    ent = -sum(terms[1:], start=terms[0])
    return agg.select(
        "source",
        "total_len",
        "cnt_a",
        "cnt_c",
        "cnt_g",
        "cnt_t",
        "cnt_n",
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy6_merged"),
    )


def queries() -> dict:
    return dict(QUERIES)


def oracle_sql() -> dict:
    return dict(ORACLES)
