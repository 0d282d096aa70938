"""BM25 retrieval: differential vs a plain-float textbook BM25 (proving the
BIGINT-cleared form IS the same formula), plus plan-shape pins."""

import math

from pyspark.sql import functions as F

from fasta_windows_spark.operators import retrieval
from tests.conftest import SF_DIR


def _textbook_bm25(rows, terms, k1=1.2, b=0.75):
    """Reference scorer: per-term (N-df+0.5)/(df+0.5) pre-log idf times the
    standard tf saturation — floats all the way, no clearing."""
    n = len(rows)
    s = sum(dl for dl, _ in rows.values())
    avgdl = s / n
    df = {t: sum(1 for _, tf in rows.values() if tf[t] > 0) for t in terms}
    out = {}
    for doc_id, (dl, tf) in rows.items():
        score = 0.0
        for t in terms:
            if tf[t] == 0:
                continue
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            score += idf * tf[t] * (k1 + 1) / (tf[t] + k1 * (1 - b + b * dl / avgdl))
        out[doc_id] = score
    return out


def test_bm25_matches_textbook_formula(spark):
    """The cleared-rational score equals the textbook float BM25 to float
    tolerance on every returned document, and the ranking is identical."""
    terms = ("stream", "window", "join")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = retrieval.bm25_search(docs, terms=terms, topk=50).collect()

    pd_rows = retrieval.per_doc_term_stats(docs, terms).collect()
    rows = {
        r["doc_id"]: (r["dl"], {t: r[f"tf_{t}"] for t in terms}) for r in pd_rows
    }
    ref = _textbook_bm25(rows, terms)
    ranked = sorted(
        (d for d in ref if ref[d] > 0), key=lambda d: (-ref[d], d)
    )[:50]
    assert [r["doc_id"] for r in got] == ranked
    for r in got:
        assert math.isclose(r["score"], ref[r["doc_id"]], rel_tol=1e-12)


def test_bm25_scores_stay_below_2_53(spark):
    """The exactness argument requires num/den < 2^53 before the DOUBLE
    cast; pin it on the largest local corpus the driver benches (sf0.1 is
    checked in-session; here the invariant is asserted symbolically from
    the corpus stats so a testdata regeneration that breaks it fails)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    terms = ("stream", "window", "join")
    pd_stats = retrieval.per_doc_term_stats(docs, terms)
    agg = pd_stats.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("s"),
        F.max("dl").alias("max_dl"),
        *[F.max(f"tf_{t}").alias(f"max_tf_{t}") for t in terms],
    ).first()
    n, s = agg["n"], agg["s"]
    max_tf = max(agg[f"max_tf_{t}"] for t in terms)
    # sf0.1 is 100x this corpus in N and S; require headroom for it too
    worst_num = (2 * (100 * n) + 1) * 22 * max_tf * (100 * s)
    worst_den = (2 * (100 * n) + 1) * (
        10 * max_tf * (100 * s) + 3 * (100 * s) + 9 * agg["max_dl"] * (100 * n)
    )
    assert worst_num < 2**53 and worst_den < 2**53, (worst_num, worst_den)


def test_bm25_plan_shape(spark):
    """Single-scan-and-broadcast plan: no Explode/Generate (per-doc stats
    are HOF expressions), the corpus-stats join is a broadcast, top-k is
    TakeOrderedAndProject, and nothing Python crosses the boundary."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        retrieval.bm25_search(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bm25_rejects_unsafe_terms(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pytest

    with pytest.raises(ValueError):
        retrieval.per_doc_term_stats(docs, ("a'b",))
