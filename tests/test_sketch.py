"""Count-min sketch invariants beyond the oracle gate: the one-sided error
bound, exactness at collision-free width, and sketch mergeability (the
property that makes the partial aggregate a per-partition sketch)."""

import pyspark.sql.functions as F

from fasta_windows_spark.operators.sketch import (
    cms_estimates,
    cms_heavy_hitters,
    cms_sketch,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_cms_estimate_is_one_sided(spark):
    out = cms_heavy_hitters(_docs(spark), width=32, depth=4, frac=50).toPandas()
    assert len(out) > 0
    assert (out.est_cnt >= out.exact_cnt).all()
    # width=32 over this vocabulary MUST collide somewhere, or the
    # overestimate path is untested
    assert (out.est_cnt > out.exact_cnt).any()


def test_cms_exact_at_collision_free_width(spark):
    """With width >> vocabulary and depth 8, every estimate that survives
    a min across 8 independent rows equals the exact count."""
    docs = _docs(spark)
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").cast("long").alias("exact_cnt"))
    sketch = cms_sketch(docs, width=65536, depth=8)
    est = cms_estimates(exact, sketch, width=65536, depth=8)
    j = est.join(exact, "tok").toPandas()
    assert len(j) > 0
    assert (j.est_cnt == j.exact_cnt).all()


def test_cms_sketches_merge_by_cellwise_addition(spark):
    """sketch(A union B) == cellwise sum of sketch(A) and sketch(B) — the
    distributed-merge property the map-side partial aggregate relies on."""
    docs = _docs(spark)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    whole = {
        (r.row, r.bucket): r.cnt
        for r in cms_sketch(docs, width=32, depth=4).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms_sketch(part, width=32, depth=4).collect():
            merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.cnt
    assert merged == whole
