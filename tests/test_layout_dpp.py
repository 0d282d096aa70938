"""Dynamic partition pruning over the Hive-partitioned corpus layout:
the join-derived partition filter must reach the fact scan (plan shows the
dynamicpruning subquery) and must actually skip non-matching partitions."""

import os

from fasta_windows_spark.operators import layout
from tests.conftest import SF_DIR


def test_dpp_prunes_partitions(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "part_docs")
    layout.partitioned_write(docs, out, by="lang")
    langs = sorted(
        d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")
    )
    assert len(langs) >= 3  # enough partitions for pruning to matter

    dim_rows = [(lang, 1 if i == 0 else 0) for i, lang in enumerate(langs)]
    q = layout.dpp_join_probe(spark, out, dim_rows, by="lang")

    plan = q._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, "no DPP subquery reached the fact scan"

    rows = q.collect()
    keep_lang = dim_rows[0][0]
    want = docs.where(f"lang = '{keep_lang}'").count()
    assert [(r["lang"], r["count"]) for r in rows] == [(keep_lang, want)]


def test_static_partition_filter_prunes_at_plan_time(spark, tmp_path):
    """Literal partition predicates prune without DPP: the scan's
    PartitionFilters carry the predicate (planning-time pruning)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "part_docs2")
    layout.partitioned_write(docs, out, by="lang")
    lang = sorted(
        d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")
    )[0]
    q = spark.read.parquet(out).where(f"lang = '{lang}'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert f"isnotnull(lang" in plan or lang in plan
    assert q.count() == docs.where(f"lang = '{lang}'").count()


def test_range_partition_audit_covers_and_orders(spark):
    """Buckets partition the corpus (counts sum to total), key ranges are
    non-overlapping and ordered, and loads are within 2x of balanced on
    this near-uniform key."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = layout.range_partition_audit(docs, "n_chars", 8).collect()
    assert [r.bucket for r in rows] == list(range(8))
    assert sum(r.n_rows for r in rows) == docs.count()
    for a, b in zip(rows, rows[1:]):
        assert a.key_max <= b.key_min
    for r in rows:
        assert 125000 / 2 <= r.load_ppm <= 125000 * 2


def test_range_partition_audit_flags_skew(spark):
    """A constant-heavy key puts the mass in one bucket — the audit must
    SHOW the imbalance, not smooth it away."""
    rows_in = [(i, 100) for i in range(90)] + [(100 + i, 1000 + i) for i in range(10)]
    df = spark.createDataFrame(rows_in, "doc_id long, n_chars long")
    rows = layout.range_partition_audit(df, "n_chars", 4).collect()
    by_bucket = {r.bucket: r.load_ppm for r in rows}
    assert max(by_bucket.values()) >= 800000  # the constant key dominates

    import pytest as _pytest

    with _pytest.raises(ValueError):
        layout.range_partition_audit(df, "n_chars", 1)
