"""Bucketed-table evidence: the 'co-located join' claims made throughout
the operator docstrings, demonstrated concretely — bucket layout replaces
the shuffle at write time."""

import pyspark.sql.functions as F

from fasta_windows_spark.plans import checks
from fasta_windows_spark.session import write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_tables_join_and_group_without_exchange(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join strategy must rely on co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = write_bucketed(
            docs.select("doc_id", "n_chars"), "bkt_a", "doc_id", buckets=4
        )
        b = write_bucketed(
            docs.select("doc_id", "lang"), "bkt_b", "doc_id", buckets=4
        )
        joined = a.join(b, "doc_id").select("doc_id", "n_chars", "lang")
        p = checks.plan_string(joined, "simple")
        assert "Exchange" not in p, p          # co-located: no shuffle
        assert "SortMergeJoin" in p, p         # bucket+sort order reused
        assert joined.count() == docs.count()

        grouped = a.groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
        pg = checks.plan_string(grouped, "simple")
        assert "Exchange" not in pg, pg        # groupBy rides the buckets
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_unbucketed_same_join_shuffles(spark):
    """Control: the identical join on plain parquet needs two Exchanges —
    the cost write_bucketed moves to write time."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = docs.select("doc_id", "n_chars")
        b = docs.select("doc_id", "lang")
        p = checks.plan_string(a.join(b, "doc_id"), "simple")
        assert p.count("Exchange") >= 2, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
