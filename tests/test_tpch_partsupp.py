"""Invariants of the DERIVED partsupp table (contract §11b).

/root/testdata ships no partsupp, so Q2/Q11/Q16/Q20 run over a partsupp
derived deterministically from part × supplier (dbgen's 4-suppliers-per-part
shape). These tests pin the derivation's contract — the four query/oracle
pairs themselves are hash-gated by the parametrized contract test.
"""

import pyspark.sql.functions as F

from fasta_windows_spark.contract import _partsupp, _tbl
from tests.conftest import SF_DIR, SF_DIR_MED


def test_partsupp_primary_key_and_ranges(spark):
    for sf_dir in (SF_DIR, SF_DIR_MED):
        ps = _partsupp(spark, sf_dir)
        s_cnt = _tbl(spark, sf_dir, "supplier").count()
        p_cnt = _tbl(spark, sf_dir, "part").count()
        agg = ps.agg(
            F.count("*").alias("n"),
            F.countDistinct("ps_partkey", "ps_suppkey").alias("pk"),
            F.min("ps_suppkey").alias("min_s"),
            F.max("ps_suppkey").alias("max_s"),
            F.min("ps_availqty").alias("min_q"),
            F.max("ps_availqty").alias("max_q"),
            F.min("ps_supplycost_cents").alias("min_c"),
        ).collect()[0]
        # exactly 4 rows per part, (partkey, suppkey) a true primary key
        # (stride S//4+1 is collision-free for the shipped S >= 8)
        assert agg.n == 4 * p_cnt
        assert agg.pk == agg.n
        assert 0 <= agg.min_s and agg.max_s < s_cnt
        assert agg.min_q >= 1 and agg.max_q <= 9999
        assert agg.min_c >= 100


def test_partsupp_deterministic_across_builds(spark):
    a = _partsupp(spark, SF_DIR).toPandas().sort_values(
        ["ps_partkey", "ps_suppkey"]
    ).reset_index(drop=True)
    b = _partsupp(spark, SF_DIR).toPandas().sort_values(
        ["ps_partkey", "ps_suppkey"]
    ).reset_index(drop=True)
    assert a.equals(b)


def test_lineitem_quantity_integral(spark):
    """tpch_q20 sums l_quantity then casts BIGINT; exactness requires the
    synthetic quantities to be integral doubles (they are — pinned here so
    a future data regen that breaks this fails loudly, not as a hash drift)."""
    li = _tbl(spark, SF_DIR, "lineitem")
    bad = li.where(F.col("l_quantity") != F.floor("l_quantity")).count()
    assert bad == 0
