"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over fasta_windows_spark.contract, which holds every
(Spark query, DuckDB oracle) pair. See SURVEY.md §2 for the operator
inventory each query covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fasta_windows_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full per-window statistics suite over sf0.001
    documents (the freq_windows.tsv analog, fw.rs:236-283)."""
    return contract.queries()["doc_windows_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
