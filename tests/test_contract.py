"""Driver-style correctness gate: every contract query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from fasta_windows_spark import contract
from tests.compare import run_pair
from tests.conftest import SF_DIR

ORACLE_NAMES = sorted(contract.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    rows = run_pair(
        spark, SF_DIR, contract.queries()[name], contract.oracle_sql()[name], name
    )
    assert rows > 0, f"{name}: oracle-checked query returned no rows"


def test_rows_only_queries_run(spark):
    for name, fn in contract.queries().items():
        if name in contract.oracle_sql():
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
