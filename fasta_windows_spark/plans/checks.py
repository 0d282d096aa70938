"""Physical-plan assertions: the 'is this the plan I'd want at 100 TB'
checks (column pruning into the scan, predicate pushdown, broadcast joins,
partial aggregation). Used by tests and by .explain-driven tuning."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists of every parquet scan's ReadSchema in the plan."""
    out = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rstrip(">")
            cols = [c.split(":")[0] for c in schema.split(",") if ":" in c]
            out.append(cols)
    return out


def assert_columns_pruned(df: DataFrame, banned: list[str]):
    """Every scan must avoid reading `banned` columns (e.g. the html binary
    — the biggest I/O win at 100 TB, SURVEY.md §4)."""
    schemas = scan_read_schema(df)
    assert schemas, "no parquet scan found in plan"
    for cols in schemas:
        hit = set(cols) & set(banned)
        assert not hit, f"scan reads pruned columns {hit}: {cols}"


def assert_filter_pushed(df: DataFrame, fragment: str):
    p = plan_string(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"expected pushed filter containing {fragment!r}; got: {pushed}"
    )


def assert_broadcast_join(df: DataFrame):
    assert "BroadcastHashJoin" in plan_string(df), "no broadcast hash join in plan"


def assert_partial_aggregation(df: DataFrame):
    """Map-side combine before the shuffle (the mpsc-channel analog done
    right): plan must contain a partial HashAggregate."""
    p = plan_string(df, "simple")
    assert "partial_" in p or "partial" in p.lower(), "no partial aggregation"


def assert_no_shuffle(df: DataFrame):
    """Narrow pipelines (per-page windowing) must not exchange."""
    p = plan_string(df, "simple")
    assert "Exchange" not in p, "unexpected shuffle in narrow pipeline"
