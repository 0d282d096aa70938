"""Driver-style Spark vs DuckDB oracle comparison (mimics CORRECTNESS_r{N})."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.float64)  # unify int widths / nullables
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def _dtype_kind(dtype) -> str:
    s = str(dtype)
    if s == "bool" or s == "boolean":
        return "bool"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime"):
        return "datetime"
    return "str"


def assert_dtype_kind_parity(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = ""):
    """Driver-hash guard: the driver stringifies values before hashing, so a
    column that is int64 on the Spark side but float64 from DuckDB (the
    HUGEINT-promotion trap — e.g. `//` or list_sum over BIGINT) renders as
    '42' vs '42.0' and hash-fails even when values are equal. canon()'s
    int->float unification deliberately masks width, so this check runs on
    the RAW frames. Caught live by emb_kmeans_cells/search in r4
    (CORRECTNESS_r04.json); fix is ::BIGINT casts in the oracle."""
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        ka, kb = _dtype_kind(spark_pdf[c].dtype), _dtype_kind(duck_pdf[c].dtype)
        assert ka == kb, (
            f"{name}.{c}: dtype kind mismatch spark={spark_pdf[c].dtype} ({ka}) "
            f"vs oracle={duck_pdf[c].dtype} ({kb}) — driver hash will diverge; "
            f"if the oracle side is float for an integer column, suspect DuckDB "
            f"HUGEINT promotion and add a ::BIGINT cast in the oracle SQL"
        )


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = ""):
    assert_dtype_kind_parity(spark_pdf, duck_pdf, name)
    a, b = canon(spark_pdf), canon(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns differ: {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row counts {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == object:
            assert (av == bv).all(), f"{name}.{c}: string mismatch\n{av[av != bv][:5]}"
        else:
            an = pd.isna(av)
            bn = pd.isna(bv)
            assert (an == bn).all(), f"{name}.{c}: null placement differs"
            ok = np.isclose(
                av[~an].astype(float), bv[~bn].astype(float), rtol=0, atol=1e-9
            )
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {(~ok).sum()} value mismatches, e.g. "
                    f"{av[~an][bad]} vs {bv[~bn][bad]}"
                )


def run_pair(spark, sf_dir: str, query_fn, sql: str, name: str = ""):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    duck_pdf = con.execute(sql).df()
    con.close()
    compare_frames(spark_pdf, duck_pdf, name)
    return len(spark_pdf)


def nan_to_none(x):
    return None if isinstance(x, float) and math.isnan(x) else x
