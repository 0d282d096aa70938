"""Arrow-batched UDF wrappers around the numpy kernels.

The central operator is :func:`window_stats` — the Spark re-expression of the
reference's whole per-window pipeline (fw.rs:85-128): explode each document's
text into positional windows and compute every per-window statistic, in ONE
``mapInPandas`` pass with zero per-row Python (BASELINE.json input_hint).

Architecture note (100 TB): positional windows live entirely inside one row,
so this stage is a narrow transformation — no shuffle, no state; it scales
linearly with input splits. Only event-time grouping (streaming module) and
the final export sort ever shuffle. Column pruning still works upstream of
mapInPandas: we select only the needed input columns before the UDF, so the
parquet scan never reads unused columns (e.g. the `html` binary).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.types as T

from ..kernels import KMER_KS, batch_window_stats, stats_table, ctw_bits_per_base

# scalar stats emitted per window (names are the queries()/oracle contract)
SCALAR_FIELDS = [
    ("win_len", T.LongType()),
    ("cnt_a", T.LongType()),
    ("cnt_c", T.LongType()),
    ("cnt_g", T.LongType()),
    ("cnt_t", T.LongType()),
    ("cnt_n", T.LongType()),
    ("gc_prop", T.DoubleType()),
    ("gc_skew", T.DoubleType()),
    ("at_skew", T.DoubleType()),
    ("shannon_entropy", T.DoubleType()),
    ("entropy6", T.DoubleType()),
    ("prop_g", T.DoubleType()),
    ("prop_c", T.DoubleType()),
    ("prop_a", T.DoubleType()),
    ("prop_t", T.DoubleType()),
    ("prop_n", T.DoubleType()),
    ("prop_masked", T.DoubleType()),
    ("cpg_prop", T.DoubleType()),
    ("dinuc_shannon", T.DoubleType()),
    ("trinuc_shannon", T.DoubleType()),
    ("tetranuc_shannon", T.DoubleType()),
    ("kt0", T.DoubleType()),
]

_STAT_KEY = {  # schema name -> stats_table key
    "win_len": "len",
    "cnt_a": "a",
    "cnt_c": "c",
    "cnt_g": "g",
    "cnt_t": "t",
    "cnt_n": "n",
}


def window_stats_schema(
    id_fields: list, with_ctw: bool = False, with_vectors: bool = False
) -> T.StructType:
    fields = [T.StructField(n, t) for n, t in id_fields]
    fields += [
        T.StructField("w_start", T.LongType()),
        T.StructField("w_end", T.LongType()),
    ]
    fields += [T.StructField(n, t) for n, t in SCALAR_FIELDS]
    if with_ctw:
        fields.append(T.StructField("ctw", T.DoubleType()))
    if with_vectors:
        for k in KMER_KS:
            fields.append(
                T.StructField(f"k{k}_vec", T.ArrayType(T.IntegerType(), False))
            )
    return T.StructType(fields)


def window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list | None = None,
    window: int = 100,
    step: int | None = None,
    masked: bool = False,
    with_ctw: bool = False,
    with_vectors: bool = False,
    f32: bool = True,
) -> DataFrame:
    """Explode `df` into positional windows of `text_col` with all statistics.

    One output row per (document, window). `id_cols` pass through unchanged.
    ``f32`` keeps the reference's f32 division semantics; oracle-checked
    queries pass f32=False and round at the edge.
    """
    id_cols = id_cols or ["doc_id"]
    in_df = df.select(*id_cols, text_col)  # column pruning before the UDF
    id_fields = [(c, in_df.schema[c].dataType) for c in id_cols]
    schema = window_stats_schema(
        [(n, t) for n, t in id_fields], with_ctw, with_vectors
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].tolist()
            doc_idx, starts, ends, hists, kvecs, ctw = batch_window_stats(
                texts, window, step, masked, with_ctw
            )
            st = stats_table(hists, kvecs, masked=masked, f32=f32)
            out = {}
            for c in id_cols:
                out[c] = pdf[c].to_numpy()[doc_idx]
            out["w_start"] = starts
            out["w_end"] = ends
            for name, _ in SCALAR_FIELDS:
                out[name] = st[_STAT_KEY.get(name, name)]
            if with_ctw:
                out["ctw"] = ctw
            res = pd.DataFrame(out)
            if with_vectors:
                for k in KMER_KS:
                    res[f"k{k}_vec"] = list(kvecs[k].astype(np.int32))
            yield res

    return in_df.mapInPandas(compute, schema=schema)


def ctw_udf_frame(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list | None = None,
    window: int = 100,
    step: int | None = None,
    max_depth: int = 6,
) -> DataFrame:
    """Entropy-mode analog (entropy.rs:86-156): per-window 6-bin entropy + CTW
    only — the fast path that skips all k-mer work (main.rs:90-95)."""
    id_cols = id_cols or ["doc_id"]
    in_df = df.select(*id_cols, text_col)
    id_fields = [(c, in_df.schema[c].dataType) for c in id_cols]
    schema = T.StructType(
        [T.StructField(n, t) for n, t in id_fields]
        + [
            T.StructField("w_start", T.LongType()),
            T.StructField("w_end", T.LongType()),
            T.StructField("entropy6", T.DoubleType()),
            T.StructField("ctw", T.DoubleType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels import window_bounds, entropy6

        for pdf in batches:
            rows = {c: [] for c in id_cols}
            starts, ends, ents, ctws = [], [], [], []
            for i, text in enumerate(pdf[text_col].tolist()):
                buf = (text or "").encode("utf-8")
                for s, e in window_bounds(len(buf), window, step):
                    for c in id_cols:
                        rows[c].append(pdf[c].iloc[i])
                    starts.append(s)
                    ends.append(e)
                    ents.append(entropy6(buf[s:e]))
                    ctws.append(ctw_bits_per_base(buf[s:e], max_depth))
            out = pd.DataFrame(rows)
            out["w_start"] = starts
            out["w_end"] = ends
            out["entropy6"] = ents
            out["ctw"] = ctws
            yield out

    return in_df.mapInPandas(compute, schema=schema)
