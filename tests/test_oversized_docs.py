"""Oversized-document segmentation (ADVICE r1): a doc larger than
OVERSIZE_DOC_BYTES is split into window-aligned sub-chunks with
step-compatible overlap inside the Arrow kernel path, bounding per-call
transients — output must stay bit-identical to whole-doc processing."""

import numpy as np
import pandas as pd
import pytest

from fasta_windows_spark.functions.udfs import (
    OVERSIZE_DOC_BYTES,
    _doc_segments,
    window_stats,
)
from fasta_windows_spark.kernels import window_bounds


@pytest.mark.parametrize(
    "length,window,step",
    [
        (1_000_000, 1000, 1000),  # tumbling
        (1_000_000, 1000, 250),   # sliding
        (1_000_000, 200, 1000),   # gapped (step > window)
        (999_001, 1000, 333),     # non-aligned tail
        (131073, 65536, 1024),    # window >> chunk target
        (5, 1000, 100),           # shorter than one window
    ],
)
def test_doc_segments_cover_all_windows_exactly(length, window, step):
    bounds = window_bounds(length, window, step)
    segs = _doc_segments(length, window, step, target_bytes=32 << 10)
    rebuilt = []
    for b0, b1, owned in segs:
        assert 0 <= b0 < b1 <= length
        local = window_bounds(b1 - b0, window, step)
        # the owned windows are a prefix of the segment's local windows
        assert owned <= len(local)
        for s, e in local[:owned]:
            rebuilt.append((s + b0, e + b0))
        # non-tail segments must give every owned window its full content
        if b1 < length:
            assert local[owned - 1][0] + window <= b1 - b0 + window
    assert rebuilt == bounds


def _mk_docs(spark, texts):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("step", [None, 700, 5000])
def test_oversized_doc_matches_row_path(spark, step):
    rng = np.random.default_rng(7)
    big = "".join(rng.choice(list("ACGTNacgtnxy "), size=OVERSIZE_DOC_BYTES + 12_345))
    small = "ACGT" * 600
    docs = _mk_docs(spark, [big, small, "", big[: 3 * 4096]])
    kw = dict(id_cols=["doc_id"], window=2000, step=step, f32=False, with_vectors=True)
    arrow = (
        window_stats(docs, use_arrow=True, **kw)
        .toPandas()
        .sort_values(["doc_id", "w_start"])
        .reset_index(drop=True)
    )
    rows = (
        window_stats(docs, use_arrow=False, **kw)
        .toPandas()
        .sort_values(["doc_id", "w_start"])
        .reset_index(drop=True)
    )
    assert len(arrow) == len(rows) > 0
    for c in arrow.columns:
        a, b = arrow[c], rows[c]
        if a.dtype == object:  # k-mer vectors
            assert all(np.array_equal(x, y) for x, y in zip(a, b)), c
        elif np.issubdtype(a.dtype, np.floating):
            an, bn = a.isna(), b.isna()
            assert (an == bn).all(), c
            assert np.allclose(a[~an], b[~bn], rtol=0, atol=1e-12), c
        else:
            assert (a == b).all(), c


def test_oversized_doc_ctw_matches_whole(spark):
    # CTW is sequential per window; segmentation must not change any window
    big = ("ACGTACGGTTCA" * (OVERSIZE_DOC_BYTES // 12 + 100))[: OVERSIZE_DOC_BYTES + 5000]
    docs = _mk_docs(spark, [big])
    kw = dict(id_cols=["doc_id"], window=1000, f32=False, with_ctw=True)
    arrow = (
        window_stats(docs, use_arrow=True, **kw)
        .select("doc_id", "w_start", "ctw")
        .toPandas()
        .sort_values(["doc_id", "w_start"])
        .reset_index(drop=True)
    )
    rows = (
        window_stats(docs, use_arrow=False, **kw)
        .select("doc_id", "w_start", "ctw")
        .toPandas()
        .sort_values(["doc_id", "w_start"])
        .reset_index(drop=True)
    )
    assert np.allclose(arrow["ctw"], rows["ctw"], rtol=0, atol=1e-10)


def test_fields_projection_matches_full(spark):
    from fasta_windows_spark.functions.udfs import _scalar_fields

    docs = _mk_docs(spark, ["ACGTacgtn " * 500, "gggcccAAA" * 200])
    kw = dict(id_cols=["doc_id"], window=300, f32=False)
    full = (
        window_stats(docs, **kw)
        .select("doc_id", "w_start", "win_len", "cnt_g", "gc_prop")
        .toPandas()
        .sort_values(["doc_id", "w_start"])
        .reset_index(drop=True)
    )
    trimmed_df = window_stats(docs, fields=["win_len", "cnt_g", "gc_prop"], **kw)
    assert [f.name for f in trimmed_df.schema.fields] == [
        "doc_id", "w_start", "w_end", "win_len", "cnt_g", "gc_prop",
    ]
    trimmed = (
        trimmed_df.drop("w_end")
        .toPandas()
        .sort_values(["doc_id", "w_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, trimmed)
    with pytest.raises(ValueError):
        _scalar_fields(["nope"])
