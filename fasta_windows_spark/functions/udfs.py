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


def _scalar_fields(fields: list | None) -> list:
    """Subset of SCALAR_FIELDS to emit (None = all), declaration order kept."""
    if fields is None:
        return SCALAR_FIELDS
    want = set(fields)
    unknown = want - {n for n, _ in SCALAR_FIELDS}
    if unknown:
        raise ValueError(f"unknown window-stat fields: {sorted(unknown)}")
    return [(n, t) for n, t in SCALAR_FIELDS if n in want]


def window_stats_schema(
    id_fields: list,
    with_ctw: bool = False,
    with_vectors: bool = False,
    fields: list | None = None,
) -> T.StructType:
    out = [T.StructField(n, t) for n, t in id_fields]
    out += [
        T.StructField("w_start", T.LongType()),
        T.StructField("w_end", T.LongType()),
    ]
    out += [T.StructField(n, t) for n, t in _scalar_fields(fields)]
    if with_ctw:
        out.append(T.StructField("ctw", T.DoubleType()))
    if with_vectors:
        for k in KMER_KS:
            out.append(
                T.StructField(f"k{k}_vec", T.ArrayType(T.IntegerType(), False))
            )
    return T.StructType(out)


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
    use_arrow: bool | None = None,
    fields: list | None = None,
) -> DataFrame:
    """Explode `df` into positional windows of `text_col` with all statistics.

    One output row per (document, window). `id_cols` pass through unchanged.
    ``f32`` keeps the reference's f32 division semantics; oracle-checked
    queries pass f32=False and round at the edge.

    ``fields``: emit only these scalar stat columns (default all). This is
    projection pushdown through the Python boundary — Catalyst cannot prune
    columns INSIDE a mapInArrow, so a downstream agg that needs 3 of the 22
    scalars would otherwise pay Arrow IPC for all 22 on every window. The
    kernel still computes its fused tables; only finisher emission is cut.

    use_arrow (default True): mapInArrow fast path — the text column's
    Arrow layout (one concatenated UTF-8 buffer + offsets) feeds the kernel
    ZERO-COPY, skipping pandas/Python-string materialization entirely
    (~5x on large pages). Sliding windows run as ceil(window/step)
    phase-shifted vectorized passes (kernels.batch_window_stats_concat_sliding);
    use_arrow=False keeps the row-at-a-time reference path for differential
    testing.
    """
    if use_arrow is None:
        use_arrow = True
    if use_arrow:
        return _window_stats_arrow(
            df, text_col, id_cols, window, step, masked, with_ctw, with_vectors,
            f32, fields
        )
    id_cols = id_cols or ["doc_id"]
    in_df = df.select(*id_cols, text_col)  # column pruning before the UDF
    id_fields = [(c, in_df.schema[c].dataType) for c in id_cols]
    schema = window_stats_schema(
        [(n, t) for n, t in id_fields], with_ctw, with_vectors, fields
    )
    emit_fields = _scalar_fields(fields)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].tolist()
            doc_idx, starts, ends, hists, kvecs, ctw = batch_window_stats(
                texts, window, step, masked, with_ctw
            )
            if len(starts) == 0:
                # a zero-window batch (e.g. all-empty texts) must not yield:
                # an empty pandas frame loses the object dtype the vector
                # columns need for Arrow list conversion
                continue
            st = stats_table(hists, kvecs, masked=masked, f32=f32)
            out = {}
            for c in id_cols:
                out[c] = pdf[c].to_numpy()[doc_idx]
            out["w_start"] = starts
            out["w_end"] = ends
            for name, _ in emit_fields:
                out[name] = st[_STAT_KEY.get(name, name)]
            if with_ctw:
                out["ctw"] = ctw
            res = pd.DataFrame(out)
            if with_vectors:
                for k in KMER_KS:
                    res[f"k{k}_vec"] = list(kvecs[k].astype(np.int32))
            yield res

    return in_df.mapInPandas(compute, schema=schema)


def _arrow_string_parts(col):
    """Zero-copy (data uint8 view, per-row lengths) from an Arrow string
    array — Arrow's layout IS the kernel's concatenated-buffer input."""
    import numpy as np
    import pyarrow as pa

    if col.null_count:
        import pyarrow.compute as pc

        col = pc.fill_null(col, "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ]
    lengths = np.diff(offsets)
    return data, lengths


# Per-chunk working set target. The kernel's temps (int32 rolling codes,
# bincount keys, per-window count matrices) are ~25-30x the text bytes, so
# the chunk must be sized for the PRIVATE L2 (2 MB/core here), not the
# shared L3: with 32 KB text the whole kernel working set is ~1 MB and every
# core runs cache-resident. Measured on this host (pure multiprocessing,
# batch_window_stats_concat, W=1000): 2 MB chunks = 11 MB/s/core at 4 procs
# collapsing to 4.7 at 16 (L3 blown, DRAM-throttled VM); 32 KB chunks =
# 37 MB/s/core at BOTH 4 and 16 procs (597 MB/s aggregate, 0.99 scaling).
CHUNK_TEXT_BYTES = 32 << 10

# Output grouping: per-chunk results are tiny (32 windows); building Arrow
# arrays per chunk would dominate, so finisher + Arrow emission run once per
# EMIT_TEXT_BYTES of accumulated kernel output.
EMIT_TEXT_BYTES = 4 << 20


def _doc_chunks(lengths, target_bytes: int = CHUNK_TEXT_BYTES):
    """Doc-aligned (row_start, row_end, byte_start, byte_end) chunks."""
    import numpy as np

    out = []
    r0 = b0 = acc = 0
    for i, ln in enumerate(np.asarray(lengths)):
        acc += int(ln)
        if acc >= target_bytes:
            out.append((r0, i + 1, b0, b0 + acc))
            r0, b0, acc = i + 1, b0 + acc, 0
    if acc or r0 < len(lengths):
        out.append((r0, len(lengths), b0, b0 + acc))
    return out


# A doc longer than this is segmented into window-aligned sub-chunks so one
# chromosome/book-scale row can't force a single kernel call whose transients
# (~30x text bytes x window/step overlap factor) blow past the L2-resident
# design (ADVICE r1). 4x CHUNK keeps small docs on the grouped fast path.
OVERSIZE_DOC_BYTES = 4 * CHUNK_TEXT_BYTES


def _segment_starts_per_chunk(window: int, step: int, target_bytes: int) -> int:
    """Window starts owned per segment: ~target_bytes of owned span, and at
    least 4x the inter-segment overlap (window-step) so re-scanned overlap
    bytes stay <= 25% even when window >> target."""
    m = max(1, target_bytes // step)
    if window > step:
        m = max(m, -(-(4 * (window - step)) // step))
    return m


def _doc_segments(length: int, window: int, step: int, target_bytes: int):
    """(byte_start, byte_end, n_owned_windows) segments of one oversized doc.

    Segment j owns window starts [j*m, (j+1)*m) (multiples of `step`); its
    byte range extends `window` past the last owned start so every owned
    window sees its full content. Fed to the kernel as a standalone doc, the
    segment emits its owned windows FIRST (kernel output is start-ordered),
    so the caller keeps the first n_owned rows and shifts starts/ends by
    byte_start — bit-identical to running the whole doc in one call (the
    tail segment's end-clamp coincides with the true doc end)."""
    m = _segment_starts_per_chunk(window, step, target_bytes)
    n_starts = -(-length // step)  # == len(window_bounds(length, ...))
    out = []
    j = 0
    while j * m < n_starts:
        owned = min((j + 1) * m, n_starts) - j * m
        b0 = j * m * step
        b1 = min((j * m + owned - 1) * step + window, length)
        out.append((b0, b1, owned))
        j += 1
    return out


def _window_stats_arrow(
    df, text_col, id_cols, window, step, masked, with_ctw, with_vectors, f32,
    fields=None,
):
    import numpy as np
    import pyarrow as pa

    from ..kernels import batch_window_stats_concat_sliding, stats_table

    id_cols = id_cols or ["doc_id"]
    in_df = df.select(*id_cols, text_col)
    id_fields = [(c, in_df.schema[c].dataType) for c in id_cols]
    schema = window_stats_schema(id_fields, with_ctw, with_vectors, fields)
    emit_fields = _scalar_fields(fields)

    from ..kernels import KMER_KS as _KS

    # rows per output RecordBatch: Arrow list offsets are int32, so a slice
    # must keep n * 4^kmax < 2^31 (a single huge doc at step=1 can produce
    # tens of millions of windows in one kernel call); 2M also bounds the
    # finisher's transient matrices
    EMIT_MAX_WINDOWS = 2_000_000

    def emit(full_batch, parts):
        # concatenate per-chunk kernel outputs, run the vectorized finisher
        # ONCE over each bounded row-slice, build Arrow arrays once per
        # slice — per-chunk Python/Arrow overhead stays amortized while the
        # kernel itself runs on L2-resident chunks
        doc_idx = np.concatenate([r0 + p[0] for r0, p in parts])
        starts = np.concatenate([p[1] for _, p in parts])
        ends = np.concatenate([p[2] for _, p in parts])
        hists = np.vstack([p[3] for _, p in parts])
        kvecs = {k: np.vstack([p[4][k] for _, p in parts]) for k in _KS}
        ctw = (
            np.concatenate([p[5] for _, p in parts]) if with_ctw else None
        )
        for s0 in range(0, len(starts), EMIT_MAX_WINDOWS):
            s1 = min(s0 + EMIT_MAX_WINDOWS, len(starts))
            sl_kvecs = {k: kvecs[k][s0:s1] for k in _KS}
            st = stats_table(hists[s0:s1], sl_kvecs, masked=masked, f32=f32)
            take = pa.array(doc_idx[s0:s1], type=pa.int64())
            arrays, names = [], []
            for c in id_cols:
                arrays.append(
                    full_batch.column(full_batch.schema.get_field_index(c)).take(take)
                )
                names.append(c)
            arrays += [
                pa.array(starts[s0:s1], pa.int64()),
                pa.array(ends[s0:s1], pa.int64()),
            ]
            names += ["w_start", "w_end"]
            for name, _ in emit_fields:
                key = _STAT_KEY.get(name, name)
                vals = st[key]
                if name.startswith("cnt_") or name == "win_len":
                    arrays.append(pa.array(np.asarray(vals, dtype=np.int64)))
                else:
                    # from_pandas=True: NaN -> NULL, matching the pandas
                    # path and the oracles' nullif() convention
                    arrays.append(
                        pa.array(np.asarray(vals, dtype=np.float64), from_pandas=True)
                    )
                names.append(name)
            if with_ctw:
                arrays.append(pa.array(ctw[s0:s1], pa.float64(), from_pandas=True))
                names.append("ctw")
            if with_vectors:
                n = s1 - s0
                for k in KMER_KS:
                    flat = pa.array(
                        sl_kvecs[k].reshape(-1).astype(np.int32), pa.int32()
                    )
                    offs = pa.array(
                        np.arange(n + 1, dtype=np.int64) * (4**k), pa.int32()
                    )
                    arrays.append(pa.ListArray.from_arrays(offs, flat))
                    names.append(f"k{k}_vec")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    eff_step = step if step is not None else window

    def trim_segment(res, keep: int, base: int):
        # owned windows are the first `keep` rows (start-ordered single doc);
        # shift positions from segment-local to doc coordinates
        doc_idx, starts, ends, hists, kvecs, ctw = res
        sl = slice(0, keep)
        return (
            doc_idx[sl],
            starts[sl] + base,
            ends[sl] + base,
            hists[sl],
            {k: kvecs[k][sl] for k in _KS},
            ctw[sl] if with_ctw else None,
        )

    def compute(batches):
        for full_batch in batches:
            ftext = full_batch.column(full_batch.schema.get_field_index(text_col))
            fdata, flengths = _arrow_string_parts(ftext)
            parts, acc = [], 0

            def flush_maybe():
                nonlocal parts, acc
                if acc >= EMIT_TEXT_BYTES:
                    out, parts, acc = parts, [], 0
                    return out
                return None

            # split rows into runs of normal docs (grouped chunks, as before)
            # and oversized docs (window-aligned per-doc segments)
            big_rows = set(np.nonzero(flengths > OVERSIZE_DOC_BYTES)[0].tolist())
            row_offsets = np.concatenate(([0], np.cumsum(flengths)))
            run_start = 0
            for i in list(sorted(big_rows)) + [len(flengths)]:
                # normal run [run_start, i)
                if i > run_start:
                    base_b = int(row_offsets[run_start])
                    for r0, r1, b0, b1 in _doc_chunks(flengths[run_start:i]):
                        res = batch_window_stats_concat_sliding(
                            fdata[base_b + b0 : base_b + b1],
                            flengths[run_start + r0 : run_start + r1],
                            window,
                            step,
                            with_ctw=with_ctw,
                        )
                        if len(res[1]) == 0:
                            continue
                        parts.append((run_start + r0, res))
                        acc += b1 - b0
                        done = flush_maybe()
                        if done:
                            yield from emit(full_batch, done)
                if i == len(flengths):
                    break
                # oversized doc at row i
                db0 = int(row_offsets[i])
                for b0, b1, owned in _doc_segments(
                    int(flengths[i]), window, eff_step, CHUNK_TEXT_BYTES
                ):
                    res = batch_window_stats_concat_sliding(
                        fdata[db0 + b0 : db0 + b1],
                        np.array([b1 - b0], dtype=np.int64),
                        window,
                        step,
                        with_ctw=with_ctw,
                    )
                    res = trim_segment(res, owned, b0)
                    if len(res[1]) == 0:
                        continue
                    parts.append((i, res))
                    acc += b1 - b0
                    done = flush_maybe()
                    if done:
                        yield from emit(full_batch, done)
                run_start = i + 1
            if parts:
                yield from emit(full_batch, parts)

    return in_df.mapInArrow(compute, schema=schema)


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
        from ..kernels import window_bounds, entropy6, ctw_bits_per_base_many

        for pdf in batches:
            rows = {c: [] for c in id_cols}
            starts, ends, ents, wins = [], [], [], []
            for i, text in enumerate(pdf[text_col].tolist()):
                buf = (text or "").encode("utf-8")
                for s, e in window_bounds(len(buf), window, step):
                    for c in id_cols:
                        rows[c].append(pdf[c].iloc[i])
                    starts.append(s)
                    ends.append(e)
                    wins.append(buf[s:e])
                    ents.append(entropy6(buf[s:e]))
            out = pd.DataFrame(rows)
            out["w_start"] = starts
            out["w_end"] = ends
            out["entropy6"] = ents
            # window-vectorized CTW (lockstep across the whole batch)
            out["ctw"] = ctw_bits_per_base_many(wins, max_depth)
            yield out

    return in_df.mapInPandas(compute, schema=schema)
