"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; hyperplane-LSH
bucketing is the scale path (candidates only within buckets). Dot products
run as sequential JVM fold expressions (aggregate/zip_with) so the DuckDB
oracle (list_dot_product on DOUBLE[]) reproduces them bit-for-bit; the
numpy-matmul variant in ``knn_bruteforce_numpy`` is the high-throughput
path for real workloads (SIMD reassociates sums, so it is not oracle-gated).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _dot(a: str, b: str) -> F.Column:
    """Sequential-fold dot product of two array<double> columns (JVM-side)."""
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")


def cosine_neighbors(
    emb: DataFrame,
    query_vec_id: int = 0,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine similarity of every vector against one query vector
    (broadcast), keeping matches >= threshold. Narrow plan: broadcast join +
    per-row fold, no shuffle."""
    e = emb.withColumn("_v", F.col(vec_col).cast("array<double>"))
    q = (
        e.where(F.col(id_col) == query_vec_id)
        .select(F.col("_v").alias("_q"))
    )
    joined = e.where(F.col(id_col) != query_vec_id).crossJoin(F.broadcast(q))
    cos = _dot("_v", "_q") / (
        F.sqrt(_dot("_v", "_v")) * F.sqrt(_dot("_q", "_q"))
    )
    return (
        joined.select(F.col(id_col), F.round(cos, 5).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# deterministic hyperplanes from a fixed LCG (seeded, no RNG state at runtime)
def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    x = 88172645463325252
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            # xorshift64 — fixed, reproducible, embeddable in SQL literals
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            row.append((x % 2001) - 1000)
        planes.append(row)
    return planes


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign-bit pattern of `n_planes` dot
    products with fixed integer hyperplanes. At scale, ANN = group by bucket,
    brute-force within buckets only."""
    planes = hyperplanes(n_planes, dim)
    e = emb.withColumn("_v", F.col(vec_col).cast("array<double>"))
    bucket = None
    for i, row in enumerate(planes):
        arr = "array(" + ",".join(f"{w}D" for w in row) + ")"
        d = F.expr(
            f"aggregate(zip_with(_v, {arr}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        )
        bit = F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return e.select(F.col(id_col), bucket.alias("bucket"))


def near_dup_pairs(
    emb: DataFrame,
    n_planes: int = 4,
    dim: int = 64,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-by-embedding path):
    LSH-bucket every vector, self-join only within buckets (doc_a < doc_b),
    exact fold cosine on the candidates, keep >= threshold. All-pairs work
    is confined to buckets (~corpus/2^planes each) — the same
    candidates-only shape as the MinHash/SimHash band joins. Missed pairs
    are those whose sign patterns differ on some hyperplane (recall rises
    with OR-banding over rotations; one table here, like one LSH band)."""
    b = lsh_buckets(emb, n_planes, dim, id_col, vec_col)
    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    be = b.join(e, id_col)
    l = be.select(
        F.col(id_col).alias("doc_a"), F.col("bucket"), F.col("_v").alias("_va")
    )
    r = be.select(
        F.col(id_col).alias("doc_b"), F.col("bucket"), F.col("_v").alias("_vb")
    )
    # shuffle-hash, not sort-merge: bucket is a low-cardinality key (2^planes
    # values) — sorting millions of rows by it buys nothing, and the hash
    # join streams each bucket's rows against an in-memory build side
    cand = l.hint("shuffle_hash").join(r, ["bucket"]).where(
        F.col("doc_a") < F.col("doc_b")
    )
    cos = _dot("_va", "_vb") / (
        F.sqrt(_dot("_va", "_va")) * F.sqrt(_dot("_vb", "_vb"))
    )
    return (
        cand.select("doc_a", "doc_b", F.round(cos, 5).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the `n_centroids` lowest-id
    vectors serve as cell centroids (the sandbox stand-in for a k-means fit;
    the assignment/probe/search plumbing — the part that matters at scale —
    is identical for trained centroids, which would arrive the same way: a
    small broadcast table)."""
    return emb.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF inverted-file assignment: each vector to its nearest centroid by
    squared L2 (= |v|^2 - 2 v.c + |c|^2, all JVM fold expressions over the
    broadcast centroid table). One narrow pass + a per-vector top-1: no
    all-pairs shuffle; at 100 TB this is a map-side broadcast join.

    The argmin is `min` over a single packed BIGINT key
    round(d2*1e6)*C + centroid_id (d2 is already rounded to 6 dp, so the
    integer scaling is exact; lexicographic == (d2 asc, centroid asc)): a
    TRUE HashAggregate with map-side partials — no Sort, no Window (a
    min(struct) encoding falls back to SortAggregate because struct buffers
    aren't hash-aggregable). The shuffle carries one 8-byte long per
    (vector, input partition) instead of C rows. Packing bound: needs
    d2 < 2^63/(1e6*C) — 2.2e6 at C=4096, far above any normalized-embedding
    distance."""
    c = ivf_centroids(emb, n_centroids, id_col, vec_col)
    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    pairs = e.crossJoin(F.broadcast(c))
    d2 = _dot("_v", "_v") - 2 * _dot("_v", "cvec") + _dot("cvec", "cvec")
    packed = (
        F.round(F.round(d2, 6) * 1e6).cast("bigint") * n_centroids
        + F.col("centroid_id")
    )
    return (
        pairs.select(F.col(id_col), packed.alias("_pk"))
        .groupBy(id_col)
        .agg(F.min("_pk").alias("_pk"))
        .select(
            F.col(id_col),
            F.pmod(F.col("_pk"), F.lit(n_centroids)).alias("centroid_id"),
            F.round(
                (F.col("_pk") - F.pmod(F.col("_pk"), F.lit(n_centroids)))
                / n_centroids
                / 1e6,
                6,
            ).alias("dist2"),
        )
    )


def ivf_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search: rank centroids by distance to the query, probe the
    `nprobe` nearest cells, brute-force cosine only within them, return the
    top-k (deterministic tie-break on vec_id). Candidates ~ nprobe/n_centroids
    of the corpus — the standard IVF recall/cost dial."""
    from pyspark.sql import Window

    assign = ivf_assign(emb, n_centroids, id_col, vec_col)
    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    qv = e.where(F.col(id_col) == query_vec_id).select(F.col("_v").alias("_q"))
    c = ivf_centroids(emb, n_centroids, id_col, vec_col)
    cd = c.crossJoin(F.broadcast(qv)).withColumn(
        "_d2",
        F.round(_dot("_q", "_q") - 2 * _dot("_q", "cvec") + _dot("cvec", "cvec"), 6),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (distributed per-partition
    # top-k then driver merge of k-element heaps) — no single-partition window
    probes = (
        cd.orderBy(F.col("_d2").asc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    cands = (
        assign.join(F.broadcast(probes), "centroid_id")
        .where(F.col(id_col) != query_vec_id)
        .join(e, id_col)
        .crossJoin(F.broadcast(qv))
    )
    cos = _dot("_v", "_q") / (F.sqrt(_dot("_v", "_v")) * F.sqrt(_dot("_q", "_q")))
    return (
        cands.withColumn("cosine", F.round(cos, 5))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), "centroid_id", "cosine")
    )


def knn_topk_exact(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-checkable brute-force top-k: sequential-fold cosine (bit-exact
    vs DuckDB list_dot_product — no SIMD reassociation) of every vector
    against a small broadcast query set, then a TWO-STAGE top-k: partial
    top-k per (query, input partition) so the global ranking window only
    sees k * n_partitions rows per query, never the full corpus. The
    numpy/BLAS twin (:func:`knn_bruteforce_numpy`) is the throughput path;
    this one is the verification path (ties broken on rounded cosine then
    neighbor id, deterministic)."""
    from pyspark.sql import Window

    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    q = e.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("_q")
    )
    pairs = e.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("q_id"))
    cos = _dot("_v", "_q") / (F.sqrt(_dot("_v", "_v")) * F.sqrt(_dot("_q", "_q")))
    scored = pairs.select(
        F.col("q_id").alias("vec_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cos, 5).alias("cosine"),
        F.spark_partition_id().alias("_pid"),
    )
    w_part = Window.partitionBy("vec_id", "_pid").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    partial = (
        scored.withColumn("_rn", F.row_number().over(w_part))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_pid")
    )
    w_all = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("_rn", F.row_number().over(w_all))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


KNN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def knn_bruteforce_numpy(
    emb: DataFrame, queries: np.ndarray, query_ids: np.ndarray, k: int = 10
) -> DataFrame:
    """Scale-path brute-force top-k: Arrow batches -> numpy matmul against a
    broadcast query matrix; per-partition top-k then global top-k. This is
    the high-throughput variant (BLAS), used for real ANN workloads."""
    qm = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = qm @ mat.T  # (nq, nb)
            topk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, topk - 1, axis=1)[:, :topk]
            rows = {
                "vec_id": np.repeat(query_ids, topk),
                "neighbor_id": pdf["vec_id"].to_numpy()[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = emb.select("vec_id", "embedding").mapInPandas(compute, KNN_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def sq8_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (min, max) of the fixed-point corpus — the trained
    parameters of the SQ8 scalar quantizer (one row per dimension).

    Scale shape: posexplode -> map-side-combined min/max per dimension —
    the shuffle carries d * n_input_partitions tiny rows, and the result is
    dimension-sized (64 rows here), broadcast to every encode/search stage.
    """
    from .cluster import quantize

    fv = quantize(emb, id_col=id_col, vec_col=vec_col)
    return (
        fv.select(F.posexplode("fv").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def sq8_encode(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """SQ8 scalar quantization (the FAISS ScalarQuantizer/QT_8bit family):
    each dimension of the fixed-point vector maps affinely onto integer
    codes 0..255 using the corpus per-dimension (min, max) from
    :func:`sq8_stats` — 1 byte/dim, 8x smaller than float32 and 4x smaller
    than the PQ path's residual-precision regime, trading recall for a
    codebook-free encoder (no k-means fit).

        code_d = ((x_d - lo_d) * 255) div (hi_d - lo_d)   (0 when hi == lo)

    All arithmetic is exact BIGINT (the fixed-point inputs are integers, the
    affine map is an integer multiply + integer div), so codes — and every
    distance computed from them — are bit-identical in any engine.

    Scale shape: the d-row stats table collapses to ONE array row
    (sorted by dimension inside a size-d array_agg) and broadcasts; encode
    is then a narrow per-row zip_with — no join key, no shuffle of the
    corpus, 100 TB-safe. Output: (id, codes: array<bigint> of 0..255).
    """
    from .cluster import quantize

    stats = sq8_stats(emb, id_col=id_col, vec_col=vec_col)
    packed = stats.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, lo, hi))), "
            "s -> struct(s.lo as lo, s.hi as hi))"
        ).alias("_st")
    )
    fv = quantize(emb, id_col=id_col, vec_col=vec_col)
    code = (
        "zip_with(fv, _st, (x, s) -> CASE WHEN s.hi = s.lo THEN 0L "
        "ELSE ((x - s.lo) * 255) div (s.hi - s.lo) END)"
    )
    return fv.crossJoin(F.broadcast(packed)).select(
        F.col(id_col), F.expr(code).alias("codes")
    )


def sq8_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest neighbours in SQ8 code space: symmetric squared-L2
    over the 0..255 codes (query encoded with the SAME trained quantizer),
    ties broken by id via the packed (d2 * 2^20 + id) BIGINT key so the
    top-k SET is unique and cross-engine exact. d2 <= d * 255^2 (= 4.2M at
    d=64) and the pack budget d2 * 2^20 + id stays far below 2^63 for any
    id < 2^20-scale corpus partition — at larger id spaces widen the pack
    or order by the (d2, id) pair directly.

    Scale shape: the 1-row query code broadcasts; distance is a narrow
    per-row fold; the selection compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort). The integer-regime baseline the
    PQ-ADC path is benchmarked against: same broadcast + fold + top-k
    plan, no codebook LUT."""
    codes = sq8_encode(emb, id_col=id_col, vec_col=vec_col)
    q = codes.where(F.col(id_col) == query_vec_id).select(
        F.col("codes").alias("qc")
    )
    d2 = (
        "aggregate(zip_with(codes, qc, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    return (
        codes.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.expr(d2).alias("d2"))
        .orderBy(F.asc("d2"), F.asc(id_col))
        .limit(k)
    )


def bq_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension corpus sum + corpus count — the trained threshold of
    the 1-bit binary quantizer. The mean threshold is never materialized
    as a float: encode compares ``x * n > s`` in cross-multiplied exact
    BIGINT form, so training emits only integers (sum fits: |x| <= ~1e6
    fixed point times n <= ~1e12 rows stays under 2^63).

    Scale shape: same as sq8_stats — posexplode -> map-side-combined
    sum/count per dimension; shuffle carries d * n_input_partitions tiny
    rows, result is dimension-sized and broadcasts everywhere.
    """
    from .cluster import quantize

    fv = quantize(emb, id_col=id_col, vec_col=vec_col)
    return (
        fv.select(F.posexplode("fv").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    )


def bq_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_fv: bool = False,
) -> DataFrame:
    """1-bit binary quantization (the sign/ITQ-zero-rotation family,
    RaBitQ's 1-bit baseline): bit_d = 1 iff x_d is above the corpus mean
    of dimension d, packed 32 bits per BIGINT word — 32x smaller than the
    fixed-point vectors and 4x smaller than SQ8. The threshold compare is
    cross-multiplied integer (``x * n > s``), the pack is shiftleft+sum of
    0/1 longs, so codes are bit-identical in any engine (words stay in
    [0, 2^32), no sign-bit trap).

    Scale shape: the d-row stats table collapses to ONE broadcast struct
    row (sorted per-dim sums + the global count); encode is a narrow
    per-row zip_with + fold — no join key, no corpus shuffle. ``keep_fv``
    carries the fixed-point vector through for joinless re-ranking.
    Output: (id, words: array<bigint>[, fv]); requires d % 32 == 0 (the
    final slice would otherwise zip against nulls).
    """
    from .cluster import quantize

    stats = bq_stats(emb, id_col=id_col, vec_col=vec_col)
    packed = stats.agg(
        F.expr(
            "struct(transform(array_sort(collect_list(struct(dim, s))), "
            "t -> t.s) as s, max(n) as n)"
        ).alias("_bs")
    )
    fv = quantize(emb, id_col=id_col, vec_col=vec_col)
    bits = "zip_with(fv, _bs.s, (x, s) -> IF(x * _bs.n > s, 1L, 0L))"
    words = (
        f"transform(sequence(0, cast((size(fv) + 31) div 32 as int) - 1), "
        f"j -> aggregate(zip_with(slice({bits}, j * 32 + 1, 32), "
        f"sequence(0, 31), (b, i) -> shiftleft(b, i)), "
        f"0L, (acc, x) -> acc + x))"
    )
    cols = [F.col(id_col), F.expr(words).alias("words")]
    if keep_fv:
        cols.append(F.col("fv"))
    return fv.crossJoin(F.broadcast(packed)).select(*cols)


def bq_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest neighbours in 1-bit code space: Hamming distance
    over the packed words (bit_count of xor, the popcount kernel every
    binary-code ANN system runs), query encoded by the SAME trained
    thresholds, ties broken by id so the top-k SET is unique and
    cross-engine exact.

    Scale shape: 1-row query broadcast + narrow per-row fold +
    TakeOrderedAndProject — the same 0-shuffle plan as sq8_search but
    over 1/4 the bytes; at 100 TB this is the cheapest first-pass filter
    in the quantization ladder (bq -> sq8 -> pq-adc -> exact).
    """
    codes = bq_encode(emb, id_col=id_col, vec_col=vec_col)
    q = codes.where(F.col(id_col) == query_vec_id).select(
        F.col("words").alias("qw")
    )
    ham = (
        "aggregate(zip_with(words, qw, "
        "(x, y) -> cast(bit_count(x ^ y) as bigint)), "
        "0L, (acc, x) -> acc + x)"
    )
    return (
        codes.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.expr(ham).alias("ham"))
        .orderBy(F.asc("ham"), F.asc(id_col))
        .limit(k)
    )


def bq_rerank_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 160,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage binary ANN: Hamming shortlist over the packed words,
    then exact integer squared-L2 re-rank of the shortlist against the
    query's fixed-point vector — the standard deployment of binary codes
    (coarse popcount filter, precise final ordering), mirroring
    emb_pq_reranked's shape. Both stages are total-ordered ((ham, id)
    then (d2, id)) so the result set is unique and hash-exact.

    Scale shape: encode carries fv through (keep_fv) so re-ranking needs
    NO join back to the corpus; stage 1 is the bq_search plan, stage 2
    re-ranks ``shortlist`` rows on the driver-side limit boundary —
    both stages end in TakeOrderedAndProject.
    """
    codes = bq_encode(emb, id_col=id_col, vec_col=vec_col, keep_fv=True)
    q = codes.where(F.col(id_col) == query_vec_id).select(
        F.col("words").alias("qw"), F.col("fv").alias("qf")
    )
    ham = (
        "aggregate(zip_with(words, qw, "
        "(x, y) -> cast(bit_count(x ^ y) as bigint)), "
        "0L, (acc, x) -> acc + x)"
    )
    d2 = (
        "aggregate(zip_with(fv, qf, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    short = (
        codes.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col), F.expr(ham).alias("ham"), F.expr(d2).alias("d2")
        )
        .orderBy(F.asc("ham"), F.asc(id_col))
        .limit(shortlist)
    )
    return (
        short.select(id_col, "d2")
        .orderBy(F.asc("d2"), F.asc(id_col))
        .limit(k)
    )


def hard_negatives(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    n_per_anchor: int = 3,
    min_d2: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: per
    anchor, the n closest SAME-CELL neighbors under the trained IVF
    quantizer that are not duplicates (exact-integer squared L2 >=
    min_d2; the default 1 excludes only d2 = 0 exact copies) — the
    standard "hardest negatives that aren't positives" selection, made
    deterministic by the (d2, id) total order so the mined set is unique
    and hash-exact.

    Scale shape: the candidate join is WITHIN cells only (the same cell
    bound SemDeDup's pair scan relies on — k grows with the corpus so
    cells stay bounded; never an all-pairs join), fv is carried through
    the assignment so pair scoring needs no join back to the corpus, and
    the per-anchor top-n is a row_number window partitioned by anchor
    (millions of partitions — no global sort). Output:
    (anchor, neg, cell, d2, rn), rn in 1..n_per_anchor.
    """
    from pyspark.sql import Window

    from .cluster import _assign, kmeans_fit, quantize

    centroids, _ = kmeans_fit(
        emb, k, n_iter, id_col, vec_col, with_inertia=False
    )
    cells = _assign(
        quantize(emb, id_col=id_col, vec_col=vec_col),
        centroids,
        id_col,
        keep_fv=True,
    )
    a = cells.select(
        F.col(id_col).alias("anchor"), "cell", F.col("fv").alias("afv")
    )
    b = cells.select(
        F.col(id_col).alias("neg"), "cell", F.col("fv").alias("bfv")
    )
    d2 = (
        "aggregate(zip_with(afv, bfv, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("anchor") != F.col("neg"))
        .select("anchor", "neg", "cell", F.expr(d2).alias("d2"))
        .where(F.col("d2") >= min_d2)
    )
    w = Window.partitionBy("anchor").orderBy(F.asc("d2"), F.asc("neg"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= n_per_anchor
    )
