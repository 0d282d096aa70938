"""Distributed k-means (Lloyd's) over an embedding column — the real fit
behind the IVF coarse quantizer (`similarity.ivf_centroids` documents the
lowest-id stand-in; this trains actual centroids that drop into the same
broadcast-table slot).

Everything numeric is INTEGER fixed-point (the `graph.pagerank` precedent):
vectors quantize once to `round(v * SCALE)` BIGINTs, squared distances and
per-cell sums are exact integer arithmetic, and the centroid update is an
integer half-up division on the driver. Consequences:

- **bit-deterministic**: integer addition is associative, so the
  distributed per-cell sums are identical under any partitioning/AQE plan,
  and a rerun reproduces centroids EXACTLY (float partial-agg order would
  drift in the last ulp and could flip a boundary assignment);
- **lockstep-testable**: a plain-python reference consuming the same
  quantized vectors must match assignment-for-assignment, iteration by
  iteration (`tests/test_kmeans.py`) — no tolerance windows hiding bugs.

Scale shape per iteration: one broadcast of k centroid rows, one narrow
argmin pass (packed-BIGINT `min` — a HashAggregate with map-side partials,
the `ivf_assign` shape; the shuffle carries one 8-byte key per vector per
partition), one posexplode sum to k*d rows, and a k*d-row collect for the
driver-side update (metadata-sized, like `linalg.pca`'s Gramian). At
10^12 vectors you fit on a deterministic sample (`sampling.py`) and assign
the full corpus once — the assignment pass is the `ivf_assign` production
path.

Overflow budget: |fx| <= SCALE * |v|_max; d2 <= d * (2*fx_max)^2 must stay
below 2^63 / k for the packed argmin key — with SCALE=1e6, unit-norm-ish
embeddings and d=64, d2 <= ~2.6e14, fine through k ~ 30k.

Large-k note: `_assign` embeds the k*d centroid integers as expression
literals (zero-join, right for quantizer-sized k); past a few thousand
centroids switch to the `similarity.ivf_assign` broadcast-table crossJoin
form — same packed-argmin HashAggregate, centroids shipped as data instead
of plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 1_000_000


def _longs_sql(xs) -> str:
    """SQL literal for array<bigint> — built as ONE expression string.
    Composing these from per-element `F.lit` Columns costs a py4j JVM
    roundtrip per element (~1 ms each; a k=8,d=64 centroid table is 512
    calls ~ 0.3 s of pure driver latency per plan build, measured), so
    every quantizer-sized literal here goes through the SQL parser
    instead."""
    return "array(" + ",".join(f"{int(x)}L" for x in xs) + ")"


def _longs2_sql(xss) -> str:
    """SQL literal for array<array<bigint>>."""
    return "array(" + ",".join(_longs_sql(xs) for xs in xss) + ")"


def _longs3_sql(xsss) -> str:
    """SQL literal for array<array<array<bigint>>>."""
    return "array(" + ",".join(_longs2_sql(xss) for xss in xsss) + ")"


def quantize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, fv: array<bigint>) — the fixed-point vectors every stage
    (and the test reference) consumes."""
    return emb.select(
        F.col(id_col),
        F.expr(
            f"transform(cast({vec_col} as array<double>), "
            f"x -> cast(round(x * {SCALE}) as bigint))"
        ).alias("fv"),
    )


def _assign(
    q: DataFrame,
    centroids: list[list[int]],
    id_col: str,
    keep_fv: bool = False,
) -> DataFrame:
    """(id, cell, d2[, fv]) — exact-integer argmin over the centroid
    literals, ties to the lowest cell id via the packed key
    (d2 * k + cell). ``keep_fv`` carries the quantized vector through so
    downstream per-row folds (e.g. distance-to-query) need no join."""
    k = len(centroids)
    cells = F.expr(
        "array("
        + ",".join(
            f"struct({i} as cid, {_longs_sql(c)} as cv)"
            for i, c in enumerate(centroids)
        )
        + ")"
    )
    d2 = (
        "aggregate(zip_with(fv, c.cv, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    packed = F.expr(
        f"array_min(transform(_cells, c -> ({d2}) * {k} + c.cid))"
    )
    extra = ["fv"] if keep_fv else []
    return (
        q.withColumn("_cells", cells)
        .select(id_col, *extra, packed.alias("_pk"))
        .select(
            id_col,
            *extra,
            F.pmod("_pk", F.lit(k)).cast("int").alias("cell"),
            # integer `div`, not float `/`: packed keys may exceed 2^53
            # within the documented 2^63 budget, where double division
            # would silently lose low bits of d2
            F.expr(f"(_pk - pmod(_pk, {k})) div {k}").alias("d2"),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_inertia: bool = True,
    _quantized: DataFrame | None = None,
) -> tuple[list[list[int]], list[int]]:
    """Lloyd's iterations to (at most) `n_iter`, early-stop on a fixed
    point. Init = the k lowest-id vectors (the `ivf_centroids` convention,
    deterministic). Returns (integer centroids, exact inertia history in
    SCALE^2 units); `centroids_df` renders them for `ivf_assign`/
    `ivf_search`. Empty cells keep their previous centroid.

    ``with_inertia=False`` folds the per-iteration inertia out of the
    stats aggregate (its value nothing downstream of the fit consumes —
    assign/search/PQ paths pass False; the returned history is then
    empty). Centroids are identical either way."""
    # quantize once and pin it: every iteration re-scans this frame, and
    # localCheckpoint keeps the per-iteration plans shallow (the
    # connected-components / pagerank lineage protocol). Callers that
    # already hold the pinned (id, fv) frame (semdedup assigns under the
    # same quantizer right after fitting) pass it via `_quantized` so the
    # corpus is quantized and materialized exactly once.
    q = (
        _quantized
        if _quantized is not None
        else quantize(emb, id_col, vec_col).localCheckpoint(eager=True)
    )
    init = (
        q.orderBy(id_col).limit(k).select("fv").collect()
    )
    centroids = [list(r["fv"]) for r in init]
    d = len(centroids[0])
    inertia: list[int] = []
    for _ in range(n_iter):
        # keep_fv carries the vector through the argmin, so the per-cell
        # sums need no shuffle join back to q — ONE job per iteration:
        # narrow assign -> posexplode -> partial-agg sums -> k*d-row
        # collect. Inertia rides the same aggregate (sum of d2 on the
        # pos==0 slice, each vector's d2 counted exactly once).
        a = _assign(q, centroids, id_col, keep_fv=True)
        stats = (
            a.select("cell", "d2", F.posexplode("fv").alias("pos", "fx"))
            .groupBy("cell", "pos")
            .agg(
                F.sum("fx").alias("s"),
                F.count("*").alias("n"),
                F.sum("d2").alias("sd2"),
            )
            .collect()
        )
        if with_inertia:
            inertia.append(sum(int(r["sd2"]) for r in stats if r["pos"] == 0))
        new = [list(c) for c in centroids]
        for r in stats:
            s, n = int(r["s"]), int(r["n"])
            # integer round-half-up of s/n, sign-correct (floor form)
            new[r["cell"]][r["pos"]] = (2 * s + n) // (2 * n)
        if new == centroids:
            break
        centroids = new
    return centroids, inertia


def centroids_df(spark, centroids: list[list[int]]) -> DataFrame:
    """Render fitted integer centroids as the (centroid_id, cvec double)
    broadcast table `ivf_assign(..., centroids=...)` consumes."""
    return spark.createDataFrame(
        [(i, [x / SCALE for x in c]) for i, c in enumerate(centroids)],
        "centroid_id INT, cvec ARRAY<DOUBLE>",
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (id, cell, d2) under the FITTED centroids
    (one more exact-integer argmin pass over the full input)."""
    centroids, _ = kmeans_fit(emb, k, n_iter, id_col, vec_col,
                              with_inertia=False)
    return _assign(quantize(emb, id_col, vec_col), centroids, id_col)


def kmeans_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 8,
    n_iter: int = 5,
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search under the TRAINED quantizer: probe the `nprobe`
    cells nearest the query, rank candidates inside them by exact-integer
    squared L2 to the query, return the top-k — (id, cell, d2) with a
    deterministic total order (d2 asc, id asc), so the result set is
    unique and oracle-exact.

    Plan shape: the probe choice is DRIVER arithmetic over the k already-
    collected integer centroids (metadata, no job); cell assignment and
    distance-to-query are BOTH folds over the same quantized row (the
    centroids and the query vector are plan literals), so candidates come
    from one narrow pass — no join anywhere — and the top-k compiles to
    TakeOrderedAndProject (per-partition k-heaps, driver merge)."""
    q = quantize(emb, id_col, vec_col)
    centroids, _ = kmeans_fit(emb, k, n_iter, id_col, vec_col,
                              with_inertia=False)
    qf = [int(x) for x in q.where(F.col(id_col) == query_vec_id).first()["fv"]]
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qf, c)), i)
        for i, c in enumerate(centroids)
    )
    probe_cells = [i for _, i in ranked[:nprobe]]
    qlit = F.expr(_longs_sql(qf))
    d2q = F.expr(
        "aggregate(zip_with(fv, _qf, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    return (
        _assign(q, centroids, id_col, keep_fv=True)
        .where(F.col("cell").isin(probe_cells) & (F.col(id_col) != query_vec_id))
        .withColumn("_qf", qlit)
        .select(id_col, "cell", d2q.alias("d2"))
        .orderBy(F.asc("d2"), F.asc(id_col))
        .limit(topk)
    )


# --- IVF-PQ: product quantization on coarse residuals --------------------------
#
# The 100 TB ANN memory story: a raw float32 corpus index is d*4 bytes per
# vector (256 B at d=64); IVF-PQ stores one coarse cell id + m sub-codes
# (m bytes at ks<=256) — ~28x smaller here (256 B -> 9 B at d=64, m=8) — and searches with per-query
# precomputed distance TABLES (ADC), so the per-candidate cost is m integer
# table adds instead of a d-dim dot product. Everything stays in the repo's
# integer fixed-point regime (quantize/SCALE), so codebooks, codes, and ADC
# distances are bit-deterministic under any partitioning and exactly
# reproducible by an unrolled DuckDB CTE chain — the same property that
# made kmeans_fit oracle-gateable.
#
# Overflow budget: sub-d2 <= ds*(2*fx_max)^2 with residual fx_max ~ 2e6 at
# SCALE=1e6, so packed keys (d2*ks + cid) stay < ~2e15 << 2^63 for
# ds=8, ks<=256; ADC totals sum m of those, same budget as the full d2.


def _sub_slices(res_col: str, m: int, ds: int) -> str:
    """SQL for exploding a residual vector into m (sub, sv) structs."""
    return (
        f"transform(sequence(0, {m - 1}), s -> struct(s as sub, "
        f"slice({res_col}, s * {ds} + 1, {ds}) as sv))"
    )


def pq_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 1,
    m: int = 8,
    ks: int = 16,
    pq_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple:
    """Train the IVF-PQ index: coarse k-means (kmeans_fit), then per-
    subspace k-means over the coarse RESIDUALS (vector - its centroid).
    Returns (coarse_centroids k x d, codebooks m x ks x ds), all integers.

    Init mirrors the coarse convention: per subspace, the ks lowest-id
    vectors' sub-residuals. Update = integer half-up mean; empty codes
    keep the previous entry. ALL m subspaces train in ONE Spark job per
    iteration: residuals explode to (id, sub, sv) rows and the argmin
    runs against the full codebook literal keyed by sub — so the job
    count is O(pq_iter), independent of m."""
    # fail fast on an invalid m BEFORE the coarse fit (one LIMIT-1 probe
    # job vs discovering a bad subspace split after n_iter corpus passes)
    d_probe = int(emb.select(F.size(vec_col)).first()[0])
    ds = d_probe // m
    assert ds * m == d_probe, (d_probe, m)
    centroids, _ = kmeans_fit(emb, k, n_iter, id_col, vec_col,
                              with_inertia=False)
    q = quantize(emb, id_col, vec_col)
    cent_lit = F.expr(_longs2_sql(centroids))
    res = (
        _assign(q, centroids, id_col, keep_fv=True)
        .withColumn("_cents", cent_lit)
        .select(
            id_col,
            "cell",
            F.expr(
                "zip_with(fv, element_at(_cents, cell + 1), (x, y) -> x - y)"
            ).alias("rv"),
        )
    )
    # one narrow explode to (id, sub, sv); localCheckpoint pins it across
    # the pq iterations (the kmeans_fit lineage protocol)
    rs = (
        res.select(
            id_col, F.explode(F.expr(_sub_slices("rv", m, ds))).alias("s")
        )
        .select(id_col, F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
        .localCheckpoint(eager=True)
    )
    init = rs.where(F.col(id_col) < ks).orderBy("sub", id_col).collect()
    books = [[None] * ks for _ in range(m)]
    for r in init:
        rank = sum(1 for r2 in init if r2["sub"] == r["sub"] and r2[id_col] < r[id_col])
        books[r["sub"]][rank] = [int(x) for x in r["sv"]]
    for _ in range(pq_iter):
        # keep_sv carries the sub-residual through the argmin — the
        # per-code sums need no shuffle join back to rs (the kmeans_fit
        # single-job-per-iteration shape)
        a = _pq_assign(rs, books, id_col, keep_sv=True)
        stats = (
            a.select("sub", "code", F.posexplode("sv").alias("pos", "fx"))
            .groupBy("sub", "code", "pos")
            .agg(F.sum("fx").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [[list(c) for c in sub] for sub in books]
        for r in stats:
            s, n = int(r["s"]), int(r["n"])
            new[r["sub"]][r["code"]][r["pos"]] = (2 * s + n) // (2 * n)
        if new == books:
            break
        books = new
    return centroids, books


def _books_lit(books) -> F.Column:
    return F.expr(_longs3_sql(books))


def _pq_assign(
    rs: DataFrame, books, id_col: str, keep_sv: bool = False
) -> DataFrame:
    """(id, sub, code[, sv]) — per-subspace exact-integer argmin against
    the codebook literal, ties to the lowest code id (packed key).
    ``keep_sv`` carries the sub-residual through so the training update
    needs no join back to the residual frame."""
    ks = len(books[0])
    d2 = (
        "aggregate(zip_with(sv, element_at(element_at(_books, sub + 1), cid + 1), "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"
    )
    packed = F.expr(
        f"array_min(transform(sequence(0, {ks - 1}), cid -> ({d2}) * {ks} + cid))"
    )
    extra = ["sv"] if keep_sv else []
    return (
        rs.withColumn("_books", _books_lit(books))
        .select(id_col, "sub", *extra, packed.alias("_pk"))
        .select(
            id_col,
            "sub",
            *extra,
            F.pmod("_pk", F.lit(ks)).cast("int").alias("code"),
        )
    )


def pq_encode(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 1,
    m: int = 8,
    ks: int = 16,
    pq_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + encode: (id, cell, code_0..code_{m-1}) — the compressed index
    rows a 100 TB corpus materializes (1 + m small ints per vector). One
    narrow pass after the fits: coarse argmin, residual, per-subspace
    argmin — all against plan literals, zero joins."""
    centroids, books = pq_fit(emb, k, n_iter, m, ks, pq_iter, id_col, vec_col)
    return pq_encode_with(emb, centroids, books, m, id_col, vec_col)


def pq_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 8,
    n_iter: int = 1,
    m: int = 8,
    ks: int = 16,
    pq_iter: int = 1,
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC (asymmetric distance computation) search: probe the nprobe
    cells nearest the query, score every candidate from its CODES alone
    via per-query distance tables — LUT[cell][sub][code] =
    d2(query_residual_sub, codebook[sub][code]) — precomputed on the
    driver (k*m*ks integers, metadata-sized) and embedded as plan
    literals. Per candidate the score is m integer table adds; no joins,
    no d-dim arithmetic, TakeOrderedAndProject top-k. Integer throughout,
    so (d2_adc, id) is a total order and the result set is oracle-exact."""
    centroids, books = pq_fit(emb, k, n_iter, m, ks, pq_iter, id_col, vec_col)
    d = len(centroids[0])
    ds = d // m
    q = quantize(emb, id_col, vec_col)
    qf = [int(x) for x in q.where(F.col(id_col) == query_vec_id).first()["fv"]]
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qf, c)), i)
        for i, c in enumerate(centroids)
    )
    probe_cells = [i for _, i in ranked[:nprobe]]
    # driver-side ADC tables: query residual per cell, d2 per codebook entry
    lut = [
        [
            [
                sum(
                    (qr - cb) * (qr - cb)
                    for qr, cb in zip(
                        [
                            qf[sub * ds + j] - centroids[cell][sub * ds + j]
                            for j in range(ds)
                        ],
                        books[sub][code],
                    )
                )
                for code in range(ks)
            ]
            for sub in range(m)
        ]
        for cell in range(k)
    ]
    lut_lit = F.expr(_longs3_sql(lut))
    enc = pq_encode_with(emb, centroids, books, m, id_col, vec_col)
    adc = " + ".join(
        f"element_at(element_at(element_at(_lut, cell + 1), {s + 1}), code_{s} + 1)"
        for s in range(m)
    )
    return (
        enc.where(F.col("cell").isin(probe_cells) & (F.col(id_col) != query_vec_id))
        .withColumn("_lut", lut_lit)
        .select(id_col, "cell", F.expr(adc).alias("d2_adc"))
        .orderBy(F.asc("d2_adc"), F.asc(id_col))
        .limit(topk)
    )


def pq_encode_with(
    emb: DataFrame,
    centroids,
    books,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode under ALREADY-FITTED tables (the production shape: fit on a
    sample once, encode the corpus many times)."""
    d = len(centroids[0])
    ds = d // m
    ks_ = len(books[0])
    q = quantize(emb, id_col, vec_col)
    cent_lit = F.expr(_longs2_sql(centroids))
    d2 = (
        "aggregate(zip_with(s.sv, element_at(element_at(_books, s.sub + 1), cid + 1), "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"
    )
    codes = F.expr(
        f"transform({_sub_slices('rv', m, ds)}, s -> "
        f"cast(array_min(transform(sequence(0, {ks_ - 1}), "
        f"cid -> ({d2}) * {ks_} + cid)) % {ks_} as int))"
    )
    return (
        _assign(q, centroids, id_col, keep_fv=True)
        .withColumn("_cents", cent_lit)
        .withColumn("_books", _books_lit(books))
        .withColumn(
            "rv",
            F.expr("zip_with(fv, element_at(_cents, cell + 1), (x, y) -> x - y)"),
        )
        .select(id_col, "cell", codes.alias("_codes"))
        .select(
            id_col,
            "cell",
            *[
                F.element_at("_codes", i + 1).alias(f"code_{i}")
                for i in range(m)
            ],
        )
    )


def pq_rerank_search(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 8,
    n_iter: int = 1,
    m: int = 8,
    ks: int = 16,
    pq_iter: int = 1,
    nprobe: int = 2,
    shortlist: int = 40,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full production ANN pipeline: PQ-ADC shortlist (cheap,
    approximate, over the ~28x-compressed index) -> exact-integer re-rank
    of the shortlist against the ORIGINAL vectors -> top-k. This is how a
    100 TB deployment recovers exact-search quality from a lossy index:
    the d-dim arithmetic touches only `shortlist` rows per query instead
    of the corpus. Returns (id, cell, d2) under exact d2-to-query with
    the (d2, id) total order — oracle-exact like its parts."""
    short = pq_search(
        emb, query_vec_id, k, n_iter, m, ks, pq_iter, nprobe,
        topk=shortlist, id_col=id_col, vec_col=vec_col,
    ).select(id_col, "cell")
    q = quantize(emb, id_col, vec_col)
    qf = [int(x) for x in q.where(F.col(id_col) == query_vec_id).first()["fv"]]
    qlit = F.expr(_longs_sql(qf))
    d2q = F.expr(
        "aggregate(zip_with(fv, _qf, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    return (
        q.join(F.broadcast(short), id_col)
        .withColumn("_qf", qlit)
        .select(id_col, "cell", d2q.alias("d2"))
        .orderBy(F.asc("d2"), F.asc(id_col))
        .limit(topk)
    )


def _min_d2_expr(centers_fv: list[list[int]]) -> str:
    """SQL: min exact-integer squared distance from the row's fv to the
    given center vectors, embedded as ONE parsed literal (the _longs_sql
    rationale — no per-element py4j roundtrips)."""
    return (
        f"array_min(transform({_longs2_sql(centers_fv)}, "
        "cv -> aggregate(zip_with(fv, cv, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)))"
    )


def _fps_pick(q: DataFrame, k: int, id_col: str) -> list:
    """Greedy farthest-point iterations over the quantized frame:
    [(pick, id, d2_at_pick, fv), ...]. Pick 0 is the lowest id (the
    deterministic seed, like kmeans init); pick i maximizes the min exact
    d2 to the already-picked set, ties to the lowest id, already-picked
    ids excluded (so duplicate vectors cannot be re-picked at d2 = 0).
    Each iteration is ONE TakeOrderedAndProject job returning ONE row —
    k-1 passes total, no wide shuffle anywhere."""
    first = (
        q.orderBy(id_col).limit(1).select(id_col, "fv").collect()[0]
    )
    sel = [(0, first[0], 0, [int(x) for x in first[1]])]
    for i in range(1, k):
        picked_ids = ", ".join(str(int(s[1])) for s in sel)
        cand = q.where(
            ~F.col(id_col).isin([s[1] for s in sel])
        ).select(
            id_col,
            "fv",
            F.expr(_min_d2_expr([s[3] for s in sel])).alias("d2"),
        )
        row = cand.orderBy(F.desc("d2"), id_col).limit(1).collect()[0]
        sel.append((i, row[0], int(row[2]), [int(x) for x in row[1]]))
    return sel


def fps_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Farthest-point-sampling coreset (the k-center greedy 2-approximation,
    Gonzalez 1985): k maximally-spread vectors — the diversity-first data
    selection primitive (embedding-space coverage, active-learning seed
    pools, k-center init) complementing DSIR's importance-first sampling.

    Integer fixed-point throughout (the kmeans regime): quantized vectors,
    exact d2, DESC-d2/ASC-id total order — so the picked SET and each
    pick's d2 are bit-identical cross-engine and the whole greedy chain is
    hash-checkable against an unrolled-CTE oracle. Returns (pick, id,
    d2) — d2 being the pick's distance to the set before it, the
    monotonically non-increasing Gonzalez radius sequence.

    Scale: k driver-coordinated passes, each one TakeOrderedAndProject
    (no wide Exchange). FPS is inherently sequential in k; for corpus-
    scale pools run it on the deterministic sample (operators/sampling)
    like every coreset construction — k stays coreset-sized either way.
    """
    qdf = quantize(emb, id_col, vec_col)
    sel = _fps_pick(qdf, k, id_col)
    return emb.sparkSession.createDataFrame(
        [(p, int(v), int(d)) for p, v, d, _ in sel],
        f"pick bigint, {id_col} bigint, d2 bigint",
    )


def fps_coverage(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coverage audit of the FPS coreset: one row with the pool size, the
    exact k-center radius^2 (max over vectors of min d2 to the coreset —
    the quantity Gonzalez greedy 2-approximates) and the summed
    quantization cost. One full pass: min-d2 against the k center
    literals per row, then a single reduce."""
    qdf = quantize(emb, id_col, vec_col)
    sel = _fps_pick(qdf, k, id_col)
    d2 = qdf.select(
        F.expr(_min_d2_expr([s[3] for s in sel])).alias("d2")
    )
    return d2.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.max("d2").cast("long").alias("radius2"),
        F.sum("d2").cast("long").alias("cost"),
    )
