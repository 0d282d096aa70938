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
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(int(x)) for x in c]).alias("cv"),
            )
            for i, c in enumerate(centroids)
        ]
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
) -> tuple[list[list[int]], list[int]]:
    """Lloyd's iterations to (at most) `n_iter`, early-stop on a fixed
    point. Init = the k lowest-id vectors (the `ivf_centroids` convention,
    deterministic). Returns (integer centroids, exact inertia history in
    SCALE^2 units); `centroids_df` renders them for `ivf_assign`/
    `ivf_search`. Empty cells keep their previous centroid."""
    # quantize once and pin it: every iteration re-scans this frame, and
    # localCheckpoint keeps the per-iteration plans shallow (the
    # connected-components / pagerank lineage protocol)
    q = quantize(emb, id_col, vec_col).localCheckpoint(eager=True)
    init = (
        q.orderBy(id_col).limit(k).select("fv").collect()
    )
    centroids = [list(r["fv"]) for r in init]
    d = len(centroids[0])
    inertia: list[int] = []
    for _ in range(n_iter):
        a = _assign(q, centroids, id_col)
        inertia.append(a.agg(F.sum("d2")).collect()[0][0])
        stats = (
            a.join(q, id_col)
            .select("cell", F.posexplode("fv").alias("pos", "fx"))
            .groupBy("cell", "pos")
            .agg(F.sum("fx").alias("s"), F.count("*").alias("n"))
            .collect()
        )
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
    centroids, _ = kmeans_fit(emb, k, n_iter, id_col, vec_col)
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
    centroids, _ = kmeans_fit(emb, k, n_iter, id_col, vec_col)
    qf = [int(x) for x in q.where(F.col(id_col) == query_vec_id).first()["fv"]]
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qf, c)), i)
        for i, c in enumerate(centroids)
    )
    probe_cells = [i for _, i in ranked[:nprobe]]
    qlit = F.array(*[F.lit(x) for x in qf])
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
