"""Integer fixed-point k-means (operators/cluster.py): exact lockstep with
a plain-python Lloyd's reference on the same quantized vectors — no
tolerance windows, every assignment and centroid must match bit-for-bit,
iteration by iteration (possible because all distributed arithmetic is
integer, hence associativity-safe under any partitioning)."""

import pyspark.sql.functions as F

from fasta_windows_spark.operators import cluster as C
from fasta_windows_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.01"


def _quantized(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = C.quantize(emb).collect()
    return emb, {int(r["vec_id"]): [int(x) for x in r["fv"]] for r in rows}


def _ref_lloyd(vecs: dict, k: int, n_iter: int):
    """Plain-python reference: same init, same packed-key tie-break, same
    integer half-up mean. Returns (per-iter assignments, centroids,
    inertia history)."""
    centroids = [list(vecs[i]) for i in sorted(vecs)[:k]]
    history = []
    inertia = []
    for _ in range(n_iter):
        assign = {}
        tot = 0
        for vid, fv in vecs.items():
            best = min(
                (sum((x - y) * (x - y) for x, y in zip(fv, c)) * k + ci)
                for ci, c in enumerate(centroids)
            )
            assign[vid] = (best % k, best // k)
            tot += best // k
        history.append(assign)
        inertia.append(tot)
        new = [list(c) for c in centroids]
        for cell in range(k):
            members = [vecs[v] for v, (c, _) in assign.items() if c == cell]
            if not members:
                continue
            n = len(members)
            for pos in range(len(new[cell])):
                s = sum(m[pos] for m in members)
                new[cell][pos] = (2 * s + n) // (2 * n)
        if new == centroids:
            break
        centroids = new
    return history, centroids, inertia


def test_kmeans_lockstep_with_python_reference(spark):
    emb, vecs = _quantized(spark)
    k, n_iter = 8, 4
    ref_hist, ref_centroids, ref_inertia = _ref_lloyd(vecs, k, n_iter)

    got_centroids, got_inertia = C.kmeans_fit(emb, k=k, n_iter=n_iter)
    assert got_inertia == ref_inertia[: len(got_inertia)]
    assert got_centroids == ref_centroids

    got = {
        int(r["vec_id"]): (int(r["cell"]), int(r["d2"]))
        for r in C.kmeans_assign(emb, k=k, n_iter=n_iter).collect()
    }
    # final assignment = one more argmin under the fitted centroids
    want = {
        vid: min(
            ((sum((x - y) * (x - y) for x, y in zip(fv, c)) * k + ci)
             for ci, c in enumerate(ref_centroids)),
        )
        for vid, fv in vecs.items()
    }
    want = {vid: (p % k, p // k) for vid, p in want.items()}
    assert got == want


def test_kmeans_inertia_monotone_and_deterministic(spark):
    emb, _ = _quantized(spark)
    c1, i1 = C.kmeans_fit(emb, k=8, n_iter=5)
    assert all(b <= a for a, b in zip(i1, i1[1:])), i1
    # bit-exact rerun (integer sums are partitioning-independent)
    c2, i2 = C.kmeans_fit(emb.repartition(7), k=8, n_iter=5)
    assert c1 == c2 and i1 == i2


def test_kmeans_centroids_drop_into_ivf(spark):
    """The fitted centroids render as the same broadcast-table shape the
    IVF quantizer stand-in produces, and assigning with them spreads the
    corpus over multiple non-empty cells."""
    emb, _ = _quantized(spark)
    centroids, _ = C.kmeans_fit(emb, k=8, n_iter=3)
    cdf = C.centroids_df(spark, centroids)
    assert cdf.columns == sim.ivf_centroids(emb).columns
    cells = (
        C.kmeans_assign(emb, k=8, n_iter=3)
        .groupBy("cell").count().collect()
    )
    assert len(cells) >= 4
    assert sum(r["count"] for r in cells) == emb.count()


def test_kmeans_search_plan_and_recall(spark):
    """The trained-ANN search plan must stay narrow: top-k via
    TakeOrderedAndProject, no wide Exchange anywhere (probe choice is
    driver arithmetic; candidates ride the narrow assignment pass). And
    probing 2/8 cells must still recover most of the exact top-10."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = C.kmeans_search(emb, query_vec_id=0, k=8, n_iter=2, nprobe=2, topk=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan

    got = {int(r["vec_id"]) for r in out.collect()}
    assert len(got) == 10
    # exact top-10 by the same integer metric, no cell restriction
    _, vecs = _quantized(spark)
    qf = vecs[0]
    exact = sorted(
        (sum((a - b) * (a - b) for a, b in zip(fv, qf)), vid)
        for vid, fv in vecs.items() if vid != 0
    )[:10]
    exact_ids = {vid for _, vid in exact}
    recall = len(got & exact_ids) / 10
    assert recall >= 0.5, (recall, sorted(got), sorted(exact_ids))


def test_semdedup_matches_python_reference(spark):
    """SemDeDup keep-first partition matches a plain-python reference on
    the same quantized vectors under the same fitted centroids: removed
    iff an earlier-id cell-mate sits at cosine >= 2/5, the threshold
    evaluated in exact integer arithmetic (no float cosine anywhere)."""
    from fasta_windows_spark.operators import dedup as D

    emb, vecs = _quantized(spark)
    k, n_iter = 8, 2
    centroids, _ = C.kmeans_fit(emb, k, n_iter, with_inertia=False)
    cells = {}
    for vid, fv in vecs.items():
        best = min(
            (sum((x - y) * (x - y) for x, y in zip(fv, c)) * k + ci)
            for ci, c in enumerate(centroids)
        )
        cells.setdefault(best % k, []).append(vid)
    n2 = {v: sum(x * x for x in fv) for v, fv in vecs.items()}
    expected = {}
    for cell, members in cells.items():
        for vid in members:
            removed = any(
                (d := sum(p * q for p, q in zip(vecs[vid], vecs[o]))) > 0
                and 25 * d * d >= 4 * n2[vid] * n2[o]
                for o in members
                if o < vid
            )
            expected[vid] = (cell, 0 if removed else 1)
    got = {
        int(r["vec_id"]): (int(r["cell"]), int(r["kept"]))
        for r in D.semdedup(emb, k=k, n_iter=n_iter).collect()
    }
    assert got == expected
    assert sum(1 for _, kept in got.values() if kept == 0) > 0, (
        "threshold must actually remove something at this scale"
    )


# --- farthest-point sampling (C.fps_select / fps_coverage) ---


def _fps_python(vecs: dict, k: int):
    """Greedy k-center reference over quantized integer vectors."""
    sel = [min(vecs)]
    d2s = {0: 0}
    for i in range(1, k):
        best = None
        for vid, fv in vecs.items():
            if vid in sel:
                continue
            d2 = min(
                sum((a - b) * (a - b) for a, b in zip(fv, vecs[s]))
                for s in sel
            )
            key = (-d2, vid)
            if best is None or key < best[0]:
                best = (key, vid, d2)
        sel.append(best[1])
        d2s[i] = best[2]
    return sel, d2s


def test_fps_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.pick: (r.vec_id, r.d2)
        for r in C.fps_select(emb, k=6).collect()
    }
    q = {
        r.vec_id: [int(x) for x in r.fv]
        for r in C.quantize(emb).collect()
    }
    sel, d2s = _fps_python(q, 6)
    assert [out[i][0] for i in range(6)] == sel
    assert all(out[i][1] == d2s[i] for i in range(6))
    # Gonzalez radius sequence is non-increasing after pick 1
    picks = [out[i][1] for i in range(1, 6)]
    assert all(a >= b for a, b in zip(picks, picks[1:]))


def test_fps_skips_duplicate_vectors(spark):
    # three distinct points, two of them duplicated — k=3 must pick the
    # three DISTINCT points, never a 0-distance duplicate
    pts = {0: [0.0, 0.0], 1: [0.0, 0.0], 2: [1.0, 0.0], 3: [0.0, 1.0],
           4: [1.0, 0.0]}
    emb = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id for r in C.fps_select(emb, k=3).collect()}
    assert got == {0, 2, 3}


def test_fps_coverage_consistent(spark):
    import random

    rng = random.Random(9)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cov = C.fps_coverage(emb, k=5).collect()[0]
    assert cov.n_vectors == 40
    # radius2 can't exceed the last pick's d2 (the pool's farthest point
    # before the final center was added) and is the max of the min-d2 map
    last = C.fps_select(emb, k=5).collect()[-1]
    assert cov.radius2 <= last.d2
    assert cov.cost >= cov.radius2


def test_hard_negatives_excludes_exact_dups(spark):
    """Exact duplicate vectors (d2 = 0) are positives, never negatives;
    every mined negative shares the anchor's cell; per-anchor cap holds;
    ranking is closest-first."""
    import random

    from fasta_windows_spark.operators import similarity as S

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(30)]
    rows.append((30, list(rows[0][1])))  # exact dup of vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.hard_negatives(emb, k=2, n_iter=1, n_per_anchor=3).collect()
    assert all(r.d2 >= 1 for r in out)
    mined = {(r.anchor, r.neg) for r in out}
    assert (0, 30) not in mined and (30, 0) not in mined
    per_anchor = {}
    for r in out:
        per_anchor.setdefault(r.anchor, []).append((r.rn, r.d2))
    for ranked in per_anchor.values():
        assert len(ranked) <= 3
        ranked.sort()
        d2s = [d for _, d in ranked]
        assert d2s == sorted(d2s)
