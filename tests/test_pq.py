"""IVF-PQ tests: exact agreement of fit/encode with an independent pure-
Python reference (written against the spec, not the Spark code), ADC
correctness, and plan shape (zero joins in the encode pass)."""

import pyspark.sql.functions as F
import pytest

from fasta_windows_spark.operators import cluster as C

K, D, N_ITER, M, DS, KS, PQ_ITER = 8, 64, 1, 8, 8, 16, 1


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _py_reference(rows):
    """Dict-based IVF-PQ replica: integer quantize, Lloyd's coarse fit
    (init = k lowest ids, half-up integer means, empty cells keep their
    centroid), residual split into M subspaces, per-subspace k-means with
    the same conventions, leftmost-lowest-code tie-breaks."""
    fvs = {r.vec_id: [round(x * C.SCALE) for x in r.embedding] for r in rows}

    def argmin(v, cents):
        pk = min(
            sum((a - b) * (a - b) for a, b in zip(v, c)) * len(cents) + i
            for i, c in enumerate(cents)
        )
        return pk % len(cents)

    cents = [fvs[i][:] for i in sorted(fvs)[:K]]
    for _ in range(N_ITER):
        sums, cnt = {}, {}
        for fv in fvs.values():
            c = argmin(fv, cents)
            cnt[c] = cnt.get(c, 0) + 1
            s = sums.setdefault(c, [0] * D)
            for p, x in enumerate(fv):
                s[p] += x
        new = [c[:] for c in cents]
        for c in sums:
            for p in range(D):
                new[c][p] = (2 * sums[c][p] + cnt[c]) // (2 * cnt[c])
        cents = new
    res = {}
    for vid, fv in fvs.items():
        c = argmin(fv, cents)
        res[vid] = (c, [x - y for x, y in zip(fv, cents[c])])
    books = [
        [res[vid][1][s * DS:(s + 1) * DS] for vid in sorted(fvs)[:KS]]
        for s in range(M)
    ]
    for _ in range(PQ_ITER):
        sums, cnt = {}, {}
        for c, rv in res.values():
            for s in range(M):
                sv = rv[s * DS:(s + 1) * DS]
                code = argmin(sv, books[s])
                key = (s, code)
                cnt[key] = cnt.get(key, 0) + 1
                acc = sums.setdefault(key, [0] * DS)
                for p, x in enumerate(sv):
                    acc[p] += x
        new = [[c[:] for c in sub] for sub in books]
        for (s, code), acc in sums.items():
            n = cnt[(s, code)]
            for p in range(DS):
                new[s][code][p] = (2 * acc[p] + n) // (2 * n)
        books = new
    codes = {
        vid: (c, tuple(argmin(rv[s * DS:(s + 1) * DS], books[s]) for s in range(M)))
        for vid, (c, rv) in res.items()
    }
    return fvs, cents, books, res, codes


def test_pq_fit_and_encode_match_python_reference_exactly(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    fvs, cents_py, books_py, res_py, codes_py = _py_reference(rows)

    cents, books = C.pq_fit(emb, k=K, n_iter=N_ITER, m=M, ks=KS, pq_iter=PQ_ITER)
    assert cents == cents_py
    assert books == books_py

    enc = {
        r.vec_id: (r.cell, tuple(r[f"code_{i}"] for i in range(M)))
        for r in C.pq_encode_with(emb, cents, books, m=M).collect()
    }
    assert enc == codes_py


def test_pq_search_adc_matches_python(spark, emb):
    """ADC top-10 equals the reference scoring: LUT distances from codes,
    probed cells only, (d2_adc, vec_id) order."""
    rows = emb.select("vec_id", "embedding").collect()
    fvs, cents, books, res, codes = _py_reference(rows)
    qf = fvs[0]
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qf, c)), i)
        for i, c in enumerate(cents)
    )
    probes = {i for _, i in ranked[:2]}
    scored = []
    for vid, (cell, cv) in codes.items():
        if vid == 0 or cell not in probes:
            continue
        qres = [qf[i] - cents[cell][i] for i in range(D)]
        d2 = sum(
            sum(
                (qres[s * DS + j] - books[s][cv[s]][j]) ** 2
                for j in range(DS)
            )
            for s in range(M)
        )
        scored.append((d2, vid, cell))
    want = [(v, c, d) for d, v, c in sorted(scored)[:10]]
    got = [
        (r.vec_id, r.cell, r.d2_adc)
        for r in C.pq_search(
            emb, query_vec_id=0, k=K, n_iter=N_ITER, m=M, ks=KS,
            pq_iter=PQ_ITER, nprobe=2, topk=10,
        ).collect()
    ]
    assert got == want


def test_pq_encode_plan_is_joinless_and_jvm_only(spark, emb):
    """Encode under fitted tables: one narrow pass against plan literals —
    no Join nodes, no Exchange (beyond the scan), no Python."""
    cents, books = C.pq_fit(emb, k=K, n_iter=N_ITER, m=M, ks=KS, pq_iter=PQ_ITER)
    plan = (
        C.pq_encode_with(emb, cents, books, m=M)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_pq_rerank_recall_floor(spark, sf_dir):
    """VERDICT r4 #4: the two-stage pipeline (ADC shortlist -> exact
    re-rank) must recover >= 0.8 recall@10 vs brute force — raw ADC alone
    measured 0.4. Pinned at the production params (nprobe=3,
    shortlist=160) the contract's emb_pq_reranked ships with; measured
    1.0 at sf0.001 and 0.9 at sf0.01 when this floor was set."""
    from fasta_windows_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = {
        r.neighbor_id
        for r in S.knn_topk_exact(emb, query_ids=[0], k=10).collect()
    }
    got = {
        r.vec_id
        for r in C.pq_rerank_search(
            emb, query_vec_id=0, k=K, n_iter=N_ITER, m=M, ks=KS,
            pq_iter=PQ_ITER, nprobe=3, shortlist=160, topk=10,
        ).collect()
    }
    assert len(truth & got) / len(truth) >= 0.8


def test_pq_compression_accounting():
    """The index row is 1 cell byte + M code bytes (ks <= 256) vs D*4
    float32 bytes — the ~28x figure quoted in the contract docstring."""
    assert (D * 4) // (1 + M) == 28
