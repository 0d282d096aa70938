"""Distributed PCA vs an in-memory numpy reference."""

import numpy as np
import pyspark.sql.functions as F

from fasta_windows_spark.operators import linalg
from tests.conftest import SF_DIR


def _numpy_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = ((mat - mean).T @ (mat - mean)) / mat.shape[0]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    return mean, comps * flip[:, None], w[order]


def test_pca_matches_numpy_reference(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.vstack(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()]
    ).astype(np.float64)

    mean, comps, var = linalg.pca_fit(emb, k=3)
    ref_mean, ref_comps, ref_var = _numpy_pca(mat, 3)

    assert np.allclose(mean, ref_mean, atol=1e-9)
    assert np.allclose(var, ref_var, atol=1e-9)
    assert np.allclose(np.abs(comps @ ref_comps.T), np.eye(3), atol=1e-7)
    # orthonormal, variance descending
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    assert var[0] >= var[1] >= var[2] > 0

    proj = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in linalg.pca_project(emb, mean, comps).select("vec_id", "pc").collect()
    }
    ref_proj = (mat - ref_mean) @ ref_comps.T
    got = np.vstack([proj[i] for i in sorted(proj)])
    assert np.allclose(got, ref_proj, atol=1e-7)


def test_pca_partition_invariant(spark):
    """The Gramian reduction must not depend on how rows are split."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    m1, c1, v1 = linalg.pca_fit(emb.repartition(1), k=2)
    m7, c7, v7 = linalg.pca_fit(emb.repartition(7), k=2)
    assert np.allclose(m1, m7, atol=1e-10)
    assert np.allclose(v1, v7, atol=1e-8)
    assert np.allclose(np.abs(c1 @ c7.T), np.eye(2), atol=1e-8)


def test_pca_moves_only_partials(spark):
    """The driver-bound relation is (count, sum, Gramian) per partition —
    row count must not appear in its size."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(4)
    d = 64
    parts = emb.select("embedding").mapInPandas(
        linalg._gramian_partials("embedding", d),
        schema="n long, s array<double>, g array<double>",
    ).collect()
    assert len(parts) <= 4
    assert sum(r["n"] for r in parts) == emb.count()
    assert all(len(r["g"]) == d * d for r in parts)
