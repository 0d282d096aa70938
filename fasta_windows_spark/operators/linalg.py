"""Distributed linear algebra over embedding columns: tall-skinny PCA.

The classic Spark decomposition for n >> d: each partition reduces its
vectors to one (count, sum, Gramian) partial with a numpy matmul inside
`mapInPandas` (Arrow-batched, zero per-row Python), the driver sums the
partials and eigen-decomposes the d x d covariance (microseconds for
d <= a few thousand), and the projection broadcasts the k x d component
matrix back through a vectorized pandas UDF. Data moved to the driver is
O(partitions * d^2) — ~32 MB for 1000 partitions at d = 64 — independent
of row count, so the same job runs unchanged at 10^12 rows.

Uses: embedding whitening/compression before ANN, semantic-dedup
preprocessing, cluster visualization, low-rank dimensionality reduction
ahead of IVF coarse quantization.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _gramian_partials(vec_col: str, d: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in it:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return fn


def pca_fit(
    emb: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA: returns (mean[d], components[k, d], explained_variance[k]).

    Components are eigenvectors of the population covariance, ordered by
    descending eigenvalue, each sign-canonicalized (the entry of largest
    magnitude is positive) so results are reproducible across runs — raw
    eigenvector signs are arbitrary."""
    d = emb.select(F.size(vec_col)).first()[0]
    partials = emb.select(vec_col).mapInPandas(
        _gramian_partials(vec_col, d),
        schema="n long, s array<double>, g array<double>",
    ).collect()
    n = sum(r["n"] for r in partials)
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    s = np.sum([np.asarray(r["s"]) for r in partials], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in partials], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues, orthonormal columns
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps, w[order]


def pca_project(
    emb: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project every vector onto the fitted components: adds `out_col` as
    array<double> of length k. The (k x d) matrix ships inside the UDF
    closure (task-broadcast); per batch it is one numpy matmul."""
    mean = np.asarray(mean, dtype=np.float64)
    comp_t = np.asarray(components, dtype=np.float64).T.copy()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy()).astype(np.float64)
        out = (m - mean) @ comp_t
        return pd.Series(list(out))

    return emb.withColumn(out_col, _proj(F.col(vec_col)))
