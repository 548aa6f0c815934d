"""PCA projection for embedding columns — the dimensionality-reduction
step before clustering / ANN indexing (FAISS's OPQ/PCAMatrix pretransform
family; Jolliffe, "Principal Component Analysis").

Same execution pattern as the IVF and PQ quantizers: the transform is
TRAINED driver-side on a bounded hash-ordered sample (covariance +
eigendecomposition of a dim×dim matrix — O(dim²) state regardless of
corpus size), then APPLIED corpus-wide as one Arrow ``pandas_udf`` batch
matmul. The corpus is never shuffled; the projection matrix is a closure
constant (~dim×k doubles).

Determinism: the sample is hash-ordered (layout-independent), numpy's
``eigh`` on the same matrix is deterministic, and the eigenvector sign
ambiguity is fixed by forcing each component's largest-|loading| entry
positive — so re-training on the same corpus reproduces the transform
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def train_pca(
    embeddings: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``(mean, components, explained_variance)`` — components is (k, dim),
    rows ordered by descending eigenvalue."""
    sample = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), "_id")
        .limit(4096)
        .collect()
    )
    X = np.array([r._v for r in sample], dtype=np.float64)
    mean = X.mean(axis=0)
    Xc = X - mean
    cov = (Xc.T @ Xc) / max(len(X) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, dim)
    # fix the sign ambiguity: largest-|loading| entry of each component
    # positive (argmax takes the first maximum — deterministic ties)
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def pca_project(
    embeddings: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projection",
) -> DataFrame:
    """``df`` with ``out_col`` = the k-dim PCA projection of ``vec_col``
    (centered, then rotated onto the top-k principal axes)."""
    mean, comps, _ = train_pca(embeddings, k, seed, id_col, vec_col)
    M = comps.T.copy()  # (dim, k)
    mu = mean.copy()

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.array([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series(list((X - mu) @ M))

    return embeddings.withColumn(out_col, _proj(F.col(vec_col)))
