"""SemDeDup-style semantic deduplication (Abbas et al. 2023).

Blocked embedding near-dup: assign every vector to its nearest centroid
cell, then compare pairs WITHIN a cell only — the quadratic verify is
bounded by Σ|cell|² instead of n², the same shape as MinHash banding but
in embedding space. Cells here are the deterministic per-label mean
centroids from ``similarity.classify`` (not an RNG k-means), so the whole
pipeline — assignment included — replays exactly in a SQL oracle. For
corpora without labels (or when |labels| is too small to bound the pair
space) pass ``subcells`` to split every cell with the seeded k-means
coarse quantizer from ``similarity.ivf_topk`` — k then scales with n
(FAISS guidance: k ≈ √n) independent of label cardinality.

Trade-off (inherent to SemDeDup): a near-dup pair straddling two cells is
missed; recall is governed by cell granularity. Pairs found are always a
subset of the exhaustive ``embedding_neardup_pairs`` set at the same
threshold (asserted in tests), and the ``subcells`` refinement is a
further subset of the label-cell set.

Plan shape (the part that scales): norms are computed ONCE per vector
before the pair join, the streamed side is repartitioned so the
broadcast-hash join fans out across all cores (a join keyed only on
~10 cell ids would otherwise collapse to ~10 tasks), and the threshold
prefilter sits INSIDE the join condition so a non-survivor pair dies
after one dot product — the same three moves measured on
``dedup/embedding.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kenshin_spark.functions.vectors import dot_product, l2_norm
from kenshin_spark.similarity.classify import nearest_centroid


def semantic_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    ndigits: int = 6,
    subcells: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """``(cluster, vec_a, vec_b, cosine)`` for within-cell pairs with
    cosine ≥ threshold. The pair join is keyed by cell — at scale each
    cell maps to a partition, so the verify never crosses partitions.

    ``subcells=m`` splits every label cell into ≤m k-means sub-cells
    (seeded, deterministic) before pairing — the 100 TB path where
    Σ|cell|² must shrink with k, not with |labels|. The sub-cell split is
    driver-trained on a bounded sample (like ``ivf_topk``), so it is NOT
    SQL-replayable; the oracle query uses the label-cell form.
    """
    spark = embeddings.sparkSession
    par = spark.sparkContext.defaultParallelism
    assign = nearest_centroid(embeddings, group_col, vec_col, id_col).select(
        id_col, "pred_label"
    )
    e = embeddings.join(assign, id_col).select(
        F.col(id_col).alias("_id"),
        F.col("pred_label").alias("_cell"),
        F.col(vec_col).alias("_v"),
    )
    if subcells is not None and subcells > 1:
        e = _subsplit(e, subcells, seed)
    e = e.withColumn("_n", l2_norm(F.col("_v")))
    a = e.select(
        F.col("_id").alias("vec_a"),
        F.col("_cell").alias("_cella"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    ).repartition(par)
    b = e.select(
        F.col("_id").alias("vec_b"),
        F.col("_cell").alias("_cellb"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    denom = F.col("_na") * F.col("_nb")
    cosine = F.when(denom != 0, dot_product(F.col("_va"), F.col("_vb")) / denom)
    # prefilter INSIDE the join condition: round(c, 6) >= t ⟺
    # c >= t - 5e-7; boundary cases re-checked by the exact rounded filter
    prefilter = dot_product(F.col("_va"), F.col("_vb")) >= (
        F.lit(threshold - 5 * 10.0 ** -(ndigits + 1)) * denom
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("_cella") == F.col("_cellb"))
            & (F.col("vec_a") < F.col("vec_b"))
            & prefilter,
        )
        .select(
            F.col("_cella").alias("cluster"),
            "vec_a",
            "vec_b",
            F.round(cosine, ndigits).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _subsplit(e: DataFrame, subcells: int, seed: int) -> DataFrame:
    """Refine ``(_id, _cell, _v)`` with a k-means sub-cell id per label
    cell: ``_cell`` becomes ``concat(_cell, '#', sub)``. One global seeded
    quantizer (trained on a bounded hash-ordered sample, exactly like
    ``ivf_topk``) — sub-cell = nearest of k global centroids, scoped
    within the label cell. Assignment is one Arrow pandas_udf batch
    matmul; the corpus is never shuffled by the split itself."""
    sample = (
        e.select("_id", F.col("_v").cast("array<double>").alias("_vd"))
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), "_id")
        .limit(4096)
        .collect()
    )
    X = np.array([r._vd for r in sample], dtype=np.float64)
    k = min(subcells, len(X))
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=k, replace=False)].copy()
    xx = (X * X).sum(axis=1)
    for _ in range(10):
        d2 = xx[:, None] - 2.0 * (X @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        lab = d2.argmin(axis=1)
        for c in range(k):
            m = X[lab == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    C = cent.copy()
    cc = (C * C).sum(axis=1)

    @pandas_udf("int")
    def _sub(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        X = np.array([np.asarray(x, dtype=np.float64) for x in v])
        d = -2.0 * (X @ C.T) + cc[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return e.withColumn(
        "_cell",
        F.concat_ws("#", F.col("_cell").cast("string"), _sub(F.col("_v"))),
    )
