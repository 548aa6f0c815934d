"""SemDeDup-style semantic deduplication (Abbas et al. 2023).

Blocked embedding near-dup: assign every vector to its nearest centroid
cell, then compare pairs WITHIN a cell only — the quadratic verify is
bounded by Σ|cell|² instead of n², the same shape as MinHash banding but
in embedding space. Cells here are the deterministic per-label mean
centroids from ``similarity.classify`` (not an RNG k-means), so the whole
pipeline — assignment included — replays exactly in a SQL oracle.

Trade-off (inherent to SemDeDup): a near-dup pair straddling two cells is
missed; recall is governed by cell granularity. Pairs found are always a
subset of the exhaustive ``embedding_neardup_pairs`` set at the same
threshold (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.functions.vectors import cosine_similarity
from kenshin_spark.similarity.classify import nearest_centroid


def semantic_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    ndigits: int = 6,
) -> DataFrame:
    """``(cluster, vec_a, vec_b, cosine)`` for within-cell pairs with
    cosine ≥ threshold. The pair join is keyed by cell — at scale each
    cell maps to a partition, so the verify never crosses partitions."""
    assign = nearest_centroid(embeddings, group_col, vec_col, id_col).select(
        id_col, "pred_label"
    )
    e = embeddings.join(assign, id_col).select(
        F.col(id_col).alias("_id"),
        F.col("pred_label").alias("_cell"),
        F.col(vec_col).alias("_v"),
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(
        cosine_similarity(F.col("a._v"), F.col("b._v")), ndigits
    )
    return (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._cell").alias("cluster"),
            F.col("a._id").alias("vec_a"),
            F.col("b._id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
