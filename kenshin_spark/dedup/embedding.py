"""Embedding-cosine near-duplicate pairs.

Brute-force blocked pairwise cosine with a threshold. The join is a
self-join on nothing (n²/2 pairs) — correct baseline at small n; at scale
use the LSH-bucketed variant in kenshin_spark.similarity (random
hyperplanes) to bound candidates, same verify step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.functions.vectors import cosine_similarity


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_a, vec_b, cosine)`` for pairs with cosine ≥ threshold;
    cosine rounded to 6dp for cross-engine comparison."""
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_similarity(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
