"""Embedding-cosine near-duplicate pairs.

Brute-force blocked pairwise cosine with a threshold. The join is a
self-join on nothing (n²/2 pairs) — correct baseline at small n; at scale
use the LSH-bucketed variant in kenshin_spark.similarity (random
hyperplanes) to bound candidates, same verify step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.functions.vectors import dot_product, l2_norm


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_a, vec_b, cosine)`` for pairs with cosine ≥ threshold;
    cosine rounded to 6dp for cross-engine comparison.

    Scale notes: norms are computed ONCE per vector before the pair join
    (not per pair), the streamed side is repartitioned so the
    nested-loop join fans out across all cores (the small parquet
    arrives as 1 partition → 1 task otherwise), and the build side is
    explicitly broadcast. cosine = dot/(|a|·|b|) keeps the exact
    expression shape of the DuckDB oracle, so results stay bit-aligned.
    """
    spark = embeddings.sparkSession
    par = spark.sparkContext.defaultParallelism
    with_norm = embeddings.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_n")
    )
    a = with_norm.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    ).repartition(par)
    b = with_norm.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    denom = F.col("_na") * F.col("_nb")
    cosine = F.when(denom != 0, dot_product(F.col("_va"), F.col("_vb")) / denom)
    # prefilter INSIDE the join condition: non-survivors are dropped after
    # one dot product instead of surviving to a post-join filter that
    # recomputes it. round(c, 6) >= t ⟺ c >= t - 5e-7 (then the exact
    # rounded filter re-checks the boundary cases).
    prefilter = dot_product(F.col("_va"), F.col("_vb")) >= (
        F.lit(threshold - 5e-7) * denom
    )
    return (
        a.join(F.broadcast(b), (F.col("vec_a") < F.col("vec_b")) & prefilter)
        .select("vec_a", "vec_b", F.round(cosine, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB scale path: random-hyperplane LSH buckets bound the pair
    space to Σ|bucket|² instead of n²; candidates sharing a bucket get the
    exact cosine verify. Same output schema as the brute-force variant;
    approximate recall (raise n_planes-probes for more)."""
    from kenshin_spark.functions.vectors import l2_norm
    from kenshin_spark.similarity import _hyperplane, lsh_bucket

    planes = _hyperplane(dim, n_planes)
    tagged = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    a = tagged.select(
        F.col("_id").alias("vec_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
        "bucket",
    )
    b = tagged.select(
        F.col("_id").alias("vec_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
        "bucket",
    )
    denom = F.col("_na") * F.col("_nb")
    cosine = F.when(denom != 0, dot_product(F.col("_va"), F.col("_vb")) / denom)
    return (
        a.join(b, ["bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cosine, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
