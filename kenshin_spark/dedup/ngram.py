"""N-gram Jaccard near-dup: exact pairwise Jaccard over word n-gram sets,
restricted to pairs that share at least one shingle (the inverted-index
trick — the join is keyed by shingle, never a full cross product).

Scale note: cost is Σ_g |docs(g)|² over shingles g. For web-scale corpora
cap pathological shingle frequencies (stop-shingles) before the join —
exposed via ``max_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.dedup.minhash import shingles


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_a, doc_b, jaccard)`` for all pairs with Jaccard ≥ threshold.

    ``max_df``: drop shingles appearing in more than max_df docs before the
    pair join (both the candidate step AND the set sizes use the filtered
    sets, keeping the measure consistent).
    """
    sh = shingles(docs, n, id_col, text_col)
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.where(F.col("df") <= max_df), "shingle").select(
            "doc_id", "shingle"
        )
    sh = sh.cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                        .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Directed containment near-dup: ``(doc_a, doc_b, containment)``
    where containment = |shingles(A) ∩ shingles(B)| / |shingles(A)| ≥
    threshold — doc_a is (nearly) contained in doc_b.

    Catches the asymmetric cases Jaccard misses: a copied article with
    a long appended comment section scores low Jaccard (union grows)
    but containment ≈ 1 for the original inside the copy. Same
    inverted-index join as ``ngram_jaccard_pairs`` — cost Σ|shingle
    bucket|², never all-pairs; ``max_df`` caps stop-shingle buckets."""
    sh = shingles(docs, n, id_col, text_col)
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.where(F.col("df") <= max_df), "shingle").select(
            "doc_id", "shingle"
        )
    sh = sh.cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    cont = F.round(F.col("n_inter") / F.col("n_a"), 6)
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .select("doc_a", "doc_b", cont.alias("containment"))
        .where(F.col("containment") >= threshold)
    )
