"""N-gram Jaccard near-dup: exact pairwise Jaccard over word n-gram sets,
restricted to pairs that share at least one shingle (the inverted-index
trick — the join is keyed by shingle, never a full cross product).

Scale note: cost is Σ_g |docs(g)|² over shingles g. For web-scale corpora
cap pathological shingle frequencies (stop-shingles) before the join —
exposed via ``max_df``.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.dedup.minhash import shingles

_LOG = logging.getLogger(__name__)

#: ``max_df="auto"`` resolves to max(_AUTO_MIN_DF, 1% of the corpus) —
#: a shingle in more than 1% of documents is boilerplate (headers,
#: license blocks, word-salad artifacts), and its bucket alone costs
#: (0.01·N)² candidate pairs, the superlinearity the sf1 soak measured
#: (SCALING.md r10 item 3, held in-band at max_df=200). The floor keeps
#: the cap from ever binding on small corpora, so verified driver-scale
#: results are byte-identical to the uncapped operator.
_AUTO_MIN_DF = 200


def _resolve_max_df(docs: DataFrame, max_df) -> int | None:
    if max_df == "auto":
        return max(_AUTO_MIN_DF, -(-docs.count() // 100))
    return max_df


def _cap_stop_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles appearing in more than ``max_df`` docs before the
    pair join. NEVER silent: logs how many shingles the cap binds on
    (VERDICT r10 item 4 — a bound guard trades recall for cost and must
    be visible). The doc-frequency frame is cached: it feeds both the
    binding count and the filter join."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).cache()
    n_stop = freq.where(F.col("df") > max_df).count()
    if n_stop:
        _LOG.warning(
            "ngram dedup: max_df=%d capped %d stop-shingles "
            "(pairs sharing ONLY capped shingles are not candidates)",
            max_df, n_stop,
        )
    return sh.join(freq.where(F.col("df") <= max_df), "shingle").select(
        "doc_id", "shingle"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    max_df: "int | str | None" = "auto",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_a, doc_b, jaccard)`` for all pairs with Jaccard ≥ threshold.

    ``max_df``: drop shingles appearing in more than max_df docs before the
    pair join (both the candidate step AND the set sizes use the filtered
    sets, keeping the measure consistent). Default ``"auto"`` =
    max(200, 1% of corpus) — ON by default since r11 (sf1 soak: an
    uncapped stop-shingle bucket alone is quadratic); ``None`` disables.
    """
    max_df = _resolve_max_df(docs, max_df)
    sh = shingles(docs, n, id_col, text_col)
    if max_df is not None:
        sh = _cap_stop_shingles(sh, max_df)
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
    max_df: "int | str | None" = "auto",
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
    bucket|², never all-pairs; ``max_df`` caps stop-shingle buckets
    (default ``"auto"`` = max(200, 1% of corpus), ON since r11 — the
    sf1 soak measured this row superlinear with the cap off; ``None``
    disables)."""
    max_df = _resolve_max_df(docs, max_df)
    sh = shingles(docs, n, id_col, text_col)
    if max_df is not None:
        sh = _cap_stop_shingles(sh, max_df)
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
