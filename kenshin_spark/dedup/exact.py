"""Exact deduplication — hash-groupBy on normalized content.

One shuffle keyed by the fingerprint; the survivor is the smallest doc_id
(deterministic). At 100 TB the groupBy key is a 128-bit md5, so the shuffle
is uniform (no skew) and map-side partial aggregation collapses duplicates
before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.functions.text import fingerprint_md5


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Return ``(fingerprint, survivor_id, n_dups)`` — one row per distinct
    normalized content, keeping the smallest id."""
    return (
        docs.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
