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


# -- Bloom-filter membership pre-pass ---------------------------------------

#: bits packed per BIGINT word (62 keeps every shift clear of the sign
#: bit, so the bitmap is bit-identical in any signed-64 SQL engine)
BLOOM_BITS_PER_WORD = 62


def _bloom_positions(df: DataFrame, fp_col: str, m_words: int, k: int):
    """k seeded-md5 bit positions per fingerprint → (word, bit) rows.
    Hash i = first 15 md5 hex chars of ``"i|fp"`` as a 60-bit int — the
    same portable construction the MinHash family uses, replayable
    bit-for-bit in DuckDB."""
    m_bits = m_words * BLOOM_BITS_PER_WORD
    rows = None
    for i in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}|"), F.col(fp_col))), 1, 15
            ),
            16,
            10,
        ).cast("long") % m_bits
        part = df.select(
            F.col(fp_col),
            (h / BLOOM_BITS_PER_WORD).cast("long").alias("word"),
            (h % BLOOM_BITS_PER_WORD).cast("int").alias("bit"),
        )
        rows = part if rows is None else rows.unionByName(part)
    return rows


def bloom_bitmap(
    corpus_fps: DataFrame,
    fp_col: str = "fingerprint",
    m_words: int = 256,
    k: int = 4,
) -> DataFrame:
    """Build a relational Bloom bitmap over the corpus fingerprint set:
    ``(word, bits)`` with at most ``m_words`` rows, ``bits`` the OR of
    ``1 << bit`` for every hash landing in that word.

    This is the incremental-ingest membership pre-pass at 100 TB scale:
    the full corpus fingerprint set is corpus-sized (too big to
    broadcast, expensive to shuffle against every micro-batch), but the
    bitmap is a FIXED m_words rows regardless of corpus size — it
    broadcasts for free, and ``bloom_probe`` turns "which batch docs
    might be dups" into a map-side filter. False positives (and only
    false positives) fall through to the exact md5 join, which now runs
    over a sliver of the batch."""
    return (
        _bloom_positions(corpus_fps, fp_col, m_words, k)
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("bits")
        )
    )


def bloom_probe(
    batch_fps: DataFrame,
    bitmap: DataFrame,
    fp_col: str = "fingerprint",
    m_words: int = 256,
    k: int = 4,
) -> DataFrame:
    """Probe the bitmap: batch fingerprints + ``bloom_hit`` (true iff
    ALL k bits are set — corpus members always hit; non-members hit at
    the classic false-positive rate). The bitmap side broadcasts (≤
    m_words rows); a missing word means those bits are zero."""
    pos = _bloom_positions(batch_fps, fp_col, m_words, k)
    probed = pos.join(F.broadcast(bitmap), "word", "left").withColumn(
        "_hit",
        F.coalesce(
            F.expr("(bits & shiftleft(CAST(1 AS BIGINT), bit)) != 0"),
            F.lit(False),
        ),
    )
    return probed.groupBy(fp_col).agg(
        (F.count(F.lit(1)) == F.sum(F.col("_hit").cast("int")))
        .alias("bloom_hit")
    )
