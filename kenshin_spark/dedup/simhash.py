"""SimHash document fingerprints.

Charikar's simhash over word tokens: each token hashes to 60 bits; bit j of
the fingerprint is set iff Σ_tokens (±1 for bit j of the token hash) > 0.
Near-dups are fingerprints within small Hamming distance.

Implementation: one explode + one groupBy with 60 conditional-sum
aggregates — a single shuffle keyed by doc, no UDFs. The token hash is the
portable md5-prefix hash, so the DuckDB oracle reproduces the fingerprint
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 60


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, simhash BIGINT)`` over distinct lowercase word tokens."""
    from kenshin_spark.dedup.fanout import fan_out

    toks = (
        fan_out(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        )
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{j}")
        for j in range(N_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(N_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def hamming_distance(a, b):
    """Hamming distance between two BIGINT fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
