"""SimHash document fingerprints.

Charikar's simhash over word tokens: each token hashes to 60 bits; bit j of
the fingerprint is set iff Σ_tokens (±1 for bit j of the token hash) > 0.
Near-dups are fingerprints within small Hamming distance.

Implementation: ``array_distinct`` dedups tokens inside the row and a
single ``transform`` hashes each token once (no pre-shuffle distinct),
then the hashes explode to ``(doc_id, h BIGINT)`` and 60 conditional sums
fold the ±1 bit votes inside whole-stage codegen. The only shuffle moves
map-side partial aggregates (one 60-column row per doc per task), not the
token stream. This beat the zero-shuffle formulation (60 higher-order
``aggregate`` expressions) 3x: higher-order functions are CodegenFallback
and evaluate interpreted, while conditional sums stay codegen'd.
The token hash is the portable md5-prefix hash, so the DuckDB oracle
reproduces the fingerprint bit-for-bit.
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

    # One templated spark.sql call: the 60-aggregate expression tree parses
    # JVM-side in a single round-trip. Building it Column-by-Column costs
    # ~9000 Py4J round-trips (~2s of driver time per invocation).
    bit_sums = ", ".join(
        f"sum(IF(shiftright(h, {j}) & 1 = 1, 1, -1)) AS b{j}"
        for j in range(N_BITS)
    )
    fp = " + ".join(
        f"shiftleft(IF(b{j} > 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)), {j})"
        for j in range(N_BITS)
    )
    sql = rf"""
    WITH hashed AS (
      SELECT {id_col} AS doc_id,
             explode(transform(
               array_distinct(filter(
                 split(trim(lower({text_col})), '\\s+'), t -> t <> '')),
               t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)
             )) AS h
      FROM {{d}}
    ),
    bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {fp} AS simhash FROM bits
    """
    return docs.sparkSession.sql(sql, d=fan_out(docs))


def hamming_distance(a, b):
    """Hamming distance between two BIGINT fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
