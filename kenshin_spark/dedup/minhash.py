"""MinHash + LSH near-duplicate detection — shingle → minhash → band →
bucket-join, expressed entirely with built-in JVM functions.

Pipeline (classic Broder/LSH, as used by every large-scale dedup system):

1. shingles: distinct word 3-grams per document;
2. k permutations approximated by seeded md5: ``h_s(x) = int(md5(s||x))``
   (portable — the DuckDB oracle computes the identical hash);
3. signature: ``sig[s] = min_x h_s(x)`` — a single groupBy with k ``min``
   aggregates (ONE shuffle for all k);
4. bands: b bands of r rows, band key = md5 of the slice; candidate pairs
   share a (band_idx, key) bucket — the self-join is on the bucket key, so
   its cost is Σ|bucket|², not n²;
5. verify: true Jaccard over shingle sets for candidates only.

At 100 TB: the shingle explode is map-local; the signature shuffle is keyed
by doc; the bucket join is the only quadratic-risk step and is bounded by
band selectivity (tune b, r against the similarity threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def _hash64(col):
    """Portable 60-bit hash: first 15 hex chars of md5 as a BIGINT —
    bit-identical in DuckDB via ('0x'||substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: ``(doc_id, shingle)``."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # array_distinct inside the row replaces a global distinct(): doc_id is
    # constant per row, so per-row dedup is equivalent — and one full
    # shuffle of the shingle stream disappears
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    from kenshin_spark.dedup.fanout import fan_out

    return fan_out(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, k: int = N_HASHES) -> DataFrame:
    """``(doc_id, h0..h{k-1})`` — one shuffle, k min-aggregates."""
    aggs = [
        F.min(_hash64(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"h{s}")
        for s in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    k: int = N_HASHES,
    bands: int = N_BANDS,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs ``(doc_a, doc_b, jaccard)`` with true Jaccard ≥
    threshold among LSH band candidates; jaccard rounded to 6dp."""
    sh = shingles(docs, n, id_col, text_col).cache()
    sig = minhash_signatures(sh, k)
    r = k // bands
    # one pass over sig: band keys as an array + posexplode (a 4-way union
    # would recompute the signature aggregation per band)
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"h{b * r + i}").cast("string") for i in range(r)]
                )
            )
            for b in range(bands)
        ]
    )
    band_rows = sig.select(
        "doc_id", F.posexplode(keys).alias("band", "band_key")
    )

    a = band_rows.alias("a")
    b2 = band_rows.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
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
