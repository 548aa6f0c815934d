"""Iterative graph algorithms over token/entity graphs — the PageRank
companion to dedup's connected components.

Cross-engine exactness for an ITERATIVE NUMERIC algorithm is the hard
part: float PageRank sums incoming contributions in nondeterministic
order, so two engines drift by ULPs that compound per iteration. The
fix is integer-scaled arithmetic: ranks live at a fixed scale (1e6),
per-edge contributions are integer floor divisions, and sums of
integers are exact under ANY order — so a SQL oracle replays every
iteration bit-for-bit. (Damping 0.85 becomes ×85 // 100; dangling-node
mass is dropped, the standard simplification.)

Scale notes (100 TB corpus): the edge list is vocab², bounded by
``min_support`` (stop-pair pruning); each iteration is two hash joins +
one partial-aggregated shuffle keyed by destination token — the classic
Pregel step expressed as DataFrame ops. Ranks and out-degree tables are
vocab-sized and broadcastable; iteration count is fixed (power
iteration converges geometrically, 3–10 rounds suffice for ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from kenshin_spark.session import pin

SCALE = 1_000_000
DAMPING_NUM = 85  # 0.85 as a rational over 100


def token_pagerank(
    docs: DataFrame,
    min_support: int = 10,
    iters: int = 3,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weighted PageRank over the token-transition graph (edges = word
    bigrams with count ≥ min_support): ``(tok, pagerank)``, top-k by
    rank — the centrality view of a corpus (which tokens sit at the hub
    of its phrase structure; drift across snapshots flags distribution
    shift).

    All arithmetic is integer-scaled (see module docstring): rank starts
    at SCALE, each round v gets ``(15·SCALE)//100 + (85·Σ_{u→v}
    (pr(u)·c(u,v)) // out(u)) // 100``.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bg = (
        docs.select(toks.alias("_t"), F.size(toks).alias("_n"))
        .where(F.col("_n") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, _n - 1), i -> "
                    "struct(element_at(_t, i) AS w1, "
                    "element_at(_t, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    e = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_support)
        .cache()
    )
    outd = e.groupBy("w1").agg(F.sum("c").alias("tot"))
    nodes = (
        e.select(F.col("w1").alias("tok"))
        .unionAll(e.select(F.col("w2").alias("tok")))
        .distinct()
        .cache()
    )
    base = (15 * SCALE) // 100
    pr = nodes.select("tok", F.lit(SCALE).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(pr, e["w1"] == pr["tok"])
            .join(outd, "w1")
            .select(
                F.col("w2").alias("tok"),
                F.expr("pr * c DIV tot").alias("_ct"),
            )
            .groupBy("tok")
            .agg(F.sum("_ct").alias("_contrib"))
        )
        pr = nodes.join(contrib, "tok", "left").select(
            "tok",
            (
                F.lit(base)
                + F.expr(
                    f"{DAMPING_NUM} * coalesce(_contrib, 0) DIV 100"
                )
            ).cast("long").alias("pr"),
        )
        # pin each round's result: truncates the lineage the same way
        # dedup's CC loop does (deployment-aware via session.pin)
        pr = pin(pr, eager=False)
    return (
        pr.orderBy(F.col("pr").desc(), "tok")
        .limit(k)
        .select("tok", F.col("pr").alias("pagerank"))
    )
