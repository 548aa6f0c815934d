"""Tenth staged bank — ROUND 14: the PQ rerank recall audit completing
the ANN audit family, histogram width sensitivity, store propagate
edge cases, and profiling/conservation rows.

Same staging mechanism and gate (``tests/test_queries_staged_r14.py``)
as the earlier banks. Promote with
``python tools/promote_staged.py queries_staged_r14`` once round 13's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QUERIES as _REG
from kenshin_spark.queries import PTS, QuerySpec, _points

STAGED_R14: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R14[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "sim_pq_rerank_gain_audit",
    f"""
    WITH ex AS (SELECT query_id, neighbor_id FROM
                  ({_REG["sim_topk_bruteforce"].oracle}) a),
    pq AS (SELECT query_id, neighbor_id FROM
             ({_REG["sim_topk_pq"].oracle}) b),
    rr AS (SELECT query_id, neighbor_id FROM
             ({_REG["sim_topk_pq_rerank"].oracle}) c)
    SELECT ex.query_id,
           CAST(sum(CASE WHEN pq.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS pq_hits,
           CAST(sum(CASE WHEN rr.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS rerank_hits
    FROM ex
    LEFT JOIN pq ON pq.query_id = ex.query_id
                AND pq.neighbor_id = ex.neighbor_id
    LEFT JOIN rr ON rr.query_id = ex.query_id
                AND rr.neighbor_id = ex.neighbor_id
    GROUP BY 1
    """,
    "the PQ rerank gain, measured: recall@10 of raw product-"
    "quantized top-k vs the exact-rerank-over-PQ-candidates variant, "
    "against the brute-force truth per query — the number that "
    "justifies paying the rerank's exact-distance pass; completes the "
    "per-method ANN audit family (LSH r9, IVF r10, int8 r11)",
)
def q_sim_pq_rerank_gain_audit(spark, sf_dir):
    ex = _REG["sim_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    pq = _REG["sim_topk_pq"].fn(spark, sf_dir).select(
        F.col("query_id").alias("pq_q"), F.col("neighbor_id").alias("pq_n")
    )
    rr = _REG["sim_topk_pq_rerank"].fn(spark, sf_dir).select(
        F.col("query_id").alias("rr_q"), F.col("neighbor_id").alias("rr_n")
    )
    j = ex.join(
        pq,
        (F.col("pq_q") == F.col("query_id"))
        & (F.col("pq_n") == F.col("neighbor_id")),
        "left",
    ).join(
        rr,
        (F.col("rr_q") == F.col("query_id"))
        & (F.col("rr_n") == F.col("neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.sum(F.col("pq_n").isNotNull().cast("long")).alias("pq_hits"),
        F.sum(F.col("rr_n").isNotNull().cast("long")).alias(
            "rerank_hits"
        ),
    )


def _hist_p95_at(bins: int) -> str:
    width = 512.0 / bins
    return f"""
    SELECT CAST({bins} AS BIGINT) AS bins,
           round(CASE WHEN b <= 0 THEN 0.0 WHEN b >= {bins + 1} THEN 512.0
                      ELSE 0.0 + (b - 1) * {width} END, 6) AS p95
    FROM (
      WITH cells AS (
        SELECT CASE WHEN value < 0.0 THEN 0
                    WHEN value >= 512.0 THEN {bins + 1}
                    ELSE CAST(floor((value - 0.0) / {width}) + 1 AS INT)
               END AS bucket,
               count(*) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
      ),
      cum AS (
        SELECT bucket,
               sum(c) OVER (ORDER BY bucket) AS _cum,
               sum(c) OVER () AS _tot
        FROM cells
      )
      SELECT min(bucket) AS b FROM cum WHERE _cum >= 0.95 * _tot
    ) z
    """


@stage(
    "sketch_histogram_width_sensitivity",
    " UNION ALL ".join(_hist_p95_at(b) for b in (32, 128, 512)),
    "histogram resolution sizing: the global p95 estimate at 32/128/"
    "512 bins over the same [0,512) range — the estimate sharpens by "
    "bin width (left-edge error <= one bin), the measured curve that "
    "picks the cell budget; every width replays exactly (powers of "
    "two keep edges binary-exact)",
)
def q_sketch_histogram_width_sensitivity(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        histogram_quantile,
        histogram_sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    out = None
    for bins in (32, 128, 512):
        cells = histogram_sketches(
            ev, "value", lo=0.0, hi=512.0, bins=bins
        )
        p = histogram_quantile(
            cells, 0.95, lo=0.0, hi=512.0, bins=bins
        ).select(
            F.lit(bins).cast("long").alias("bins"),
            F.round(F.col("q0_95"), 6).alias("p95"),
        )
        out = p if out is None else out.unionByName(p)
    return out


@stage(
    "q_events_value_sum_conservation",
    """
    WITH per_type AS (
      SELECT event_type,
             sum(CAST(value AS DECIMAL(18,6))) AS s
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    whole AS (
      SELECT sum(CAST(value AS DECIMAL(18,6))) AS s FROM events
      WHERE value IS NOT NULL
    )
    SELECT round(CAST((SELECT sum(s) FROM per_type) AS DOUBLE), 6)
             AS sum_of_groups,
           round(CAST((SELECT s FROM whole) AS DOUBLE), 6)
             AS global_sum,
           (SELECT sum(s) FROM per_type) = (SELECT s FROM whole)
             AS conserved
    FROM (SELECT 1) one
    """,
    "aggregation conservation under DECIMAL accumulation: the sum of "
    "per-type sums equals the global sum EXACTLY (boolean-pinned, not "
    "just displayed) — the partition-invariance guarantee float sums "
    "cannot make, demonstrated as a driver row",
)
def q_q_events_value_sum_conservation(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    per_type = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s")
    )
    groups = per_type.agg(F.sum("s").alias("gsum"))
    whole = ev.agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("wsum")
    )
    return groups.crossJoin(whole).select(
        F.round(F.col("gsum").cast("double"), 6).alias("sum_of_groups"),
        F.round(F.col("wsum").cast("double"), 6).alias("global_sum"),
        (F.col("gsum") == F.col("wsum")).alias("conserved"),
    )


@stage(
    "ts_minute_of_hour_profile",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           CAST(ts // 60 % 60 AS BIGINT) AS minute,
           count(*) AS n_points
    FROM pts GROUP BY 1, 2
    """,
    "minute-of-hour cadence per metric — cron fingerprinting one "
    "level below the hour profile (a :00/:30 spike means scheduled "
    "collection); integer modulo only",
)
def q_ts_minute_of_hour_profile(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        "metric",
        ((F.col("ts") / 60).cast("long") % 60).alias("minute"),
    ).agg(F.count(F.lit(1)).alias("n_points"))


@stage(
    "q_nation_avg_order_value",
    """
    SELECT n.n_name,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE) / count(*) * 100) / 100 AS avg_order_value
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
    "average order value per nation: DECIMAL-summed totals divided "
    "once with the cent-scale rounding guard — the AOV table, nation "
    "dim broadcast",
)
def q_q_nation_avg_order_value(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .cast("double")
                    / F.count(F.lit(1))
                    * 100
                )
                / 100
            ).alias("avg_order_value"),
        )
    )


@stage(
    "text_doc_vocab_bands",
    r"""
    WITH d AS (
      SELECT doc_id,
             len(list_distinct(
               string_split_regex(trim(lower(text)), '\s+'))) AS n_types
      FROM documents
    )
    SELECT CAST(n_types // 25 AS BIGINT) AS vocab_band,
           count(*) AS n_docs
    FROM d GROUP BY 1
    """,
    "per-document vocabulary size histogram (distinct tokens banded "
    "by 25) — the lexical-richness distribution behind type-token "
    "curves; integer distinct counts",
)
def q_text_doc_vocab_bands(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_types = F.size(
        F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
    )
    return docs.select(
        F.floor(n_types / 25).cast("long").alias("vocab_band")
    ).groupBy("vocab_band").agg(F.count(F.lit(1)).alias("n_docs"))
