"""Eleventh staged bank — ROUND 15 (seed): cross-audit compositions
over the now-complete audit families plus store/stream edge rows.

Same staging mechanism and gate (``tests/test_queries_staged_r15.py``)
as the earlier banks. Promote with
``python tools/promote_staged.py queries_staged_r15`` once round 14's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QUERIES as _REG
from kenshin_spark.queries import PTS, QuerySpec, _points

STAGED_R15: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R15[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "sim_knn_graph_degree",
    f"""
    WITH g AS (
      SELECT src AS vec_a, dst AS vec_b FROM ({_REG["sim_knn_graph"].oracle}) x
    ),
    und AS (
      SELECT vec_a AS v, vec_b AS w FROM g
      UNION
      SELECT vec_b, vec_a FROM g
    ),
    d AS (SELECT v, count(*) AS degree FROM und GROUP BY 1)
    SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_vectors
    FROM d GROUP BY 1
    """,
    "kNN-graph degree distribution: the mutual-neighbor graph's "
    "undirected degrees histogrammed — hub detection before running "
    "graph clustering on the similarity structure; derived from the "
    "registry's replayable kNN graph",
)
def q_sim_knn_graph_degree(spark, sf_dir):
    g = _REG["sim_knn_graph"].fn(spark, sf_dir).select(
        F.col("src").alias("vec_a"), F.col("dst").alias("vec_b")
    )
    und = g.select(
        F.col("vec_a").alias("v"), F.col("vec_b").alias("w")
    ).unionByName(
        g.select(F.col("vec_b").alias("v"), F.col("vec_a").alias("w"))
    ).distinct()
    d = und.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    return d.groupBy(
        F.col("degree").cast("long").alias("degree")
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


@stage(
    "dedup_cluster_size_histogram",
    f"""
    WITH RECURSIVE comp AS ({_REG["dedup_clusters"].oracle}),
    s AS (
      SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           count(*) AS n_clusters
    FROM s GROUP BY 1
    """,
    "near-dup cluster size distribution: the connected-components "
    "labelling folded into a size histogram — the clone-family "
    "profile a dedup report leads with; derived from the registry's "
    "recursive-CTE-replayed clustering",
)
def q_dedup_cluster_size_histogram(spark, sf_dir):
    comp = _REG["dedup_clusters"].fn(spark, sf_dir)
    s = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return s.groupBy(
        F.col("cluster_size").cast("long").alias("cluster_size")
    ).agg(F.count(F.lit(1)).alias("n_clusters"))


@stage(
    "q_events_daily_type_mix_drift",
    """
    WITH d AS (
      SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS BIGINT)
               AS day,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT day, sum(n) AS total FROM d GROUP BY 1)
    SELECT d.day, d.event_type,
           d.n * 1000000 // t.total AS share_ppm,
           CAST(d.n * 1000000 // t.total
                - lag(d.n * 1000000 // t.total) OVER (
                    PARTITION BY d.event_type ORDER BY d.day)
                AS BIGINT) AS drift_ppm
    FROM d JOIN t ON t.day = d.day
    """,
    "daily type-mix drift: each event type's floor-scaled share per "
    "day and its day-over-day delta — the composition-shift monitor "
    "that catches a broken producer before volume alarms fire",
)
def q_q_events_daily_type_mix_drift(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.unix_timestamp("ts").cast("long") / 86400)
        .cast("long")
        .alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    t = d.groupBy("day").agg(F.sum("n").alias("total"))
    j = d.join(t, "day").withColumn(
        "share_ppm", F.expr("n * 1000000 DIV total")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return j.select(
        "day", "event_type", "share_ppm",
        (F.col("share_ppm") - F.lag("share_ppm").over(w))
        .cast("long")
        .alias("drift_ppm"),
    )


@stage(
    "text_quality_pass_by_lang",
    rf"""
    WITH f AS (
      SELECT lang,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(lower(text),
                 '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           sum(CASE WHEN n_tokens >= 25 AND n_tokens <= 100000
                     AND n_chars >= 3 * n_tokens
                     AND n_chars <= 10 * n_tokens
                     AND n_stop >= 2
                     AND n_alpha * 50 >= n_chars * 41
                    THEN 1 ELSE 0 END) AS n_keep
    FROM f GROUP BY 1
    """,
    "quality pass rate per language: the Gopher-style integer rules "
    "grouped by lang — an ENGLISH-stopword gate fails non-English "
    "docs by construction, and this row makes that bias measurable "
    "(the fairness audit a multilingual corpus needs)",
)
def q_text_quality_pass_by_lang(spark, sf_dir):
    from kenshin_spark.functions.text import quality_verdict

    docs = load_table(spark, sf_dir, "documents")
    keep = quality_verdict("text")["keep"]
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep.cast("long")).alias("n_keep"),
    )


@stage(
    "ts_fetch_vs_raw_consistency",
    f"""
    WITH pts AS ({PTS}),
    t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    )
    SELECT metric,
           count(*) AS n_slots,
           count(*) AS n_matching
    FROM t0 GROUP BY 1
    """,
    "align idempotence: re-running last_write_wins on an "
    "ALREADY-ALIGNED grid changes nothing (every slot matches — the "
    "fixed-point property that makes repeated maintenance passes "
    "safe); the oracle states slots == matches by construction",
)
def q_ts_fetch_vs_raw_consistency(spark, sf_dir):
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    t0 = t0.localCheckpoint(eager=True)
    again = last_write_wins(t0, 60)
    j = t0.alias("a").join(
        again.alias("b"),
        (F.col("b.metric") == F.col("a.metric"))
        & (F.col("b.ts") == F.col("a.ts"))
        & F.col("b.value").eqNullSafe(F.col("a.value")),
    )
    n_match = j.groupBy(F.col("a.metric").alias("metric")).agg(
        F.count(F.lit(1)).alias("n_matching")
    )
    n_slots = t0.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_slots")
    )
    return n_slots.join(n_match, "metric").select(
        "metric", "n_slots", "n_matching"
    )


@stage(
    "q_orders_quarter_aov_trend",
    """
    WITH q AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS VARCHAR) || '-Q' ||
               CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
             count(*) AS n_orders,
             CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT quarter, n_orders,
           cents // n_orders AS aov_cents
    FROM q
    """,
    "average order value per quarter in integer cents (DECIMAL sum, "
    "floor cents, integer division) — the AOV trend with zero float "
    "division anywhere",
)
def q_q_orders_quarter_aov_trend(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy(
        F.concat(
            F.date_format("o_orderdate", "yyyy"),
            F.lit("-Q"),
            F.quarter("o_orderdate").cast("string"),
        ).alias("quarter")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
        ).cast("long").alias("cents"),
    )
    return q.select(
        "quarter", "n_orders",
        F.expr("cents DIV n_orders").alias("aov_cents"),
    )
