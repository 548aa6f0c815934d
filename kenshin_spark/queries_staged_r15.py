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


# --------------------------------------------------------------------------
# Batch 2: repurchase lag, Benford on the catalog, reorder rate,
# half-life churn, nation YoY, per-type peak cell, mislabel rate,
# idle suppliers.
# --------------------------------------------------------------------------


@stage(
    "q_second_purchase_lag_bands",
    """
    WITH p AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rnk
      FROM events WHERE event_type = 'purchase'
    ),
    l AS (
      SELECT a.user_id, (b.ts - a.ts) // 86400 AS lag_days
      FROM p a JOIN p b
        ON b.user_id = a.user_id AND a.rnk = 1 AND b.rnk = 2
    )
    SELECT CASE WHEN lag_days = 0 THEN 'same_day'
                WHEN lag_days <= 7 THEN '1-7d'
                WHEN lag_days <= 30 THEN '8-30d'
                ELSE '30d+' END AS band,
           count(*) AS n_users
    FROM l GROUP BY 1
    """,
    "time to second purchase: first-to-second purchase lag per user "
    "banded into repurchase windows — the retention lever metric; "
    "(ts, event_id)-ordered ranks, integer day arithmetic",
)
def q_q_second_purchase_lag_bands(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        "user_id", "event_id",
        F.unix_timestamp("ts").cast("long").alias("ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.withColumn("rnk", F.row_number().over(w))
    a = p.where(F.col("rnk") == 1).select("user_id", F.col("ts").alias("t1"))
    b = p.where(F.col("rnk") == 2).select(
        F.col("user_id").alias("u2"), F.col("ts").alias("t2")
    )
    l = a.join(b, a.user_id == b.u2).select(
        ((F.col("t2") - F.col("t1")) / 86400).cast("long").alias(
            "lag_days"
        )
    )
    band = (
        F.when(F.col("lag_days") == 0, "same_day")
        .when(F.col("lag_days") <= 7, "1-7d")
        .when(F.col("lag_days") <= 30, "8-30d")
        .otherwise("30d+")
    )
    return l.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


@stage(
    "q_part_price_benford",
    """
    SELECT substr(CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR),
                  1, 1) AS first_digit,
           count(*) AS n_parts
    FROM part WHERE p_retailprice >= 1
    GROUP BY 1
    """,
    "Benford screen on the part catalog — generator pricing formulas "
    "produce a distinctive (non-Benford) first-digit spectrum; the "
    "same integer-string extraction as the orders row",
)
def q_q_part_price_benford(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(F.col("p_retailprice") >= 1)
        .select(
            F.substring(
                F.floor("p_retailprice").cast("long").cast("string"), 1, 1
            ).alias("first_digit")
        )
        .groupBy("first_digit")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@stage(
    "q_part_reorder_rate",
    """
    WITH cp AS (
      SELECT o.o_custkey, l.l_partkey,
             count(DISTINCT l.l_orderkey) AS n_orders
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    )
    SELECT count(*) AS n_customer_parts,
           sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS n_reordered,
           sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000000
             // count(*) AS reorder_ppm
    FROM cp
    """,
    "part reorder rate: (customer, part) pairs bought in 2+ distinct "
    "orders over all pairs — the repeat-demand share replenishment "
    "forecasting keys on; floor-scaled ppm",
)
def q_q_part_reorder_rate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    re = (F.col("n_orders") >= 2).cast("long")
    return cp.agg(
        F.count(F.lit(1)).alias("n_customer_parts"),
        F.sum(re).alias("n_reordered"),
        F.floor(F.sum(re) * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("reorder_ppm"),
    )


@stage(
    "q_events_halflife_churn",
    """
    WITH b AS (
      SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS t0,
             max(CAST(floor(epoch(ts)) AS BIGINT)) AS t1
      FROM events
    ),
    u AS (
      SELECT e.user_id,
             max(CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT)
                       < (b.t0 + b.t1) / 2 THEN 1 ELSE 0 END)
               AS in_first_half,
             max(CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT)
                       >= (b.t0 + b.t1) / 2 THEN 1 ELSE 0 END)
               AS in_second_half
      FROM events e, b GROUP BY 1
    )
    SELECT count(*) AS n_users,
           sum(CASE WHEN in_first_half = 1 AND in_second_half = 0
                    THEN 1 ELSE 0 END) AS n_churned,
           sum(CASE WHEN in_first_half = 0 AND in_second_half = 1
                    THEN 1 ELSE 0 END) AS n_new,
           sum(CASE WHEN in_first_half = 1 AND in_second_half = 1
                    THEN 1 ELSE 0 END) AS n_retained
    FROM u
    """,
    "half-life churn split: users active only in the stream's first "
    "half (churned), only in the second (new), or both (retained) — "
    "the simplest honest churn decomposition; integer midpoint "
    "arithmetic",
)
def q_q_events_halflife_churn(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("ts")
    )
    b = ev.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    j = ev.crossJoin(F.broadcast(b))
    mid = (F.col("t0") + F.col("t1")) / 2
    u = j.groupBy("user_id").agg(
        F.max((F.col("ts") < mid).cast("int")).alias("in_first_half"),
        F.max((F.col("ts") >= mid).cast("int")).alias("in_second_half"),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            ((F.col("in_first_half") == 1) & (F.col("in_second_half") == 0))
            .cast("long")
        ).alias("n_churned"),
        F.sum(
            ((F.col("in_first_half") == 0) & (F.col("in_second_half") == 1))
            .cast("long")
        ).alias("n_new"),
        F.sum(
            ((F.col("in_first_half") == 1) & (F.col("in_second_half") == 1))
            .cast("long")
        ).alias("n_retained"),
    )


@stage(
    "q_nation_yoy_growth",
    """
    WITH y AS (
      SELECT n.n_name,
             CAST(strftime(o.o_orderdate, '%Y') AS VARCHAR) AS year,
             count(*) AS n_orders
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, year, n_orders,
           CAST(n_orders - lag(n_orders) OVER (
             PARTITION BY n_name ORDER BY year) AS BIGINT) AS yoy_delta
    FROM y
    """,
    "order growth per nation year over year: integer deltas via lag "
    "over the lexicographic year key — the market momentum table",
)
def q_q_nation_yoy_growth(spark, sf_dir):
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    y = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.date_format("o_orderdate", "yyyy").alias("year")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("n_name").orderBy("year")
    return y.select(
        "n_name", "year", "n_orders",
        (F.col("n_orders") - F.lag("n_orders").over(w))
        .cast("long")
        .alias("yoy_delta"),
    )


@stage(
    "q_type_peak_dow_hour",
    """
    WITH g AS (
      SELECT event_type,
             CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7
                  AS BIGINT) AS dow,
             CAST(CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24
                  AS BIGINT) AS hour,
             count(*) AS n_events
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, dow, hour, n_events FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type
        ORDER BY n_events DESC, dow, hour) AS rnk
      FROM g
    ) t WHERE rnk = 1
    """,
    "the hottest hour-of-week cell per event type: the 7x24 heatmap "
    "argmax with a (dow, hour) tie-break — one cell per type for the "
    "capacity headline",
)
def q_q_type_peak_dow_hour(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("long")
    g = ev.groupBy(
        "event_type",
        (((epoch / 86400).cast("long") + 4) % 7).alias("dow"),
        ((epoch / 3600).cast("long") % 24).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("dow"), F.col("hour")
    )
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("event_type", "dow", "hour", "n_events")
    )




def _mislabel_pred_sql() -> str:
    from kenshin_spark.functions.text import LANG_MARKERS, marker_regex

    score = {
        lang: f"len(regexp_extract_all(lower(text), '{marker_regex(w)}'))"
        for lang, w in LANG_MARKERS.items()
    }
    greatest = "greatest(" + ", ".join(score.values()) + ")"
    whens = " ".join(
        f"WHEN {score[lang]} = {greatest} AND {greatest} > 0 THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return (
        f"SELECT doc_id, CASE {whens} ELSE 'und' END AS pred "
        "FROM documents"
    )

@stage(
    "text_mislabel_rate_by_source",
    f"""
    WITH q AS ({_mislabel_pred_sql()}),
    p AS (
      SELECT d.source,
             CASE WHEN d.lang = q.pred THEN 1 ELSE 0 END AS ok
      FROM documents d JOIN q ON q.doc_id = d.doc_id
    )
    SELECT source,
           count(*) AS n_docs,
           sum(1 - ok) AS n_mismatch,
           sum(1 - ok) * 1000000 // count(*) AS mismatch_ppm
    FROM p GROUP BY 1
    """,
    "label-vs-prediction mismatch rate per source: which PROVIDER "
    "ships mislabeled languages — the per-source rollup of the "
    "confusion matrix; floor-scaled ppm",
)
def q_text_mislabel_rate_by_source(spark, sf_dir):
    from kenshin_spark.functions.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    ok = (F.col("lang") == language_id("text")).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.lit(1) - ok).alias("n_mismatch"),
        F.floor(F.sum(F.lit(1) - ok) * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("mismatch_ppm"),
    )


@stage(
    "q_supplier_no_sales_audit",
    """
    SELECT
      (SELECT count(*) FROM supplier) AS n_suppliers,
      (SELECT count(*) FROM supplier s
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_suppkey = s.s_suppkey))
        AS n_idle_suppliers
    """,
    "idle-supplier audit: suppliers with zero shipped lines (the "
    "dimension rows the fact table never references) — one anti-join "
    "count",
)
def q_q_supplier_no_sales_audit(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    idle = s.join(
        li.select("l_suppkey").distinct(),
        s.s_suppkey == F.col("l_suppkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n_idle_suppliers"))
    tot = s.agg(F.count(F.lit(1)).alias("n_suppliers"))
    return tot.crossJoin(idle)


# --------------------------------------------------------------------------
# Batch 3: dow consistency, order-gap p90 bands, char share, metric
# name audit, brand depth, zero values, segment medians, priority set,
# max-value days, tokenizer diff bands.
# --------------------------------------------------------------------------


@stage(
    "q_user_dow_consistency",
    """
    WITH d AS (
      SELECT user_id,
             CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7
                  AS BIGINT) AS dow,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, sum(n) AS total FROM d GROUP BY 1),
    m AS (
      SELECT d.user_id, max(d.n) AS top_dow_n FROM d GROUP BY 1
    )
    SELECT m.user_id, t.total AS n_events,
           m.top_dow_n * 1000000 // t.total AS top_dow_share_ppm
    FROM m JOIN t ON t.user_id = m.user_id
    """,
    "weekly-habit consistency: the share of each user's events that "
    "land on their single busiest weekday — routine users score high, "
    "uniform users ~1/7; floor-scaled ppm",
)
def q_q_user_dow_consistency(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dow = (
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long") + 4
    ) % 7
    d = ev.groupBy("user_id", dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n")
    )
    agg = d.groupBy("user_id").agg(
        F.sum("n").alias("n_events"), F.max("n").alias("top_dow_n")
    )
    return agg.select(
        "user_id", "n_events",
        F.expr("top_dow_n * 1000000 DIV n_events").alias(
            "top_dow_share_ppm"
        ),
    )


@stage(
    "q_order_gap_p90_bands",
    """
    WITH g AS (
      SELECT o_custkey,
             datediff('day',
               lag(o_orderdate) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_d
      FROM orders
    ),
    p AS (
      SELECT o_custkey, quantile_cont(gap_d, 0.9) AS p90
      FROM g WHERE gap_d IS NOT NULL GROUP BY 1
    )
    SELECT CAST(floor(p90 / 30) AS BIGINT) AS p90_month_band,
           count(*) AS n_customers
    FROM p GROUP BY 1
    """,
    "order-cadence tail per customer: the p90 inter-order gap banded "
    "by months — the reorder-reminder timing table; exact "
    "interpolated percentiles over integer day gaps",
)
def q_q_order_gap_p90_bands(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    g = orders.select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap_d"),
    ).where(F.col("gap_d").isNotNull())
    p = g.groupBy("o_custkey").agg(
        F.expr("percentile(gap_d, 0.9)").alias("p90")
    )
    return p.groupBy(
        F.floor(F.col("p90") / 30).cast("long").alias("p90_month_band")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@stage(
    "text_char_share_by_lang",
    """
    WITH l AS (
      SELECT lang, sum(n_chars) AS chars FROM documents GROUP BY 1
    ),
    t AS (SELECT sum(chars) AS total FROM l)
    SELECT l.lang, l.chars,
           l.chars * 1000000 // t.total AS share_ppm
    FROM l, t
    """,
    "character-volume share per language — the mixture weight the "
    "temperature sampler rebalances, floor-scaled",
)
def q_text_char_share_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    l = docs.groupBy("lang").agg(F.sum("n_chars").alias("chars"))
    t = l.agg(F.sum("chars").alias("total"))
    return l.crossJoin(F.broadcast(t)).select(
        "lang", "chars",
        F.expr("chars * 1000000 DIV total").alias("share_ppm"),
    )


@stage(
    "ts_metric_name_audit",
    f"""
    WITH pts AS ({PTS}),
    m AS (SELECT DISTINCT metric FROM pts)
    SELECT count(*) AS n_metrics,
           sum(CASE WHEN regexp_matches(metric, '^[a-z_.]+$')
                    THEN 1 ELSE 0 END) AS n_wellformed,
           CAST(min(length(metric)) AS BIGINT) AS min_len,
           CAST(max(length(metric)) AS BIGINT) AS max_len
    FROM m
    """,
    "metric-name hygiene: names matching the lowercase dotted "
    "convention plus the length envelope — the catalog lint every "
    "relay enforces before admission",
)
def q_ts_metric_name_audit(spark, sf_dir):
    pts = _points(spark, sf_dir)
    m = pts.select("metric").distinct()
    ok = F.col("metric").rlike("^[a-z_.]+$").cast("long")
    return m.agg(
        F.count(F.lit(1)).alias("n_metrics"),
        F.sum(ok).alias("n_wellformed"),
        F.min(F.length("metric")).cast("long").alias("min_len"),
        F.max(F.length("metric")).cast("long").alias("max_len"),
    )


@stage(
    "q_types_per_brand",
    """
    WITH b AS (
      SELECT p_brand, count(DISTINCT p_type) AS n_types
      FROM part GROUP BY 1
    )
    SELECT CAST(n_types AS BIGINT) AS n_types, count(*) AS n_brands
    FROM b GROUP BY 1
    """,
    "catalog depth histogram: distinct part types carried per brand — "
    "assortment breadth in two grouped counts",
)
def q_q_types_per_brand(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    b = part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types")
    )
    return b.groupBy(
        F.col("n_types").cast("long").alias("n_types")
    ).agg(F.count(F.lit(1)).alias("n_brands"))


@stage(
    "q_events_zero_value_count",
    """
    SELECT event_type,
           count(value) AS n_values,
           sum(CASE WHEN value = 0.0 THEN 1 ELSE 0 END) AS n_zero
    FROM events GROUP BY 1
    """,
    "exact-zero incidence per event type — zeros are semantically "
    "loaded (no-op vs missing vs free); exact float equality counts",
)
def q_q_events_zero_value_count(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.sum((F.col("value") == 0.0).cast("long")).alias("n_zero"),
    )


@stage(
    "q_segment_balance_median",
    """
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(quantile_cont(c_acctbal, 0.5), 6) AS median_balance
    FROM customer GROUP BY 1
    """,
    "median account balance per market segment — the robust central "
    "tendency next to the r9 decimal totals; exact interpolated "
    "median",
)
def q_q_segment_balance_median(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias(
            "median_balance"
        ),
    )


@stage(
    "q_priority_set_audit",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS priority_rank
    FROM orders GROUP BY 1
    """,
    "priority vocabulary audit: the distinct priority strings, their "
    "volumes, and the numeric rank embedded in the label (the "
    "'1-URGENT' convention the generator promises) — parsing the "
    "enum's own encoding",
)
def q_q_priority_set_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.substring("o_orderpriority", 1, 1)
        .cast("long")
        .alias("priority_rank"),
    ).select("o_orderpriority", "n_orders", "priority_rank")


@stage(
    "q_events_max_value_day",
    """
    WITH g AS (
      SELECT event_type,
             CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS BIGINT)
               AS day,
             max(value) AS day_max
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type, day, day_max FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY day_max DESC, day) AS rnk
      FROM g
    ) t WHERE rnk = 1
    """,
    "record day per event type: the day carrying the all-time max "
    "value, with a day tie-break — the incident-lookup row",
)
def q_q_events_max_value_day(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    g = ev.groupBy(
        "event_type",
        (F.unix_timestamp("ts").cast("long") / 86400)
        .cast("long")
        .alias("day"),
    ).agg(F.max("value").alias("day_max"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("day_max").desc(), F.col("day")
    )
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("event_type", "day", "day_max")
    )


@stage(
    "text_tokenizer_diff_bands",
    r"""
    WITH t AS (
      SELECT len(regexp_extract_all(text,
                 '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]')) -
             len(string_split_regex(trim(text), '\s+')) AS diff
      FROM documents
    )
    SELECT CAST(diff AS BIGINT) AS token_diff, count(*) AS n_docs
    FROM t GROUP BY 1
    """,
    "tokenizer disagreement: BPE-ish token count minus whitespace "
    "token count per doc, histogrammed — zero on this punctuation-"
    "free corpus by construction, nonzero the moment symbols appear "
    "(the contract between the two engine tokenizers, pinned)",
)
def q_text_tokenizer_diff_bands(spark, sf_dir):
    from kenshin_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    diff = (
        bpe_ish_token_count("text").cast("long")
        - token_count("text").cast("long")
    )
    return docs.select(diff.alias("token_diff")).groupBy(
        "token_diff"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# Batch 4: session opening types, price bands by flag, December share,
# doc length medians, nation-count Gini, first-day coverage, balance
# vs volume matrix, vec-id continuity, top-user value share, name
# length bands.
# --------------------------------------------------------------------------


@stage(
    "q_session_first_type",
    """
    WITH s AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT user_id, ts, event_type, event_id,
             sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM s
    ),
    f AS (
      SELECT user_id, sid,
             arg_min(event_type,
               CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id)
               AS first_type
      FROM g GROUP BY 1, 2
    )
    SELECT first_type, count(*) AS n_sessions FROM f GROUP BY 1
    """,
    "session opening move: the first event type of every 30-minute "
    "session ((ts, event_id)-ordered min_by for deterministic "
    "tie-breaks) — which doors sessions start through, not just "
    "users (the r13 first-touch row at session granularity)",
)
def q_q_session_first_type(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    g = s.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    f = g.groupBy("user_id", "sid").agg(
        F.expr(
            "min_by(event_type,"
            " unix_timestamp(ts) * 1000000 + event_id)"
        ).alias("first_type")
    )
    return f.groupBy("first_type").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


@stage(
    "q_price_band_by_flag",
    """
    SELECT l_returnflag,
           CAST(floor(l_extendedprice / 20000) AS BIGINT) AS price_band,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1, 2
    """,
    "price-band mix per return flag — do returns skew expensive; "
    "floor banding, integer counts",
)
def q_q_price_band_by_flag(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / 20000)
        .cast("long")
        .alias("price_band"),
    ).agg(F.count(F.lit(1)).alias("n_lines"))


@stage(
    "q_orders_december_share",
    """
    WITH y AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS VARCHAR) AS year,
             count(*) AS n_orders,
             sum(CASE WHEN strftime(o_orderdate, '%m') = '12'
                      THEN 1 ELSE 0 END) AS n_december
      FROM orders GROUP BY 1
    )
    SELECT year, n_orders, n_december,
           n_december * 1000000 // n_orders AS december_ppm
    FROM y
    """,
    "December concentration per year: the seasonal-peak share a "
    "staffing plan budgets against; floor-scaled ppm",
)
def q_q_orders_december_share(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dec = (F.date_format("o_orderdate", "MM") == "12").cast("long")
    y = orders.groupBy(
        F.date_format("o_orderdate", "yyyy").alias("year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec).alias("n_december"),
    )
    return y.select(
        "year", "n_orders", "n_december",
        F.expr("n_december * 1000000 DIV n_orders").alias(
            "december_ppm"
        ),
    )


@stage(
    "text_len_median_by_lang",
    """
    SELECT lang,
           count(*) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 6) AS median_chars
    FROM documents GROUP BY 1
    """,
    "median document length per language — the robust sizing row "
    "next to the min/median/max token envelope",
)
def q_text_len_median_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias(
            "median_chars"
        ),
    )


@stage(
    "q_customer_nation_gini",
    """
    WITH c AS (
      SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1
    ),
    r AS (
      SELECT n, row_number() OVER (ORDER BY n, c_nationkey) AS i FROM c
    ),
    s AS (SELECT count(*) AS k, sum(n) AS sx, sum(i * n) AS six FROM r)
    SELECT k AS n_nations, sx AS n_customers,
           CAST((2 * six - (k + 1) * sx) * 1000000 // (k * sx)
                AS BIGINT) AS gini_ppm
    FROM s
    """,
    "geographic concentration of the customer base as a "
    "scaled-integer Gini over per-nation counts — one number for "
    "the market-spread narrative",
)
def q_q_customer_nation_gini(spark, sf_dir):
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    r = g.select(
        "n",
        F.row_number().over(Window.orderBy("n", "c_nationkey")).alias("i"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sx"),
        F.sum(F.col("i") * F.col("n")).alias("six"),
    )
    return s.select(
        F.col("k").alias("n_nations"),
        F.col("sx").alias("n_customers"),
        F.floor(
            (2 * F.col("six") - (F.col("k") + 1) * F.col("sx"))
            * 1000000
            / (F.col("k") * F.col("sx"))
        ).cast("long").alias("gini_ppm"),
    )


@stage(
    "ts_first_day_coverage",
    f"""
    WITH pts AS ({PTS}),
    b AS (SELECT min(ts // 86400) AS d0 FROM pts)
    SELECT metric,
           sum(CASE WHEN ts // 86400 = d0 THEN 1 ELSE 0 END)
             AS first_day_points,
           count(*) AS total_points
    FROM pts, b GROUP BY 1
    """,
    "cold-start coverage: each metric's share of points on the "
    "stream's first day — did every series start reporting from day "
    "one (a migration-completeness check); integer day arithmetic",
)
def q_ts_first_day_coverage(spark, sf_dir):
    pts = _points(spark, sf_dir)
    b = pts.agg(
        F.min((F.col("ts") / 86400).cast("long")).alias("d0")
    )
    j = pts.crossJoin(F.broadcast(b))
    first = (
        (F.col("ts") / 86400).cast("long") == F.col("d0")
    ).cast("long")
    return j.groupBy("metric").agg(
        F.sum(first).alias("first_day_points"),
        F.count(F.lit(1)).alias("total_points"),
    )


@stage(
    "q_supplier_balance_volume_matrix",
    """
    WITH v AS (
      SELECT l_suppkey, count(*) AS n_lines FROM lineitem GROUP BY 1
    ),
    b AS (
      SELECT s_suppkey,
             ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey)
               AS balance_q
      FROM supplier
    )
    SELECT b.balance_q,
           CASE WHEN coalesce(v.n_lines, 0) = 0 THEN '0'
                WHEN v.n_lines <= 20 THEN '1-20'
                WHEN v.n_lines <= 50 THEN '21-50'
                ELSE '50+' END AS volume_band,
           count(*) AS n_suppliers
    FROM b LEFT JOIN v ON v.l_suppkey = b.s_suppkey
    GROUP BY 1, 2
    """,
    "supplier balance quartile x shipping volume matrix — does "
    "account health track throughput; deterministic ntile with key "
    "tie-break",
)
def q_q_supplier_balance_volume_matrix(spark, sf_dir):
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    v = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_lines"))
    b = s.select(
        "s_suppkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey")))
        .alias("balance_q"),
    )
    j = b.join(v, b.s_suppkey == v.l_suppkey, "left")
    n = F.coalesce("n_lines", F.lit(0))
    band = (
        F.when(n == 0, "0")
        .when(n <= 20, "1-20")
        .when(n <= 50, "21-50")
        .otherwise("50+")
    )
    return j.groupBy("balance_q", band.alias("volume_band")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )


@stage(
    "emb_vec_id_continuity",
    """
    SELECT count(*) AS n_vectors,
           min(vec_id) AS min_id,
           max(vec_id) AS max_id,
           max(vec_id) - min(vec_id) + 1 - count(*) AS n_gaps
    FROM embeddings
    """,
    "vector key continuity: gaps in the vec_id range — the "
    "load-completeness audit for the embedding store",
)
def q_emb_vec_id_continuity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
        (
            F.max("vec_id") - F.min("vec_id") + 1 - F.count(F.lit(1))
        ).alias("n_gaps"),
    )


@stage(
    "q_top_user_value_share",
    """
    WITH u AS (
      SELECT event_type, user_id,
             CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 1000000)
                  AS BIGINT) AS micros
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, sum(micros) AS total, max(micros) AS top
      FROM u GROUP BY 1
    )
    SELECT event_type,
           top * 1000000 // total AS top_user_share_ppm
    FROM t
    """,
    "single-whale concentration per event type: the top user's share "
    "of total value in integer micro-units end to end (DECIMAL sum, "
    "floor micros, floor-divided ppm)",
)
def q_q_top_user_value_share(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    u = ev.groupBy("event_type", "user_id").agg(
        F.floor(
            F.sum(F.col("value").cast("decimal(18,6)")) * 1000000
        ).cast("long").alias("micros")
    )
    t = u.groupBy("event_type").agg(
        F.sum("micros").alias("total"), F.max("micros").alias("top")
    )
    return t.select(
        "event_type",
        F.expr("top * 1000000 DIV total").alias("top_user_share_ppm"),
    )


@stage(
    "q_part_name_length_bands",
    """
    SELECT CAST(length(p_name) // 5 AS BIGINT) AS len_band,
           count(*) AS n_parts
    FROM part GROUP BY 1
    """,
    "part-name length histogram in 5-char bands — the column-width "
    "profile a storage planner sizes dictionaries from",
)
def q_q_part_name_length_bands(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.groupBy(
        F.floor(F.length("p_name") / 5).cast("long").alias("len_band")
    ).agg(F.count(F.lit(1)).alias("n_parts"))


# --------------------------------------------------------------------------
# Final bank rows (to 50): weekly value totals, key parity, source
# length bands, tax vocabulary, segment shares, daily metric counts,
# id-range audits, brand counts, month envelopes, opener diversity,
# linenumber profile, type volume share, label id envelopes, flag
# medians, event-id density, week count envelope.
# --------------------------------------------------------------------------


@stage(
    "q_events_weekly_value_totals",
    """
    SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS BIGINT)
             AS week,
           count(value) AS n_values,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_value
    FROM events WHERE value IS NOT NULL GROUP BY 1
    """,
    "weekly value totals, DECIMAL-exact — the finance rollup cadence",
)
def q_q_events_weekly_value_totals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    return ev.groupBy(
        (F.unix_timestamp("ts").cast("long") / 604800)
        .cast("long")
        .alias("week")
    ).agg(
        F.count("value").alias("n_values"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value"),
    )


@stage(
    "q_orderkey_parity_split",
    """
    SELECT CAST(o_orderkey % 2 AS BIGINT) AS parity,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    "key parity balance — a hash-partitioning smoke (generator keys "
    "skew odd/even in a known way; a 50/50 split means re-keying "
    "happened)",
)
def q_q_orderkey_parity_split(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        (F.col("o_orderkey") % 2).cast("long").alias("parity")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@stage(
    "text_source_length_bands",
    """
    SELECT source,
           CAST(n_chars // 200 AS BIGINT) AS len_band,
           count(*) AS n_docs
    FROM documents GROUP BY 1, 2
    """,
    "document length bands per source — the provider-shape comparison "
    "behind mixture decisions",
)
def q_text_source_length_bands(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        "source",
        F.floor(F.col("n_chars") / 200).cast("long").alias("len_band"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@stage(
    "q_lineitem_tax_vocabulary",
    """
    SELECT round(CAST(l_tax AS DOUBLE), 2) AS tax_rate,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1
    """,
    "the tax-rate vocabulary: distinct rates and their volumes — the "
    "enum audit for a column that should hold few values",
)
def q_q_lineitem_tax_vocabulary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.round(F.col("l_tax").cast("double"), 2).alias("tax_rate")
    ).agg(F.count(F.lit(1)).alias("n_lines"))


@stage(
    "q_segment_share",
    """
    WITH s AS (
      SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1
    ),
    t AS (SELECT sum(n) AS total FROM s)
    SELECT s.c_mktsegment, s.n AS n_customers,
           s.n * 1000000 // t.total AS share_ppm
    FROM s, t
    """,
    "market segment shares as floor-scaled ppm — the composition "
    "headline",
)
def q_q_segment_share(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    t = s.agg(F.sum("n_customers").alias("total"))
    return s.crossJoin(F.broadcast(t)).select(
        "c_mktsegment", "n_customers",
        F.expr("n_customers * 1000000 DIV total").alias("share_ppm"),
    )


@stage(
    "ts_reporting_metrics_per_day",
    f"""
    WITH pts AS ({PTS})
    SELECT CAST(ts // 86400 AS BIGINT) AS day,
           count(DISTINCT metric) AS n_metrics,
           count(*) AS n_points
    FROM pts GROUP BY 1
    """,
    "fleet reporting census per day: distinct metrics and point "
    "volume — the series-count stability line a catalog monitor "
    "watches",
)
def q_ts_reporting_metrics_per_day(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        (F.col("ts") / 86400).cast("long").alias("day")
    ).agg(
        F.countDistinct("metric").alias("n_metrics"),
        F.count(F.lit(1)).alias("n_points"),
    )


@stage(
    "q_events_user_id_range",
    """
    SELECT count(DISTINCT user_id) AS n_users,
           min(user_id) AS min_id,
           max(user_id) AS max_id,
           max(user_id) - min(user_id) + 1 - count(DISTINCT user_id)
             AS n_gaps
    FROM events
    """,
    "user-id space audit: distinct users vs the id range they span — "
    "the completeness check on the user dimension implied by the "
    "event stream",
)
def q_q_events_user_id_range(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.min("user_id").alias("min_id"),
        F.max("user_id").alias("max_id"),
        (
            F.max("user_id") - F.min("user_id") + 1
            - F.countDistinct("user_id")
        ).alias("n_gaps"),
    )


@stage(
    "q_brand_part_counts",
    """
    SELECT count(DISTINCT p_brand) AS n_brands,
           count(*) AS n_parts,
           count(*) // count(DISTINCT p_brand) AS avg_parts_per_brand
    FROM part
    """,
    "brand census: brand count, part count and the integer mean parts "
    "per brand — the catalog shape summary",
)
def q_q_brand_part_counts(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.agg(
        F.countDistinct("p_brand").alias("n_brands"),
        F.count(F.lit(1)).alias("n_parts"),
        F.expr("count(*) DIV count(DISTINCT p_brand)").alias(
            "avg_parts_per_brand"
        ),
    )


@stage(
    "q_orders_month_envelope",
    """
    WITH m AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT count(*) AS n_months,
           CAST(min(n) AS BIGINT) AS min_monthly,
           CAST(max(n) AS BIGINT) AS max_monthly
    FROM m
    """,
    "monthly volume envelope: the min/max orders any month carries — "
    "the seasonality amplitude in two numbers",
)
def q_q_orders_month_envelope(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n"))
    return m.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.min("n").cast("long").alias("min_monthly"),
        F.max("n").cast("long").alias("max_monthly"),
    )


@stage(
    "text_opener_diversity_by_source",
    r"""
    WITH f AS (
      SELECT source,
             string_split_regex(trim(lower(text)), '\s+')[1] AS opener
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT opener) AS n_distinct_openers
    FROM f GROUP BY 1
    """,
    "opener diversity per source: distinct first tokens vs docs — "
    "low diversity flags templated providers",
)
def q_text_opener_diversity_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "source",
        F.element_at(F.split(F.trim(F.lower("text")), r"\s+"), 1).alias(
            "opener"
        ),
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("opener").alias("n_distinct_openers"),
    )


@stage(
    "q_linenumber_profile",
    """
    SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1
    """,
    "line-number occupancy: how many orders reach each line slot — "
    "the order-size decay curve in its rawest form",
)
def q_q_linenumber_profile(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_linenumber").cast("long").alias("linenumber")
    ).agg(F.count(F.lit(1)).alias("n_lines"))


@stage(
    "q_event_type_volume_share",
    """
    WITH s AS (
      SELECT event_type, count(*) AS n FROM events GROUP BY 1
    ),
    t AS (SELECT sum(n) AS total FROM s)
    SELECT s.event_type, s.n AS n_events,
           s.n * 1000000 // t.total AS share_ppm
    FROM s, t
    """,
    "event type volume shares as floor-scaled ppm — the traffic "
    "composition headline",
)
def q_q_event_type_volume_share(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    t = s.agg(F.sum("n_events").alias("total"))
    return s.crossJoin(F.broadcast(t)).select(
        "event_type", "n_events",
        F.expr("n_events * 1000000 DIV total").alias("share_ppm"),
    )


@stage(
    "emb_label_id_envelope",
    """
    SELECT label,
           count(*) AS n_vectors,
           min(vec_id) AS min_id,
           max(vec_id) AS max_id
    FROM embeddings GROUP BY 1
    """,
    "label id envelopes: are labels interleaved across the id space "
    "or block-assigned — the layout fact that decides whether "
    "label-filtered scans can prune",
)
def q_emb_label_id_envelope(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
    )


@stage(
    "q_qty_median_by_flag",
    """
    SELECT l_returnflag,
           count(*) AS n_lines,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
    FROM lineitem GROUP BY 1
    """,
    "median line quantity per return flag — the robust companion to "
    "the flag/status totals",
)
def q_q_qty_median_by_flag(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias(
            "median_qty"
        ),
    )


@stage(
    "q_event_id_density",
    """
    SELECT count(*) AS n_events,
           min(event_id) AS min_id,
           max(event_id) AS max_id,
           count(*) * 1000000 // (max(event_id) - min(event_id) + 1)
             AS density_ppm
    FROM events
    """,
    "event-id space density: rows vs the id range — sequence-gap "
    "audit for the arrival-order column every LWW decision keys on",
)
def q_q_event_id_density(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.expr(
            "count(*) * 1000000 DIV (max(event_id) - min(event_id) + 1)"
        ).alias("density_ppm"),
    )


@stage(
    "ts_week_count_envelope",
    f"""
    WITH pts AS ({PTS}),
    w AS (
      SELECT metric, ts // 604800 AS week, count(*) AS n
      FROM pts GROUP BY 1, 2
    )
    SELECT metric,
           count(*) AS n_weeks,
           CAST(min(n) AS BIGINT) AS min_weekly,
           CAST(max(n) AS BIGINT) AS max_weekly
    FROM w GROUP BY 1
    """,
    "weekly volume envelope per metric — the ingest-stability "
    "companion to the daily envelope at coarser grain",
)
def q_ts_week_count_envelope(spark, sf_dir):
    pts = _points(spark, sf_dir)
    w = pts.groupBy(
        "metric", (F.col("ts") / 604800).cast("long").alias("week")
    ).agg(F.count(F.lit(1)).alias("n"))
    return w.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.min("n").cast("long").alias("min_weekly"),
        F.max("n").cast("long").alias("max_weekly"),
    )

# --- oracle result-type normalization (VERDICT r8 "What's wrong" #1) ---
# DuckDB types uncast sum()/integer-// results HUGEINT, which its pandas
# conversion renders float64 while the Spark twin hands int64 — equal
# values, different driver hash. Columns below were flagged by
# tools/lint_oracles.py; cast_bigint_cols wraps each oracle in a
# SELECT * REPLACE (CAST(col AS BIGINT) AS col) shell (lossless: all are
# counts/ppm far below 2**63). The lint runs as tests/test_oracle_types.py
# so no new HUGEINT oracle can stage.
from kenshin_spark.oracle_types import apply_bigint_casts  # noqa: E402

_BIGINT_CASTS = {
    "q_events_daily_type_mix_drift": ("share_ppm",),
    "text_quality_pass_by_lang": ("n_keep",),
    "q_part_reorder_rate": ("n_reordered", "reorder_ppm",),
    "q_events_halflife_churn": ("n_churned", "n_new", "n_retained",),
    "text_mislabel_rate_by_source": ("n_mismatch", "mismatch_ppm",),
    "q_user_dow_consistency": ("n_events", "top_dow_share_ppm",),
    "text_char_share_by_lang": ("chars", "share_ppm",),
    "ts_metric_name_audit": ("n_wellformed",),
    "q_events_zero_value_count": ("n_zero",),
    "q_orders_december_share": ("n_december", "december_ppm",),
    "q_customer_nation_gini": ("n_customers",),
    "ts_first_day_coverage": ("first_day_points",),
    "q_top_user_value_share": ("top_user_share_ppm",),
    "q_segment_share": ("share_ppm",),
    "q_event_type_volume_share": ("share_ppm",),
}
apply_bigint_casts(STAGED_R15, _BIGINT_CASTS)
