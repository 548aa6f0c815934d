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
