"""Overflow bank — ROUND 16: eight self-contained analytics rows moved
out of the round-11 bank (round-11 surgery, VERDICT r10 item 1) so the
round-10 engine rows — ``store_manifest_snapshot_lifecycle``,
``mm_phash_real_pixels`` and the r9-continuation codec rows — could
ride the r11 driver window instead of waiting here until round 16.

Same staging mechanism and gate as the earlier banks
(``tests/test_queries_staged_r16.py``). Promote with
``python tools/promote_staged.py queries_staged_r16`` once round 15's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QuerySpec

STAGED_R16: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R16[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "q_nation_quarter_matrix",
    """
    SELECT n.n_name,
           CAST(strftime(o.o_orderdate, '%Y') AS VARCHAR) || '-Q' ||
             CAST(quarter(o.o_orderdate) AS VARCHAR) AS quarter,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
    """,
    "order volume by nation and quarter: the customer->nation "
    "dimension chain (nation broadcast) with standard quarter "
    "arithmetic — identical month-to-quarter mapping on both engines",
)
def q_q_nation_quarter_matrix(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    q = F.concat(
        F.date_format("o_orderdate", "yyyy"),
        F.lit("-Q"),
        F.quarter("o_orderdate").cast("string"),
    )
    return j.groupBy("n_name", q.alias("quarter")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@stage(
    "q_order_first_last_gap",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(datediff('day', min(o_orderdate), max(o_orderdate))
                AS BIGINT) AS span_days
    FROM orders GROUP BY 1 HAVING count(*) >= 2
    """,
    "customer ordering lifespan: first-to-last order span in days for "
    "repeat customers — the engagement-window statistic cohort "
    "models bucket by; integer day arithmetic",
)
def q_q_order_first_last_gap(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
            .cast("long")
            .alias("span_days"),
        )
        .where(F.col("n_orders") >= 2)
    )


@stage(
    "q_event_session_value_bands",
    """
    WITH s AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT user_id, value,
             sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM s
    ),
    sess AS (
      SELECT user_id, sid,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS sum_value
      FROM g GROUP BY 1, 2
    )
    SELECT CAST(floor(coalesce(sum_value, 0) / 100.0) AS BIGINT) AS band,
           count(*) AS n_sessions
    FROM sess GROUP BY 1
    """,
    "session value distribution: 30-minute-gap sessions (the same "
    "session_window semantics q_event_sessions_native pins) with "
    "DECIMAL-exact per-session value sums, banded by 100-value "
    "buckets — the monetization histogram a product dashboard shows; "
    "the gap-and-island replay and banding are exact",
)
def q_q_event_session_value_bands(spark, sf_dir):
    from kenshin_spark.streaming.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, gap="30 minutes")
    return (
        sess.select(
            F.floor(F.coalesce("sum_value", F.lit(0.0)) / 100.0)
            .cast("long")
            .alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@stage(
    "q_events_active_days_histogram",
    """
    WITH u AS (
      SELECT user_id,
             count(DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400)
               AS active_days
      FROM events GROUP BY 1
    )
    SELECT active_days, count(*) AS n_users FROM u GROUP BY 1
    """,
    "engagement depth histogram: users bucketed by how many distinct "
    "days they were active — the DAU-quality statistic behind "
    "stickiness ratios; integer distinct-day counts",
)
def q_q_events_active_days_histogram(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.countDistinct(
            (F.unix_timestamp("ts").cast("long") / 86400).cast("long")
        ).alias("active_days")
    )
    return u.groupBy("active_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@stage(
    "q_discount_quantity_curve",
    """
    SELECT round(CAST(l_discount AS DOUBLE), 2) AS discount,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 1000000) / 1000000 AS avg_quantity
    FROM lineitem GROUP BY 1
    """,
    "discount elasticity curve: average line quantity at each "
    "discount level — DECIMAL-summed quantities divided once, with "
    "the explicit x*1e6 rounding guard on the single float division; "
    "does a deeper discount actually move volume",
)
def q_q_discount_quantity_curve(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.round(F.col("l_discount").cast("double"), 2).alias("discount")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1))
                * 1000000
            )
            / 1000000
        ).alias("avg_quantity"),
    )


@stage(
    "q_events_type_dow_heatmap",
    """
    SELECT event_type,
           CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7
                AS BIGINT) AS dow,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    "event volume heatmap by type and day-of-week — Thursday-anchored "
    "epoch-day arithmetic instead of dayofweek() (the cross-engine "
    "convention trap); one map-side-combined aggregate",
)
def q_q_events_type_dow_heatmap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dow = (
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long") + 4
    ) % 7
    return ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


@stage(
    "q_orders_mom_growth",
    """
    WITH m AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders,
           CAST(n_orders - lag(n_orders) OVER (ORDER BY month)
                AS BIGINT) AS mom_delta
    FROM m
    """,
    "month-over-month order growth: integer deltas via lag over the "
    "lexicographically ordered month key (yyyy-MM sorts "
    "chronologically) — the complement of the registry's YoY row",
)
def q_q_orders_mom_growth(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return m.select(
        "month", "n_orders",
        (
            F.col("n_orders")
            - F.lag("n_orders").over(Window.orderBy("month"))
        ).cast("long").alias("mom_delta"),
    )


@stage(
    "q_part_name_words",
    r"""
    SELECT len(string_split_regex(trim(p_name), '\s+')) AS n_words,
           count(*) AS n_parts,
           min(p_partkey) AS example_key
    FROM part GROUP BY 1
    """,
    "part-name word-count histogram with a deterministic example key "
    "per bucket (min partkey) — the catalog-hygiene profile; integer "
    "splits and counts",
)
def q_q_part_name_words(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.groupBy(
        F.size(F.split(F.trim("p_name"), r"\s+")).alias("n_words")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("example_key"),
    )


@stage(
    "q_priority_ship_latency",
    """
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(quantile_cont(
             datediff('day', o_orderdate, l_shipdate), 0.5), 6)
             AS median_days,
           round(quantile_cont(
             datediff('day', o_orderdate, l_shipdate), 0.9), 6)
             AS p90_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    "fulfilment latency by order priority: exact interpolated median "
    "and p90 of integer day lags through the orderkey join — does "
    "URGENT actually ship faster; integer inputs keep the "
    "interpolation exact on both engines",
)
def q_q_priority_ship_latency(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("lag_d"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.expr("percentile(lag_d, 0.5)"), 6).alias("median_days"),
        F.round(F.expr("percentile(lag_d, 0.9)"), 6).alias("p90_days"),
    )


@stage(
    "q_region_nation_audit",
    """
    SELECT r.r_name, count(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
    "dimension completeness audit: nations per region — the tiny "
    "catalog sanity row every star-schema load starts with",
)
def q_q_region_nation_audit(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@stage(
    "q_orders_quarter_coverage",
    """
    SELECT CAST(strftime(o_orderdate, '%Y') AS VARCHAR) || '-Q' ||
             CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
           count(*) AS n_orders,
           count(DISTINCT o_orderdate) AS n_active_days,
           CAST(min(o_orderdate) AS VARCHAR) AS first_day,
           CAST(max(o_orderdate) AS VARCHAR) AS last_day
    FROM orders GROUP BY 1
    """,
    "order-stream coverage per quarter: volume, distinct active days "
    "and the date envelope — the completeness report that catches "
    "partial loads at period boundaries; dates stringified so both "
    "engines compare identically",
)
def q_q_orders_quarter_coverage(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    q = F.concat(
        F.date_format("o_orderdate", "yyyy"),
        F.lit("-Q"),
        F.quarter("o_orderdate").cast("string"),
    )
    return orders.groupBy(q.alias("quarter")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderdate").alias("n_active_days"),
        F.min("o_orderdate").cast("string").alias("first_day"),
        F.max("o_orderdate").cast("string").alias("last_day"),
    )


@stage(
    "q_part_size_mode_by_type",
    """
    SELECT p_type, size_mode, n_at_mode FROM (
      SELECT p_type, p_size AS size_mode, count(*) AS n_at_mode,
             row_number() OVER (
               PARTITION BY p_type ORDER BY count(*) DESC, p_size) AS rnk
      FROM part GROUP BY 1, 2
    ) t WHERE rnk = 1
    """,
    "modal part size per type with a size tie-break — the default-"
    "dimension pick a catalog UI pre-selects; grouped counts + "
    "per-group rank",
)
def q_q_part_size_mode_by_type(spark, sf_dir):
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    counted = part.groupBy("p_type", "p_size").agg(
        F.count(F.lit(1)).alias("n_at_mode")
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("n_at_mode").desc(), F.col("p_size")
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "p_type", F.col("p_size").alias("size_mode"), "n_at_mode"
        )
    )


@stage(
    "q_region_quarter_heat",
    """
    SELECT r.r_name,
           CAST(quarter(o.o_orderdate) AS BIGINT) AS q,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
    """,
    "regional seasonality heat: order volume by region and calendar "
    "quarter (year-collapsed) — both dims broadcast, standard "
    "quarter arithmetic",
)
def q_q_region_quarter_heat(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            "r_name", F.quarter("o_orderdate").cast("long").alias("q")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
