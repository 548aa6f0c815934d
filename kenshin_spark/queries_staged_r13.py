"""Ninth staged bank — ROUND 13: KMV differences, cascade count
conservation, retention age bands, supplier line share, token
burstiness, props coverage, intra-order shipping spread.

Same staging mechanism and gate (``tests/test_queries_staged_r13.py``)
as the earlier banks. Promote with
``python tools/promote_staged.py queries_staged_r13`` once round 12's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import PTS, QuerySpec, _points

STAGED_R13: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R13[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


_H60U = (
    "CAST(('0x' || substr(md5('ksp|' || CAST(user_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


@stage(
    "sketch_kmv_churn_difference",
    f"""
    WITH sa AS (SELECT DISTINCT {_H60U} AS h FROM events
                WHERE event_type = 'view' ORDER BY h LIMIT 256),
    sb AS (SELECT DISTINCT {_H60U} AS h FROM events
           WHERE event_type = 'purchase' ORDER BY h LIMIT 256),
    m AS (SELECT DISTINCT h FROM
            (SELECT h FROM sa UNION ALL SELECT h FROM sb)
          ORDER BY h LIMIT 256),
    fl AS (
      SELECT m.h,
             (m.h IN (SELECT h FROM sa)
              AND m.h NOT IN (SELECT h FROM sb)) AS a_only,
             (m.h IN (SELECT h FROM sb)
              AND m.h NOT IN (SELECT h FROM sa)) AS b_only
      FROM m
    ),
    agg AS (
      SELECT count(*) AS n, max(h) AS hk,
             sum(CASE WHEN a_only THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN b_only THEN 1 ELSE 0 END) AS nb
      FROM fl
    )
    SELECT CAST(floor(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                 ELSE 255.0 * 1152921504606846976.0 / hk END * na / n)
                AS BIGINT) AS a_minus_b_est,
           CAST(floor(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                 ELSE 255.0 * 1152921504606846976.0 / hk END * nb / n)
                AS BIGINT) AS b_minus_a_est,
           CAST(floor(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                 ELSE 255.0 * 1152921504606846976.0 / hk END)
                AS BIGINT) AS union_est
    FROM agg
    """,
    "funnel leakage from two KMV states: viewers-who-never-purchased "
    "and purchasers-who-never-viewed (kmv_difference — the theta "
    "difference over the union sample) — the browse-to-buy gap "
    "computed from two 256-row states instead of a distinct anti-join "
    "over raw events; floor-scaled integers, replayed bit-for-bit",
)
def q_sketch_kmv_churn_difference(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        kmv_bottom_set,
        kmv_difference,
    )

    ev = load_table(spark, sf_dir, "events")
    a = kmv_bottom_set(
        ev.where(F.col("event_type") == "view"), "user_id", 256
    )
    b = kmv_bottom_set(
        ev.where(F.col("event_type") == "purchase"), "user_id", 256
    )
    return kmv_difference(a, b, 256)


@stage(
    "ts_cascade_count_conservation",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    t1 AS (
      SELECT metric, ts - ts % 300 AS ts, count(value) AS n_in
      FROM t0 GROUP BY 1, 2
    )
    SELECT metric,
           (SELECT count(*) FROM t0 x WHERE x.metric = t1.metric)
             AS tier0_slots,
           sum(n_in) AS tier1_input_slots,
           count(*) AS tier1_slots
    FROM t1 GROUP BY 1
    """,
    "cascade conservation law: every tier-0 slot lands in exactly one "
    "tier-1 bucket, so the per-metric sum of bucket input counts MUST "
    "equal the tier-0 slot count (tier0_slots == tier1_input_slots) — "
    "the mass-balance check a propagation audit runs; integer counts",
)
def q_ts_cascade_count_conservation(spark, sf_dir):
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    t0_counts = t0.groupBy("metric").agg(
        F.count(F.lit(1)).alias("tier0_slots")
    )
    t1 = t0.groupBy(
        "metric", (F.col("ts") - F.col("ts") % 300).alias("ts")
    ).agg(F.count("value").alias("n_in"))
    t1_counts = t1.groupBy("metric").agg(
        F.sum("n_in").alias("tier1_input_slots"),
        F.count(F.lit(1)).alias("tier1_slots"),
    )
    return t0_counts.join(t1_counts, "metric").select(
        "metric", "tier0_slots", "tier1_input_slots", "tier1_slots"
    )


@stage(
    "ts_retention_age_bands",
    f"""
    WITH pts AS ({PTS}), now_t AS (
      SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS now FROM events
    )
    SELECT metric,
           CASE WHEN now - ts < 86400 THEN 'hot_1d'
                WHEN now - ts < 604800 THEN 'warm_7d'
                ELSE 'cold' END AS age_band,
           count(*) AS n_points
    FROM pts, now_t GROUP BY 1, 2
    """,
    "retention pressure report: raw points per metric banded by age "
    "relative to the stream head (1d / 7d / beyond — the tier "
    "boundaries a 60s:1d,300s:7d schema would route to) — the volume "
    "forecast for each archive; integer age arithmetic",
)
def q_ts_retention_age_bands(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = pts.agg(F.max("ts").alias("now"))
    j = pts.crossJoin(F.broadcast(now))
    age = F.col("now") - F.col("ts")
    band = (
        F.when(age < 86400, "hot_1d")
        .when(age < 604800, "warm_7d")
        .otherwise("cold")
    )
    return j.groupBy("metric", band.alias("age_band")).agg(
        F.count(F.lit(1)).alias("n_points")
    )


@stage(
    "q_supplier_line_share",
    """
    WITH s AS (
      SELECT l_suppkey, count(*) AS n_lines FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(n_lines) AS total FROM s)
    SELECT s.l_suppkey, s.n_lines,
           s.n_lines * 1000000 // t.total AS share_ppm,
           row_number() OVER (ORDER BY s.n_lines DESC, s.l_suppkey)
             AS rank
    FROM s, t ORDER BY rank LIMIT 10
    """,
    "supplier concentration: the top-10 suppliers by line volume with "
    "floor-scaled traffic share — the counterparty-risk table; "
    "integer counts, deterministic (volume, key) ranking",
)
def q_q_supplier_line_share(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_lines"))
    t = s.agg(F.sum("n_lines").alias("total"))
    w = Window.orderBy(F.col("n_lines").desc(), F.col("l_suppkey"))
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "l_suppkey", "n_lines",
            F.expr("n_lines * 1000000 DIV total").alias("share_ppm"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= 10)
    )


@stage(
    "text_token_burstiness",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    stats AS (
      SELECT tok, count(*) AS cf, count(DISTINCT doc_id) AS df
      FROM toks WHERE tok <> '' GROUP BY 1
    ),
    top AS (
      SELECT tok, cf, df,
             row_number() OVER (ORDER BY cf DESC, tok) AS rnk
      FROM stats
    )
    SELECT tok, cf, df, cf * 1000000 // df AS burstiness_ppm
    FROM top WHERE rnk <= 50
    """,
    "token burstiness for the top-50 collection-frequency tokens: "
    "cf/df (occurrences per containing doc, floor-scaled ppm) — "
    "separates function words (uniform, ~1 per doc) from bursty "
    "content terms; the statistic BM25-style weighting needs; "
    "integer counts with a (cf, token) tie-break",
)
def q_text_token_burstiness(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    stats = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("tok"))
    return (
        stats.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 50)
        .select(
            "tok", "cf", "df",
            F.expr("cf * 1000000 DIV df").alias("burstiness_ppm"),
        )
    )


@stage(
    "q_events_props_coverage",
    """
    SELECT event_type,
           count(*) AS n_events,
           sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS n_null,
           sum(CASE WHEN props IS NOT NULL
                     AND json_extract_string(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END) AS n_parse_ok
    FROM events GROUP BY 1
    """,
    "semi-structured payload coverage: NULL props vs parseable-with-k "
    "props per event type — the schema-on-read health check before "
    "trusting extracted fields; JSON parsing JVM-side on both engines",
)
def q_q_events_props_coverage(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("props").isNull().cast("long")).alias("n_null"),
        F.sum(
            (F.col("props").isNotNull() & k.isNotNull()).cast("long")
        ).alias("n_parse_ok"),
    )


@stage(
    "q_order_ship_spread",
    """
    WITH o AS (
      SELECT l_orderkey,
             datediff('day', min(l_shipdate), max(l_shipdate)) AS spread_d,
             count(*) AS n_lines
      FROM lineitem GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT CAST(spread_d AS BIGINT) AS spread_days,
           count(*) AS n_orders
    FROM o GROUP BY 1
    """,
    "intra-order shipping spread: days between an order's first and "
    "last line shipment, as a histogram over multi-line orders — the "
    "split-shipment profile; integer day arithmetic",
)
def q_q_order_ship_spread(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        li.groupBy("l_orderkey")
        .agg(
            F.datediff(F.max("l_shipdate"), F.min("l_shipdate")).alias(
                "spread_d"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .where(F.col("n_lines") >= 2)
    )
    return o.groupBy(
        F.col("spread_d").cast("long").alias("spread_days")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


# --------------------------------------------------------------------------
# Batch 2: first-touch mix, WoW volume, price medians, dow value
# matrix, vector extrema, same-day multi-orders.
# --------------------------------------------------------------------------


@stage(
    "q_events_first_touch_mix",
    """
    WITH f AS (
      SELECT user_id, arg_min(event_type, ts) AS first_type
      FROM events GROUP BY 1
    )
    SELECT first_type, count(*) AS n_users FROM f GROUP BY 1
    """,
    "acquisition mix: users grouped by their FIRST event type "
    "(min_by over the raw timestamp) — which door people arrive "
    "through; arg_min/min_by parity between engines",
)
def q_q_events_first_touch_mix(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.expr("min_by(event_type, ts)").alias("first_type")
    )
    return f.groupBy("first_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@stage(
    "ts_week_over_week_volume",
    f"""
    WITH pts AS ({PTS}),
    w AS (
      SELECT metric, CAST(ts // 604800 AS BIGINT) AS week,
             count(*) AS n_points
      FROM pts GROUP BY 1, 2
    )
    SELECT metric, week, n_points,
           CAST(n_points - lag(n_points) OVER (
             PARTITION BY metric ORDER BY week) AS BIGINT) AS wow_delta
    FROM w
    """,
    "week-over-week ingest volume per metric with integer deltas — "
    "the capacity trend the rate-limiter budget follows; epoch-week "
    "bucketing and lag, all integers",
)
def q_ts_week_over_week_volume(spark, sf_dir):
    from pyspark.sql import Window

    pts = _points(spark, sf_dir)
    w = pts.groupBy(
        "metric", (F.col("ts") / 604800).cast("long").alias("week")
    ).agg(F.count(F.lit(1)).alias("n_points"))
    win = Window.partitionBy("metric").orderBy("week")
    return w.select(
        "metric", "week", "n_points",
        (F.col("n_points") - F.lag("n_points").over(win))
        .cast("long")
        .alias("wow_delta"),
    )


@stage(
    "q_part_price_median_by_type",
    """
    SELECT p_type,
           count(*) AS n_parts,
           round(quantile_cont(p_retailprice, 0.5), 6) AS median_price
    FROM part GROUP BY 1
    """,
    "median retail price per part type — exact interpolated median "
    "over the catalog, the pricing-ladder sanity table",
)
def q_q_part_price_median_by_type(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.expr("percentile(p_retailprice, 0.5)"), 6).alias(
            "median_price"
        ),
    )


@stage(
    "q_events_dow_value_matrix",
    """
    SELECT event_type,
           CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7
                AS BIGINT) AS dow,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_value
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    "value flow by type and day-of-week: DECIMAL-accumulated totals "
    "on the Thursday-anchored dow grid — the revenue-cadence matrix "
    "behind staffing and promo timing",
)
def q_q_events_dow_value_matrix(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    dow = (
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long") + 4
    ) % 7
    return ev.groupBy("event_type", dow.alias("dow")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value")
    )


@stage(
    "emb_vector_extrema",
    """
    SELECT vec_id,
           list_min(embedding) AS v_min,
           list_max(embedding) AS v_max,
           CAST(list_position(embedding, list_max(embedding)) - 1
                AS BIGINT) AS argmax_dim
    FROM embeddings
    """,
    "per-vector extrema and the dominant dimension: array min/max "
    "(exact float comparisons) plus the 0-based argmax via first "
    "position — the quick look that spots dead or saturated "
    "dimensions; array builtins on both engines",
)
def q_emb_vector_extrema(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.array_min("embedding").alias("v_min"),
        F.array_max("embedding").alias("v_max"),
        (F.array_position("embedding", F.array_max("embedding")) - 1)
        .cast("long")
        .alias("argmax_dim"),
    )


@stage(
    "q_orders_same_day_multi",
    """
    WITH d AS (
      SELECT o_custkey, o_orderdate, count(*) AS n_same_day
      FROM orders GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT CAST(n_same_day AS BIGINT) AS n_same_day,
           count(*) AS n_customer_days
    FROM d GROUP BY 1
    """,
    "same-day multi-ordering: (customer, day) pairs with 2+ orders, "
    "as a histogram — the fraud/bot screen and the split-cart "
    "indicator; one grouped count with HAVING",
)
def q_q_orders_same_day_multi(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    d = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.count(F.lit(1)).alias("n_same_day"))
        .where(F.col("n_same_day") >= 2)
    )
    return d.groupBy(
        F.col("n_same_day").cast("long").alias("n_same_day")
    ).agg(F.count(F.lit(1)).alias("n_customer_days"))
