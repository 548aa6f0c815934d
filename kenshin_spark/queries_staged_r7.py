"""Third staged bank — oracle-verified now, registered in ROUND 7.

Same mechanism as ``queries_staged`` (round 5) and ``queries_staged_r6``
(round 6): held out of ``queries.QUERIES`` until the driver's 50-slot
never-verified window frees up, gated by the identical Spark-vs-DuckDB
check (``tests/test_queries_staged_r7.py``). This bank is sized by idea
quality, not window arithmetic — the driver backfills unused slots with
verified queries.

Float discipline is the house style (see queries.py header), plus the
round-6 lessons: floor() before any bucketing division (DuckDB CASTs
DOUBLE->BIGINT by rounding, Spark truncates), round scale>2 DECIMALs
before the DOUBLE cast, and the explicit round(x*1e6)/1e6 scale-round
for per-row float outputs near 6dp boundaries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.operators.align import last_write_wins
from kenshin_spark.queries import (
    PTS,
    LWW60,
    QuerySpec,
    _points,
    _sql_query,
)
from kenshin_spark.queries_staged_r6 import LWW3600

STAGED_R7: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R7[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _grid60(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")


def _grid3600(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 3600, arrival_col="arrival")


# ---------------------------------------------------------------------------
# Time-series diagnostics
# ---------------------------------------------------------------------------

MEAN_CROSS_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW3600}),
d AS (
  SELECT metric, ts,
         value - avg(value) OVER (PARTITION BY metric ORDER BY ts
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS diff
  FROM t0
),
s AS (
  SELECT metric, ts, diff,
         lag(diff) OVER (PARTITION BY metric ORDER BY ts) AS prev
  FROM d
)
SELECT metric,
       CAST(count(*) AS BIGINT) AS n_slots,
       CAST(sum(CASE WHEN prev IS NOT NULL AND
                          ((diff >= 0) <> (prev >= 0)) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_crossings
FROM s GROUP BY metric
"""


@stage(
    "ts_mean_crossings",
    MEAN_CROSS_SQL,
    "oscillation diagnostic: how often each series crosses its own "
    "trailing 5-slot mean (mean-reversion vs trending behavior) — the "
    "sign test compares values units away from the mean, ~15 orders of "
    "magnitude above the <=5-addend window-sum noise, so the crossing "
    "count is engine-stable; one window shuffle co-partitioned by metric",
)
def q_ts_mean_crossings(spark, sf_dir):
    from pyspark.sql import Window

    grid = _grid3600(spark, sf_dir)
    w5 = Window.partitionBy("metric").orderBy("ts").rowsBetween(-4, 0)
    w = Window.partitionBy("metric").orderBy("ts")
    d = grid.select(
        "metric", "ts", (F.col("value") - F.avg("value").over(w5)).alias("diff")
    ).select("metric", "ts", "diff", F.lag("diff").over(w).alias("prev"))
    crossed = (
        F.col("prev").isNotNull()
        & ((F.col("diff") >= 0) != (F.col("prev") >= 0))
    )
    return d.groupBy("metric").agg(
        F.count("*").cast("bigint").alias("n_slots"),
        F.sum(F.when(crossed, 1).otherwise(0)).cast("bigint")
        .alias("n_crossings"),
    )


ACF1_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW3600}),
mu AS (
  SELECT metric, round(avg(value), 6) AS m FROM t0 GROUP BY metric
),
c AS (
  SELECT t0.metric, ts, value - m AS x
  FROM t0 JOIN mu ON t0.metric = mu.metric
),
p AS (
  SELECT metric, x,
         lead(x) OVER (PARTITION BY metric ORDER BY ts) AS nx
  FROM c
)
SELECT metric,
       round(sum(CASE WHEN nx IS NOT NULL THEN x * nx ELSE CAST(0 AS DOUBLE)
                 END) / sum(x * x), 4) AS acf1
FROM p GROUP BY metric
"""


@stage(
    "ts_autocorr_lag1",
    ACF1_SQL,
    "lag-1 autocorrelation per series (is the next hour predictable "
    "from this one): the mean is ROUNDED to 6dp before centering (the "
    "ts_trend_slope discipline) so both engines center on identical "
    "operands; the product sums carry ~1e-12 association noise and the "
    "ratio is 4dp-rounded, orders of magnitude above it",
)
def q_ts_autocorr_lag1(spark, sf_dir):
    from pyspark.sql import Window

    grid = _grid3600(spark, sf_dir)
    mu = grid.groupBy("metric").agg(F.round(F.avg("value"), 6).alias("m"))
    c = grid.join(F.broadcast(mu), "metric").select(
        "metric", "ts", (F.col("value") - F.col("m")).alias("x")
    )
    w = Window.partitionBy("metric").orderBy("ts")
    p = c.select("metric", "x", F.lead("x").over(w).alias("nx"))
    return p.groupBy("metric").agg(
        F.round(
            F.sum(
                F.when(F.col("nx").isNotNull(), F.col("x") * F.col("nx"))
                .otherwise(F.lit(0.0))
            )
            / F.sum(F.col("x") * F.col("x")),
            4,
        ).alias("acf1")
    )


DAILY_SPREAD_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW60})
SELECT metric,
       CAST(ts - ts % 86400 AS BIGINT) AS day_ts,
       CAST(count(*) AS BIGINT) AS n_slots,
       min(value) AS day_min,
       max(value) AS day_max,
       max(value) - min(value) AS day_spread
FROM t0 GROUP BY 1, 2
"""


@stage(
    "ts_daily_spread",
    DAILY_SPREAD_SQL,
    "daily min/max envelope per metric (the y-range feed for calendar "
    "heatmaps): integer day alignment + order-free double extremes — "
    "the subtraction of two exact doubles is the only arithmetic",
)
def q_ts_daily_spread(spark, sf_dir):
    grid = _grid60(spark, sf_dir)
    return grid.groupBy(
        "metric",
        (F.col("ts") - F.col("ts") % 86400).cast("bigint").alias("day_ts"),
    ).agg(
        F.count("*").cast("bigint").alias("n_slots"),
        F.min("value").alias("day_min"),
        F.max("value").alias("day_max"),
        (F.max("value") - F.min("value")).alias("day_spread"),
    )


OCCUPANCY_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW60}),
s AS (
  SELECT metric, count(*) AS n_obs,
         (max(ts) - min(ts)) / 60 + 1 AS span_slots
  FROM t0 GROUP BY metric
)
SELECT metric,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST(span_slots AS BIGINT) AS span_slots,
       round(CAST(n_obs AS DOUBLE) / span_slots, 6) AS occupancy
FROM s
"""


@stage(
    "ts_occupancy",
    OCCUPANCY_SQL,
    "grid occupancy per metric: observed 60s slots over the slot span "
    "between first and last point — the sparseness signal that decides "
    "whether a series belongs in the hot tier; ts is pre-aligned so the "
    "span division is exact integer arithmetic",
)
def q_ts_occupancy(spark, sf_dir):
    grid = _grid60(spark, sf_dir)
    s = grid.groupBy("metric").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        ((F.max("ts") - F.min("ts")) / 60 + 1).cast("bigint")
        .alias("span_slots"),
    )
    return s.select(
        "metric",
        "n_obs",
        "span_slots",
        F.round(
            F.col("n_obs").cast("double") / F.col("span_slots"), 6
        ).alias("occupancy"),
    )


STALENESS_SQL = f"""
WITH pts AS ({PTS}),
last AS (
  SELECT metric, max(ts) AS last_ts,
         sum(CASE WHEN ts >= (SELECT max(ts) FROM pts) - 86400
                  THEN 1 ELSE 0 END) AS n_last_day
  FROM pts GROUP BY metric
),
now_t AS (SELECT max(ts) AS now FROM pts)
SELECT metric,
       CAST(last_ts AS BIGINT) AS last_ts,
       CAST(now - last_ts AS BIGINT) AS age_s,
       CAST(n_last_day AS BIGINT) AS n_last_day
FROM last, now_t
"""


@stage(
    "ts_staleness",
    STALENESS_SQL,
    "staleness report per metric: seconds since last arrival relative "
    "to the stream head, plus last-day arrival count — the dead-sensor "
    "dashboard; the scalar 'now' joins as a 1-row broadcast, all "
    "integer arithmetic",
)
def q_ts_staleness(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = pts.agg(F.max("ts").alias("now"))
    # the day-window count needs the scalar head — one pass over points
    joined = pts.crossJoin(F.broadcast(now))
    return (
        joined.groupBy("metric")
        .agg(
            F.max("ts").cast("bigint").alias("last_ts"),
            F.max("now").alias("_now"),
            F.sum(
                F.when(F.col("ts") >= F.col("now") - 86400, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_last_day"),
        )
        .select(
            "metric",
            "last_ts",
            (F.col("_now") - F.col("last_ts")).cast("bigint").alias("age_s"),
            "n_last_day",
        )
    )


TOP_CHANGE_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW3600}),
d AS (
  SELECT metric, ts,
         value - lag(value) OVER (PARTITION BY metric ORDER BY ts) AS delta
  FROM t0
),
rk AS (
  SELECT metric, ts, delta,
         row_number() OVER (PARTITION BY metric
                            ORDER BY abs(delta) DESC, ts) AS rn
  FROM d WHERE delta IS NOT NULL
)
SELECT metric, CAST(ts AS BIGINT) AS ts, delta
FROM rk WHERE rn = 1
"""


@stage(
    "ts_top_changepoint",
    TOP_CHANGE_SQL,
    "largest hour-over-hour jump per metric (level-shift candidate "
    "pointer): |delta| ranked with an explicit (|delta| DESC, ts) "
    "row_number so equal jumps resolve identically in both engines — "
    "exact double comparisons, no arithmetic beyond the lag subtraction",
)
def q_ts_top_changepoint(spark, sf_dir):
    from pyspark.sql import Window

    grid = _grid3600(spark, sf_dir)
    w = Window.partitionBy("metric").orderBy("ts")
    d = grid.select(
        "metric", "ts", (F.col("value") - F.lag("value").over(w)).alias("delta")
    ).where(F.col("delta").isNotNull())
    rk = Window.partitionBy("metric").orderBy(
        F.abs("delta").desc(), F.col("ts")
    )
    return (
        d.withColumn("rn", F.row_number().over(rk))
        .where("rn = 1")
        .select("metric", F.col("ts").cast("bigint").alias("ts"), "delta")
    )


# ---------------------------------------------------------------------------
# Render — the remaining selection/naming functions
# ---------------------------------------------------------------------------


@stage(
    "render_minimum_above",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    floor_t AS (SELECT min(value) AS fleet_floor FROM t0),
    keep AS (
      SELECT metric FROM t0, floor_t
      GROUP BY metric, fleet_floor HAVING min(value) > fleet_floor
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite minimumAbove(series_list, n) with the fleet floor as the "
    "bar: keep every series whose own floor sits above the global "
    "minimum — raw-double comparisons only (no arithmetic), so the "
    "selection is exact at any SF; per-series mins broadcast back",
)
def q_render_minimum_above(spark, sf_dir):
    from kenshin_spark.functions.render import minimum_above

    grid = _grid60(spark, sf_dir)
    fleet_floor = grid.agg(F.min("value")).first()[0]
    return minimum_above(grid, float(fleet_floor))


@stage(
    "render_average_below",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    keep AS (
      SELECT metric FROM t0 GROUP BY metric HAVING avg(value) < 50.0
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite averageBelow(series_list, 50): the inverse selection of "
    "averageAbove — per-series hourly means sit units away from the "
    "bar (noise ~1e-11), so the filter is engine- and partition-stable",
)
def q_render_average_below(spark, sf_dir):
    from kenshin_spark.functions.render import average_below

    return average_below(_grid3600(spark, sf_dir), 50.0)


@stage(
    "render_current_above",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    cur AS (
      SELECT metric, arg_max(value, ts) AS cur
      FROM t0 WHERE value IS NOT NULL GROUP BY metric
    )
    SELECT t0.metric, ts, value
    FROM t0 JOIN cur ON t0.metric = cur.metric
    WHERE cur.cur > 15.0
    """,
    "graphite currentAbove(series_list, 15): selection by the freshest "
    "reading — max_by/arg_max on the (unique per series) hourly slot "
    "key, raw-double threshold, no arithmetic anywhere",
)
def q_render_current_above(spark, sf_dir):
    from kenshin_spark.functions.render import current_above

    return current_above(_grid3600(spark, sf_dir), 15.0)


@stage(
    "render_limit_alias",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    keep AS (
      SELECT DISTINCT metric FROM t0 ORDER BY metric LIMIT 3
    )
    SELECT regexp_replace(t0.metric, '^(click|error)', 'ui.\\1') AS metric,
           ts, value
    FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite aliasSub(limit(series_list, 3), '^(click|error)', "
    "'ui.\\1'): deterministic name-order truncation then regex rename "
    "— backreference syntax differs per engine ($1 Spark, \\1 DuckDB) "
    "but the rewritten names are identical",
)
def q_render_limit_alias(spark, sf_dir):
    from kenshin_spark.functions.render import alias_sub, limit_series

    return alias_sub(
        limit_series(_grid3600(spark, sf_dir), 3), "^(click|error)", "ui.$1"
    )


@stage(
    "render_alias_by_node",
    f"""
    WITH pts0 AS ({PTS}),
    pts AS (
      SELECT 'stream.' || metric || '.rate' AS metric, ts, value, arrival
      FROM pts0
    ),
    t0 AS ({LWW3600})
    SELECT string_split(metric, '.')[2] AS metric, ts, value
    FROM t0
    """,
    "graphite aliasByNode(series, 1): keep one dotted-path segment as "
    "the display name (0-based node index; 1-based array access in "
    "both engines) — dotted paths synthesized the render_group_by_node "
    "way; values untouched",
)
def q_render_alias_by_node(spark, sf_dir):
    from kenshin_spark.functions.render import alias_by_node

    pts = _points(spark, sf_dir).withColumn(
        "metric", F.concat(F.lit("stream."), F.col("metric"), F.lit(".rate"))
    )
    grid = last_write_wins(pts, 3600, arrival_col="arrival")
    return alias_by_node(grid, 1)


# ---------------------------------------------------------------------------
# Event-stream rows (shared SQL, epoch-fn swap)
# ---------------------------------------------------------------------------


def _events_sql(sql: str):
    return _sql_query(
        sql.replace("floor(epoch(ts))", "unix_timestamp(ts)"), ("events",)
    )


HOLDOUT_SQL = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
)
SELECT arm,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conversion
FROM u GROUP BY arm
"""


@stage(
    "q_event_holdout_lift",
    HOLDOUT_SQL,
    "A/B scaffold: users deterministically split into two arms "
    "(user_id parity — the hash-route stand-in), per-arm purchase "
    "conversion from integer-exact counts with one rounded division — "
    "the uplift readout every experiment pipeline ends in",
)
def q_event_holdout_lift(spark, sf_dir):
    return _events_sql(HOLDOUT_SQL)(spark, sf_dir)


SESSION_DEPTH_SQL = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_id
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
),
depth AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       round(quantile_cont(n_events, 0.5), 6) AS p50_depth,
       round(quantile_cont(n_events, 0.9), 6) AS p90_depth,
       round(quantile_cont(n_events, 0.99), 6) AS p99_depth
FROM depth
"""

SESSION_DEPTH_SPARK_SQL = SESSION_DEPTH_SQL.replace(
    "floor(epoch(ts))", "unix_timestamp(ts)"
).replace("quantile_cont(n_events,", "percentile(n_events,")


@stage(
    "q_event_session_depth",
    SESSION_DEPTH_SQL,
    "session-depth percentiles: events per 30-min-gap session at "
    "p50/p90/p99 — Spark `percentile` and DuckDB `quantile_cont` share "
    "R-7 linear interpolation over identical integer depths (the "
    "q_price_percentiles contract)",
)
def q_event_session_depth(spark, sf_dir):
    return _sql_query(SESSION_DEPTH_SPARK_SQL, ("events",))(spark, sf_dir)


STREAK_SQL = """
WITH e AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
runs AS (
  SELECT user_id, rn,
         rn - row_number() OVER (PARTITION BY user_id
                                 ORDER BY rn) AS grp
  FROM e WHERE event_type = 'error'
),
streaks AS (
  SELECT user_id, count(*) AS streak_len
  FROM runs GROUP BY user_id, grp
),
per_user AS (
  SELECT user_id, max(streak_len) AS max_streak FROM streaks
  GROUP BY user_id
)
SELECT CAST(max_streak AS BIGINT) AS max_streak,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY max_streak
"""


@stage(
    "q_event_error_streaks",
    STREAK_SQL,
    "error-burst histogram: each user's longest run of consecutive "
    "error events (gaps-and-islands on the (ts, event_id)-ordered "
    "stream), bucketed by streak length — pure integer window "
    "arithmetic, the incident-detection shape",
)
def q_event_error_streaks(spark, sf_dir):
    return _sql_query(
        STREAK_SQL, ("events",)
    )(spark, sf_dir)


# ---------------------------------------------------------------------------
# Warehouse rows
# ---------------------------------------------------------------------------

VALUE_BANDS_SQL = """
SELECT c_mktsegment,
       CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 100000 THEN 'a_under_100k'
            WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 250000 THEN 'b_100_250k'
            WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 400000 THEN 'c_250_400k'
            ELSE 'd_over_400k' END AS value_band,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


@stage(
    "q_order_value_bands",
    VALUE_BANDS_SQL,
    "order-value bands by market segment: DECIMAL band edges (no float "
    "compare can straddle a boundary) over the broadcast customer "
    "dimension, DECIMAL-exact revenue per cell",
)
def q_order_value_bands(spark, sf_dir):
    return _sql_query(VALUE_BANDS_SQL, ("orders", "customer"))(spark, sf_dir)


NEW_CUSTOMERS_SQL = """
WITH first_order AS (
  SELECT o_custkey,
         min(CAST(year(o_orderdate) AS BIGINT) * 100
             + CAST(month(o_orderdate) AS BIGINT)) AS first_month
  FROM orders GROUP BY o_custkey
),
m AS (
  SELECT first_month, count(*) AS n_new FROM first_order GROUP BY 1
)
SELECT first_month,
       CAST(n_new AS BIGINT) AS n_new_customers,
       CAST(sum(n_new) OVER (ORDER BY first_month) AS BIGINT)
         AS cumulative_customers
FROM m
"""


@stage(
    "q_cumulative_new_customers",
    NEW_CUSTOMERS_SQL,
    "customer-acquisition curve: first-order month per customer "
    "(yyyymm integer key), new customers per month, and the running "
    "total — integer-only, the window runs over the month-level "
    "aggregate",
)
def q_cumulative_new_customers(spark, sf_dir):
    return _sql_query(NEW_CUSTOMERS_SQL, ("orders",))(spark, sf_dir)


REPEAT_RATE_SQL = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
),
joined AS (
  SELECT n_nationkey, n_name, n_orders
  FROM per_cust
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_buyers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS repeat_rate
FROM joined GROUP BY n_name
"""


@stage(
    "q_repeat_customer_rate",
    REPEAT_RATE_SQL,
    "repeat-purchase rate per nation: buyers with >= 2 orders over all "
    "buyers — per-customer counts shuffle once, dimensions broadcast, "
    "one rounded division per nation",
)
def q_repeat_customer_rate(spark, sf_dir):
    return _sql_query(REPEAT_RATE_SQL, ("orders", "customer", "nation"))(
        spark, sf_dir
    )


ORDER_DOW_SQL = """
WITH o AS (
  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
SELECT (CAST(floor(ts / 86400) AS BIGINT) + 4) % 7 AS dow,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(price) AS DOUBLE), 2) AS revenue
FROM o GROUP BY 1
"""


@stage(
    "q_order_dow_profile",
    ORDER_DOW_SQL,
    "order placement by day of week: epoch-arithmetic dow ((d+4)%7, "
    "Thursday-anchored — the engines' dayofweek() conventions differ) "
    "with DECIMAL-exact revenue — the weekly staffing/capacity profile",
)
def q_order_dow_profile(spark, sf_dir):
    return _sql_query(
        ORDER_DOW_SQL.replace("floor(epoch(o_orderdate))",
                              "unix_timestamp(o_orderdate)"),
        ("orders",),
    )(spark, sf_dir)


PART_TOKENS_SQL = """
WITH t AS (
  SELECT unnest(string_split(p_name, ' ')) AS tok,
         CAST(p_retailprice AS DECIMAL(18,2)) AS price
  FROM part
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(price) AS DOUBLE) / count(*), 6) AS avg_price
FROM t GROUP BY tok
"""

PART_TOKENS_SPARK_SQL = """
WITH t AS (
  SELECT explode(split(p_name, ' ')) AS tok,
         CAST(p_retailprice AS DECIMAL(18,2)) AS price
  FROM part
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(price) AS DOUBLE) / count(*), 6) AS avg_price
FROM t GROUP BY tok
"""


@stage(
    "q_part_name_tokens",
    PART_TOKENS_SQL,
    "part-name vocabulary: adjective/noun tokens of p_name with counts "
    "and DECIMAL-exact mean retail price — the catalog-taxonomy "
    "profile (are 'large' parts really pricier)",
)
def q_part_name_tokens(spark, sf_dir):
    return _sql_query(PART_TOKENS_SPARK_SQL, ("part",))(spark, sf_dir)


# ---------------------------------------------------------------------------
# Text + embedding rows
# ---------------------------------------------------------------------------

TOKEN_POS_SQL = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT unnest(t) AS tok,
         unnest(range(1, len(t) + 1)) AS p,
         len(t) AS n
  FROM toks WHERE len(t) >= 2
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       round(CAST(sum(p - 1) AS DOUBLE) / sum(n - 1), 6) AS mean_rel_pos
FROM pos GROUP BY tok HAVING count(*) >= 20
"""

TOKEN_POS_SPARK_SQL = r"""
WITH toks AS (
  SELECT filter(split(trim(lower(text)), '\\s+'), x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT posexplode(t) AS (p0, tok), size(t) AS n
  FROM toks WHERE size(t) >= 2
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       round(CAST(sum(p0) AS DOUBLE) / sum(n - 1), 6) AS mean_rel_pos
FROM pos GROUP BY tok HAVING count(*) >= 20
"""


@stage(
    "text_token_position_profile",
    TOKEN_POS_SQL,
    "positional bias per frequent token (support >= 20): mean relative "
    "position inside its documents (0 = always opens, 1 = always "
    "closes) — boilerplate headers/footers show up as extreme values; "
    "the ratio divides exact integer sums once (Spark posexplode is "
    "0-based, DuckDB's zipped range is shifted to match)",
)
def q_text_token_position_profile(spark, sf_dir):
    return _sql_query(TOKEN_POS_SPARK_SQL, ("documents",))(spark, sf_dir)


ZIPF_SQL = r"""
WITH tf AS (
  SELECT tok, count(*) AS f FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
  GROUP BY tok
),
rk AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
  FROM tf
),
top AS (
  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
  FROM rk WHERE r <= 100
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM top
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope
FROM s
"""

ZIPF_SPARK_SQL = r"""
WITH tf AS (
  SELECT tok, count(*) AS f FROM (
    SELECT explode(split(trim(lower(text)), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
  GROUP BY tok
),
rk AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
  FROM tf
),
top AS (
  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
  FROM rk WHERE r <= 100
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM top
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope
FROM s
"""


@stage(
    "text_zipf_slope",
    ZIPF_SQL,
    "Zipf's-law fit: least-squares slope of log-frequency vs log-rank "
    "over the top-100 vocabulary (healthy natural text sits near -1; "
    "templated corpora flatten) — ranks are (freq DESC, token)-total-"
    "ordered, the 100-term log sums carry ~1e-14 noise against a "
    "4dp-rounded slope",
)
def q_text_zipf_slope(spark, sf_dir):
    return _sql_query(ZIPF_SPARK_SQL, ("documents",))(spark, sf_dir)


DIM_VARIANCE_SQL = """
WITH d AS (
  SELECT unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
),
s AS (
  SELECT dim,
         sum(CAST(v AS DOUBLE)) AS s1,
         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM d GROUP BY dim
),
rk AS (
  SELECT CAST(dim - 1 AS BIGINT) AS dim,
         round((s2 - s1 * s1 / n) / n, 6) AS variance,
         row_number() OVER (
           ORDER BY (s2 - s1 * s1 / n) / n DESC, dim
         ) AS rn
  FROM s
)
SELECT dim, variance, CAST(rn AS BIGINT) AS rank
FROM rk WHERE rn <= 5
"""


@stage(
    "emb_dim_variance_topk",
    DIM_VARIANCE_SQL,
    "highest-variance embedding dimensions (top-5): per-dim population "
    "variance via the two-sum formula over zipped unnest/posexplode — "
    "the dims PCA would keep, and the first check before per-dim "
    "quantizer budgets; sampling spread between iid dims (~percent "
    "scale) dwarfs the ~1e-13 association noise, so the rank is stable",
)
def q_emb_dim_variance_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("dim0", "v"))
    s = d.groupBy("dim0").agg(
        F.sum(F.col("v").cast("double")).alias("s1"),
        F.sum(F.col("v").cast("double") * F.col("v").cast("double"))
        .alias("s2"),
        F.count("*").cast("double").alias("n"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    from pyspark.sql import Window

    rk = Window.orderBy(var.desc(), F.col("dim0"))
    return (
        s.select(
            F.col("dim0").cast("bigint").alias("dim"),
            F.round(var, 6).alias("variance"),
            F.row_number().over(rk).cast("bigint").alias("rank"),
        )
        .where(F.col("rank") <= 5)
    )


# ---------------------------------------------------------------------------
# Batch 4: interaction matrices, audits, growth curves
# ---------------------------------------------------------------------------

BASKET_VALUE_SQL = """
WITH width AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 100000
              THEN 'a_under_100k'
            WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 250000
              THEN 'b_100_250k'
            ELSE 'c_over_250k' END AS value_band,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN width ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


@stage(
    "q_basket_value_matrix",
    BASKET_VALUE_SQL,
    "basket width x order value interaction: line count joined back "
    "onto the order header, bucketed by DECIMAL value bands — do wide "
    "baskets drive big orders, the 7x3 matrix from two integer "
    "aggregates",
)
def q_basket_value_matrix(spark, sf_dir):
    return _sql_query(BASKET_VALUE_SQL, ("orders", "lineitem"))(spark, sf_dir)


NATION_TYPE_SQL = """
WITH rev AS (
  SELECT c_nationkey, p_type,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
rk AS (
  SELECT c_nationkey, p_type, rev,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY rev DESC, p_type) AS rn
  FROM rev
)
SELECT n_name, p_type, CAST(round(rev, 2) AS DOUBLE) AS revenue,
       CAST(rn AS BIGINT) AS rank
FROM rk JOIN nation ON c_nationkey = n_nationkey
WHERE rn <= 2
"""


@stage(
    "q_nation_type_affinity",
    NATION_TYPE_SQL,
    "demand affinity: each nation's top-2 part types by customer "
    "revenue — DECIMAL-exact ordering with a type-name tiebreak, the "
    "window over the (nation, type) aggregate; all dimensions broadcast",
)
def q_nation_type_affinity(spark, sf_dir):
    return _sql_query(
        NATION_TYPE_SQL, ("lineitem", "orders", "customer", "part", "nation")
    )(spark, sf_dir)


SUPPLIER_MONTHS_SQL = """
SELECT l_suppkey AS suppkey,
       CAST(count(DISTINCT CAST(year(l_shipdate) AS BIGINT) * 100
                  + CAST(month(l_shipdate) AS BIGINT)) AS BIGINT)
         AS active_months,
       CAST(min(CAST(year(l_shipdate) AS BIGINT) * 100
                + CAST(month(l_shipdate) AS BIGINT)) AS BIGINT)
         AS first_month,
       CAST(max(CAST(year(l_shipdate) AS BIGINT) * 100
                + CAST(month(l_shipdate) AS BIGINT)) AS BIGINT)
         AS last_month
FROM lineitem GROUP BY l_suppkey
"""


@stage(
    "q_supplier_active_months",
    SUPPLIER_MONTHS_SQL,
    "supplier activity span: distinct shipping months (yyyymm integer "
    "keys) with first/last — the churn/tenure profile; one distinct "
    "aggregate keyed by supplier",
)
def q_supplier_active_months(spark, sf_dir):
    return _sql_query(SUPPLIER_MONTHS_SQL, ("lineitem",))(spark, sf_dir)


JITTER_SQL = f"""
WITH pts AS ({PTS})
SELECT metric,
       CAST(ts % 60 AS BIGINT) AS slot_offset_s,
       CAST(count(*) AS BIGINT) AS n_points
FROM pts GROUP BY 1, 2 HAVING count(*) >= 2
"""


@stage(
    "ts_ingest_jitter",
    JITTER_SQL,
    "arrival-jitter profile: raw timestamp offsets inside their 60s "
    "slot (scrape-aligned sources spike at one offset; organic streams "
    "spread flat) — pure integer modulus, support >= 2 trims the "
    "singleton tail",
)
def q_ts_ingest_jitter(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return (
        pts.groupBy(
            "metric", (F.col("ts") % 60).cast("bigint").alias("slot_offset_s")
        )
        .agg(F.count("*").cast("bigint").alias("n_points"))
        .where(F.col("n_points") >= 2)
    )


WEEKEND_SQL = f"""
WITH pts AS ({PTS}),
c AS (
  SELECT metric,
         CASE WHEN (CAST(floor(ts / 86400) AS BIGINT) + 4) % 7 IN (0, 6)
              THEN 'weekend' ELSE 'weekday' END AS day_class,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM pts
)
SELECT metric, day_class,
       CAST(count(*) AS BIGINT) AS n_points,
       round(CAST(sum(cents) AS DOUBLE) / count(*) / 100, 6) AS mean_value
FROM c GROUP BY 1, 2
"""


@stage(
    "ts_weekend_weekday_profile",
    WEEKEND_SQL,
    "weekend vs weekday level per metric: epoch-arithmetic day classes "
    "(Sunday=0/Saturday=6 under the Thursday anchor) with means over "
    "integer-cent snapped values — order-exact sums, one rounded "
    "division; the capacity-planning split",
)
def q_ts_weekend_weekday_profile(spark, sf_dir):
    pts = _points(spark, sf_dir)
    dow = (F.floor(F.col("ts") / 86400).cast("bigint") + 4) % 7
    day_class = F.when(dow.isin(0, 6), "weekend").otherwise("weekday")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        pts.select("metric", day_class.alias("day_class"),
                   cents.alias("cents"))
        .groupBy("metric", "day_class")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.round(
                F.sum("cents").cast("double") / F.count("*") / 100, 6
            ).alias("mean_value"),
        )
    )


BREADTH_EVENTS_SQL = """
WITH u AS (
  SELECT user_id, count(DISTINCT event_type) AS n_types
  FROM events GROUP BY user_id
)
SELECT CAST(n_types AS BIGINT) AS n_types,
       CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY n_types
"""


@stage(
    "q_event_type_breadth",
    BREADTH_EVENTS_SQL,
    "engagement breadth histogram: distinct event types touched per "
    "user (1 = single-feature users, 5 = full-surface users) — two "
    "integer aggregates, the second over a 5-value domain",
)
def q_event_type_breadth(spark, sf_dir):
    return _sql_query(BREADTH_EVENTS_SQL, ("events",))(spark, sf_dir)


HEAPS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
firsts AS (
  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok
),
bounds AS (
  SELECT max(doc_id) AS max_id FROM documents
),
buckets AS (
  SELECT CAST(least(floor(CAST(first_doc AS DOUBLE) * 10 / (max_id + 1)),
                    9) AS BIGINT) AS decile,
         count(*) AS new_types
  FROM firsts, bounds GROUP BY 1
)
SELECT decile,
       CAST(new_types AS BIGINT) AS new_types,
       CAST(sum(new_types) OVER (ORDER BY decile) AS BIGINT)
         AS cumulative_vocab
FROM buckets
"""

HEAPS_SPARK_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         explode(filter(split(trim(lower(text)), '\\s+'),
                        x -> x <> '')) AS tok
  FROM documents
),
firsts AS (
  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok
),
bounds AS (
  SELECT max(doc_id) AS max_id FROM documents
),
buckets AS (
  SELECT CAST(least(floor(CAST(first_doc AS DOUBLE) * 10 / (max_id + 1)),
                    9) AS BIGINT) AS decile,
         count(*) AS new_types
  FROM firsts, bounds GROUP BY 1
)
SELECT decile,
       CAST(new_types AS BIGINT) AS new_types,
       CAST(sum(new_types) OVER (ORDER BY decile) AS BIGINT)
         AS cumulative_vocab
FROM buckets
"""


@stage(
    "text_heaps_curve",
    HEAPS_SQL,
    "Heaps'-law vocabulary growth: new word types per doc-id decile "
    "and the cumulative vocabulary — the is-the-new-crawl-adding-"
    "anything curve (companion to text_zipf_slope and "
    "text_ngram_novelty); first-occurrence reduction is one "
    "token-keyed min, the decile edge is floor()ed before the cast "
    "(the DuckDB rounding-cast trap)",
)
def q_text_heaps_curve(spark, sf_dir):
    return _sql_query(HEAPS_SPARK_SQL, ("documents",))(spark, sf_dir)


EMB_DIST_HIST_SQL = """
WITH a AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 37 = 0
),
b AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 41 = 0
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) *
                  CAST(b.embedding[i] AS DOUBLE)))
           / sqrt(list_sum(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           / sqrt(list_sum(list_transform(b.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS cos
  FROM a JOIN b ON a.vec_id < b.vec_id
)
SELECT CAST(floor(cos * 10) AS BIGINT) AS cos_band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
"""


@stage(
    "emb_distance_histogram",
    EMB_DIST_HIST_SQL,
    "pairwise-similarity distribution audit: cosine over a "
    "deterministic double-modulus sample (|corpus|/37 x |corpus|/41 "
    "pairs — bounded, never all-pairs), 6dp-rounded BEFORE the "
    "10-bucket banding so no band edge rides on fp noise — the "
    "separation histogram that predicts LSH threshold quality",
)
def q_emb_distance_histogram(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where("vec_id % 37 = 0").select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = emb.where("vec_id % 41 = 0").select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    dot = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    na = F.expr(
        "sqrt(aggregate(ea, CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    nb = F.expr(
        "sqrt(aggregate(eb, CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(F.round(dot / na / nb, 6).alias("cos"))
    )
    return (
        pairs.select(
            F.floor(F.col("cos") * 10).cast("bigint").alias("cos_band")
        )
        .groupBy("cos_band")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


LENGTH_CUT_SQL = """
WITH cuts AS (
  SELECT 50 AS min_chars UNION ALL SELECT 100 UNION ALL
  SELECT 200 UNION ALL SELECT 400
)
SELECT CAST(min_chars AS BIGINT) AS min_chars,
       CAST(sum(CASE WHEN n_chars >= min_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS surviving_docs,
       CAST(sum(CASE WHEN n_chars >= min_chars THEN n_chars ELSE 0 END)
            AS BIGINT) AS surviving_chars,
       round(CAST(sum(CASE WHEN n_chars >= min_chars THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS doc_survival_rate
FROM documents, cuts
GROUP BY min_chars
"""


@stage(
    "pipeline_length_cut_impact",
    LENGTH_CUT_SQL,
    "what-if audit for the minimum-length filter: surviving docs/chars "
    "and survival rate at four candidate cuts in one pass (the corpus "
    "crosses a 4-row literal cut table — broadcast, never the reverse) "
    "— how the cleaning stage picks its threshold",
)
def q_pipeline_length_cut_impact(spark, sf_dir):
    return _sql_query(LENGTH_CUT_SQL, ("documents",))(spark, sf_dir)


# ---------------------------------------------------------------------------
# Batch 5: engine-tuning audits
# ---------------------------------------------------------------------------

XFF_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW60}),
hourly AS (
  SELECT metric, ts - ts % 3600 AS hour_ts, count(value) AS known
  FROM t0 GROUP BY 1, 2
),
cuts AS (
  SELECT 0 AS xff_pct UNION ALL SELECT 20 UNION ALL SELECT 50
)
SELECT metric, CAST(xff_pct AS BIGINT) AS xff_pct,
       CAST(count(*) AS BIGINT) AS total_windows,
       CAST(sum(CASE WHEN known > 0 AND known * 100 >= 60 * xff_pct
                THEN 1 ELSE 0 END) AS BIGINT) AS kept_windows
FROM hourly, cuts
GROUP BY 1, 2
"""


@stage(
    "ts_xff_sensitivity",
    XFF_SQL,
    "xFilesFactor what-if: hourly downsample windows surviving the "
    "W8 known-fraction gate at xff 0/20/50%, per metric in one pass — "
    "known*100 >= 60*xff is the cross-multiplied integer form of "
    "known/60 >= xff, so no float ratio decides a keep; the retention-"
    "policy tuning table for sparse series",
)
def q_ts_xff_sensitivity(spark, sf_dir):
    grid = _grid60(spark, sf_dir)
    hourly = grid.groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("hour_ts")
    ).agg(F.count("value").alias("known"))
    cuts = grid.sparkSession.createDataFrame(
        [(0,), (20,), (50,)], "xff_pct INT"
    )
    kept = F.when(
        (F.col("known") > 0)
        & (F.col("known") * 100 >= 60 * F.col("xff_pct")),
        1,
    ).otherwise(0)
    return (
        hourly.crossJoin(F.broadcast(cuts))
        .groupBy("metric", F.col("xff_pct").cast("bigint").alias("xff_pct"))
        .agg(
            F.count("*").cast("bigint").alias("total_windows"),
            F.sum(kept).cast("bigint").alias("kept_windows"),
        )
    )


ARCHIVE_EST_SQL = f"""
WITH pts AS ({PTS}),
steps AS (
  SELECT 60 AS step UNION ALL SELECT 300 UNION ALL SELECT 3600
)
SELECT metric, CAST(step AS BIGINT) AS step,
       CAST(count(DISTINCT ts - ts % step) AS BIGINT) AS n_slots
FROM pts, steps
GROUP BY 1, 2
"""


@stage(
    "ts_archive_estimate",
    ARCHIVE_EST_SQL,
    "archive sizing estimate: occupied slots per metric at each "
    "configured tier resolution (60s/300s/3600s — the TS_SCHEMA "
    "cascade) from one pass over raw points — the capacity-planning "
    "input for retention policy; integer alignment + distinct counts",
)
def q_ts_archive_estimate(spark, sf_dir):
    pts = _points(spark, sf_dir)
    steps = pts.sparkSession.createDataFrame(
        [(60,), (300,), (3600,)], "step INT"
    )
    return (
        pts.crossJoin(F.broadcast(steps))
        .groupBy("metric", F.col("step").cast("bigint").alias("step"))
        .agg(
            F.countDistinct(
                F.col("ts") - F.col("ts") % F.col("step")
            ).cast("bigint").alias("n_slots")
        )
    )


STOP_LIST = ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it')

STOPWORD_COVERAGE_SQL = r"""
WITH toks AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tok IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stopwords,
       round(CAST(sum(CASE WHEN tok IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it') THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS stopword_rate
FROM toks GROUP BY lang
"""

STOPWORD_COVERAGE_SPARK_SQL = r"""
WITH toks AS (
  SELECT lang,
         explode(filter(split(trim(lower(text)), '\\s+'),
                        x -> x <> '')) AS tok
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tok IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stopwords,
       round(CAST(sum(CASE WHEN tok IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it') THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS stopword_rate
FROM toks GROUP BY lang
"""


@stage(
    "text_stopword_coverage",
    STOPWORD_COVERAGE_SQL,
    "stopword coverage per language: share of tokens in the language-"
    "ID marker list (functions.text.STOPWORDS materialized as SQL "
    "literals — the same words the lang-ID heuristic scores), the "
    "audit that explains lang-ID confidence per language; integer "
    "counts, one rounded division",
)
def q_text_stopword_coverage(spark, sf_dir):
    return _sql_query(STOPWORD_COVERAGE_SPARK_SQL, ("documents",))(
        spark, sf_dir
    )


# ---------------------------------------------------------------------------
# Batch 6: templated openings, order composition, matrix coverage
# ---------------------------------------------------------------------------

PREFIX_DUP_SQL = """
WITH p AS (
  SELECT doc_id, source,
         md5(array_to_string(string_split(trim(lower(text)), ' ')[1:8],
                             ' ')) AS prefix_h
  FROM documents
)
SELECT prefix_h,
       CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM p GROUP BY prefix_h HAVING count(*) > 1
"""

PREFIX_DUP_SPARK_SQL = """
WITH p AS (
  SELECT doc_id, source,
         md5(array_join(slice(split(trim(lower(text)), ' '), 1, 8), ' '))
           AS prefix_h
  FROM documents
)
SELECT prefix_h,
       CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM p GROUP BY prefix_h HAVING count(*) > 1
"""


@stage(
    "dedup_prefix_groups",
    PREFIX_DUP_SQL,
    "templated-opening detector: docs sharing their first 8 tokens "
    "(md5 of the joined prefix — only 16-byte keys shuffle), with "
    "source spread per group — catches boilerplate headers that "
    "full-document and windowed dedup both under-weight; the corpus "
    "has no exact duplicates but ~2 dozen shared openings",
)
def q_dedup_prefix_groups(spark, sf_dir):
    return _sql_query(PREFIX_DUP_SPARK_SQL, ("documents",))(spark, sf_dir)


LINENUMBER_SQL = """
SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*),
             6) AS avg_qty
FROM lineitem GROUP BY l_linenumber
"""


@stage(
    "q_order_linenumber_decay",
    LINENUMBER_SQL,
    "order-composition profile by line position (1..7): do later lines "
    "carry smaller quantities/prices — DECIMAL/BIGINT-exact sums, two "
    "rounded divisions over a 7-row domain",
)
def q_order_linenumber_decay(spark, sf_dir):
    return _sql_query(LINENUMBER_SQL, ("lineitem",))(spark, sf_dir)


COVERAGE_SQL = """
WITH cells AS (
  SELECT DISTINCT p_brand, p_size FROM part
),
dims AS (
  SELECT count(DISTINCT p_brand) AS n_brands,
         count(DISTINCT p_size) AS n_sizes
  FROM part
)
SELECT CAST(n_brands AS BIGINT) AS n_brands,
       CAST(n_sizes AS BIGINT) AS n_sizes,
       CAST((SELECT count(*) FROM cells) AS BIGINT) AS observed_cells,
       round(CAST((SELECT count(*) FROM cells) AS DOUBLE)
             / (n_brands * n_sizes), 6) AS coverage
FROM dims
"""


@stage(
    "q_part_brand_size_coverage",
    COVERAGE_SQL,
    "catalog matrix coverage: observed (brand, size) cells against the "
    "full cross-domain — sparse coverage warns that brand x size "
    "drill-downs will hit empty cells; two tiny distinct aggregates "
    "and one scalar division",
)
def q_part_brand_size_coverage(spark, sf_dir):
    return _sql_query(COVERAGE_SQL, ("part",))(spark, sf_dir)


# ---------------------------------------------------------------------------
# Batch 7: LWW pressure, whale curve, order cadence, dedup threshold sweep
# ---------------------------------------------------------------------------

LWW_PRESSURE_SQL = f"""
WITH pts AS ({PTS}),
s AS (
  SELECT metric, count(*) AS n_points,
         count(DISTINCT ts - ts % 60) AS n_slots
  FROM pts GROUP BY metric
)
SELECT metric,
       CAST(n_points AS BIGINT) AS n_points,
       CAST(n_slots AS BIGINT) AS n_slots,
       CAST(n_points - n_slots AS BIGINT) AS n_overwritten,
       round(CAST(n_points - n_slots AS DOUBLE) / n_points, 6)
         AS overwrite_rate
FROM s
"""


@stage(
    "ts_lww_overwrite_pressure",
    LWW_PRESSURE_SQL,
    "last-write-wins overwrite pressure: raw arrivals minus distinct "
    "60s slots per metric — how much data the W5 align step drops, the "
    "signal for narrowing a hot series' tier-0 step; integer counts, "
    "one rounded division",
)
def q_ts_lww_overwrite_pressure(spark, sf_dir):
    pts = _points(spark, sf_dir)
    s = pts.groupBy("metric").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.countDistinct(F.col("ts") - F.col("ts") % 60)
        .cast("bigint")
        .alias("n_slots"),
    )
    return s.select(
        "metric",
        "n_points",
        "n_slots",
        (F.col("n_points") - F.col("n_slots")).cast("bigint")
        .alias("n_overwritten"),
        F.round(
            (F.col("n_points") - F.col("n_slots")).cast("double")
            / F.col("n_points"),
            6,
        ).alias("overwrite_rate"),
    )


WHALE_SQL = """
WITH u AS (
  SELECT user_id,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id
),
d AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents DESC, user_id) AS dec
  FROM u
),
tot AS (SELECT sum(cents) AS total FROM u)
SELECT CAST(dec AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS decile_value,
       round(CAST(sum(cents) AS DOUBLE) / total, 6) AS value_share
FROM d, tot GROUP BY dec, total
"""


@stage(
    "q_event_whale_curve",
    WHALE_SQL,
    "whale curve: users ranked into value deciles by integer-cent "
    "totals (exact ordering — no float sum can flip a decile edge), "
    "each decile's share of total value — the concentration readout "
    "behind rate limits and capacity planning",
)
def q_event_whale_curve(spark, sf_dir):
    return _sql_query(WHALE_SQL, ("events",))(spark, sf_dir)


ORDER_GAP_BANDS_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate)) / 86400 AS BIGINT) AS day,
         o_orderkey
  FROM orders
),
g AS (
  SELECT day - lag(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap_days
  FROM o
)
SELECT CASE WHEN gap_days < 30 THEN 'a_under_30d'
            WHEN gap_days < 90 THEN 'b_30_90d'
            WHEN gap_days < 365 THEN 'c_90_365d'
            ELSE 'd_over_1y' END AS band,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM g WHERE gap_days IS NOT NULL
GROUP BY 1
"""


@stage(
    "q_order_gap_bands",
    ORDER_GAP_BANDS_SQL,
    "reorder-cadence distribution: day gaps between a customer's "
    "consecutive orders in integer bands (the histogram companion to "
    "q_median_order_gap's medians) — epoch-day subtraction with a "
    "(day, orderkey) deterministic order, integer band edges",
)
def q_order_gap_bands(spark, sf_dir):
    return _sql_query(
        ORDER_GAP_BANDS_SQL.replace("floor(epoch(o_orderdate))",
                                    "unix_timestamp(o_orderdate)"),
        ("orders",),
    )(spark, sf_dir)


_SWEEP_SHINGLES = r"""
    SELECT DISTINCT doc_id, shingle FROM (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(toks) - 2),
               i -> array_to_string(toks[i : i + 2], ' ')
             )) AS shingle
      FROM (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents
      )
    )
"""

JACCARD_SWEEP_SQL = f"""
WITH sh AS ({_SWEEP_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sims AS (
  SELECT round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6) AS j
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
),
cuts AS (
  SELECT 0.2 AS t UNION ALL SELECT 0.4 UNION ALL
  SELECT 0.6 UNION ALL SELECT 0.8
)
SELECT CAST(round(t * 100) AS BIGINT) AS threshold_pct,
       CAST(sum(CASE WHEN j >= t THEN 1 ELSE 0 END) AS BIGINT)
         AS surviving_pairs
FROM sims, cuts GROUP BY 1
"""


@stage(
    "pipeline_jaccard_sweep",
    JACCARD_SWEEP_SQL,
    "dedup-threshold what-if: candidate pairs surviving the n-gram "
    "Jaccard cut at 0.2/0.4/0.6/0.8 in one pass over the oracled "
    "dedup_ngram_jaccard pair machinery — 6dp-rounded similarities "
    "against exact-decimal cuts, the tuning table behind the "
    "production threshold choice; the inverted-index join stays "
    "bounded by shared-shingle frequency, never all-pairs",
)
def q_pipeline_jaccard_sweep(spark, sf_dir):
    from kenshin_spark.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.0
    )
    cuts = pairs.sparkSession.createDataFrame(
        [(0.2,), (0.4,), (0.6,), (0.8,)], "t DOUBLE"
    )
    return (
        pairs.crossJoin(F.broadcast(cuts))
        .groupBy(
            F.round(F.col("t") * 100).cast("bigint").alias("threshold_pct")
        )
        .agg(
            F.sum(F.when(F.col("jaccard") >= F.col("t"), 1).otherwise(0))
            .cast("bigint")
            .alias("surviving_pairs")
        )
    )


# ---------------------------------------------------------------------------
# Batch 8: aggregation divergence, brevity law, filter-bias audit
# ---------------------------------------------------------------------------

LAST_PEAK_SQL = f"""
WITH pts AS ({PTS}), t0 AS ({LWW60}),
w AS (
  SELECT metric, ts - ts % 3600 AS hour_ts,
         max(value) AS peak, arg_max(value, ts) AS last_v
  FROM t0 GROUP BY 1, 2
)
SELECT metric,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN last_v <> peak THEN 1 ELSE 0 END) AS BIGINT)
         AS n_peak_hidden,
       round(CAST(sum(CASE WHEN last_v <> peak THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS divergence_rate
FROM w GROUP BY metric
"""


@stage(
    "ts_agg_divergence",
    LAST_PEAK_SQL,
    "aggregation-method sensitivity: per metric, the share of hourly "
    "windows where 'last' aggregation would hide the window peak "
    "(last != max over the tier-0 slots) — the schema-choice audit "
    "between A2/A3 methods; exact raw-double equality, integer counts",
)
def q_ts_agg_divergence(spark, sf_dir):
    grid = _grid60(spark, sf_dir)
    w = grid.groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("hour_ts")
    ).agg(
        F.max("value").alias("peak"),
        F.max_by("value", "ts").alias("last_v"),
    )
    hidden = F.when(F.col("last_v") != F.col("peak"), 1).otherwise(0)
    return w.groupBy("metric").agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum(hidden).cast("bigint").alias("n_peak_hidden"),
        F.round(F.sum(hidden).cast("double") / F.count("*"), 6)
        .alias("divergence_rate"),
    )


BREVITY_SQL = r"""
WITH tf AS (
  SELECT tok, count(*) AS f FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
  GROUP BY tok
),
xy AS (
  SELECT CAST(length(tok) AS DOUBLE) AS x, ln(CAST(f AS DOUBLE)) AS y
  FROM tf
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS vocab_size,
       round((n * sxy - sx * sy) /
             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
         AS len_freq_corr
FROM s
"""

BREVITY_SPARK_SQL = BREVITY_SQL.replace(
    "unnest(string_split_regex(trim(lower(text)), '\\s+'))",
    "explode(split(trim(lower(text)), '\\\\s+'))",
)


@stage(
    "text_brevity_law",
    BREVITY_SQL,
    "Zipf's law of abbreviation: correlation between token length and "
    "log frequency over the vocabulary (natural language trends "
    "negative — frequent words are short) — closed-form Pearson from "
    "six aggregate sums, 4dp-rounded against ~1e-13 association noise; "
    "the companion diagnostic to text_zipf_slope and text_heaps_curve",
)
def q_text_brevity_law(spark, sf_dir):
    return _sql_query(BREVITY_SPARK_SQL, ("documents",))(spark, sf_dir)


_QSTOP = None  # populated lazily from queries._STOP_RE (import cycle)


def _quality_length_sql() -> str:
    from kenshin_spark.queries import _STOP_RE

    return rf"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stopwords,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
),
r AS (
  SELECT doc_id, n_chars,
         n_tokens >= 25 AND n_tokens <= 100000
         AND n_chars >= 3 * n_tokens AND n_chars <= 10 * n_tokens
         AND n_stopwords >= 2
         AND n_alpha * 50 >= n_chars * 41 AS keep
  FROM f
)
SELECT CASE WHEN n_chars < 100 THEN 'a_under_100'
            WHEN n_chars < 200 THEN 'b_100_200'
            WHEN n_chars < 400 THEN 'c_200_400'
            ELSE 'd_over_400' END AS length_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS keep_rate
FROM r GROUP BY 1
"""


@stage(
    "pipeline_quality_vs_length",
    None,  # oracle bound at import end (needs queries._STOP_RE)
    "filter-bias audit: the Gopher-style keep decision (the oracled "
    "text_quality_filter rules — all integer cross-multiplications) "
    "cross-tabbed against document length bands — does the quality "
    "gate systematically drop short docs; integer band edges and "
    "counts, one rounded division per band",
)
def q_pipeline_quality_vs_length(spark, sf_dir):
    from kenshin_spark.functions.text import quality_verdict

    docs = load_table(spark, sf_dir, "documents")
    cols = quality_verdict("text")
    keep = cols["keep"]
    band = (
        F.when(F.length("text") < 100, "a_under_100")
        .when(F.length("text") < 200, "b_100_200")
        .when(F.length("text") < 400, "c_200_400")
        .otherwise("d_over_400")
    )
    kept = F.when(keep, 1).otherwise(0)
    return (
        docs.select(band.alias("length_band"), kept.alias("kept"))
        .groupBy("length_band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.round(F.sum("kept").cast("double") / F.count("*"), 6)
            .alias("keep_rate"),
        )
    )


# bind the oracle now that the module body is loaded (QuerySpec is frozen,
# so re-register with the rendered SQL)
STAGED_R7["pipeline_quality_vs_length"] = QuerySpec(
    fn=q_pipeline_quality_vs_length,
    oracle=_quality_length_sql(),
    doc=STAGED_R7["pipeline_quality_vs_length"].doc,
)


# ---------------------------------------------------------------------------
# Batch 9: hourly SLI, source vocabulary overlap, counter heuristic,
# breadth-conversion interaction
# ---------------------------------------------------------------------------

ERR_HOUR_SQL = """
WITH e AS (
  SELECT CAST(floor(floor(epoch(ts)) % 86400 / 3600) AS BIGINT) AS hour,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events
)
SELECT hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_err) AS BIGINT) AS n_errors,
       round(CAST(sum(is_err) AS DOUBLE) / count(*), 6) AS error_rate
FROM e GROUP BY hour
"""


@stage(
    "q_events_error_rate_by_hour",
    ERR_HOUR_SQL,
    "time-of-day error profile: error share per hour-of-day across all "
    "days (systematic nightly-batch breakage shows here; the daily SLI "
    "row catches incidents instead) — integer epoch arithmetic with "
    "floor() before the cast, one rounded division per hour",
)
def q_events_error_rate_by_hour(spark, sf_dir):
    return _sql_query(
        ERR_HOUR_SQL.replace("floor(epoch(ts))", "unix_timestamp(ts)"),
        ("events",),
    )(spark, sf_dir)


SOURCE_VOCAB_SQL = r"""
WITH sv AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source,
           unnest(list_filter(string_split_regex(trim(lower(text)),
                                                 '\s+'),
                              x -> x <> '')) AS tok
    FROM documents
  )
),
sizes AS (SELECT source, count(*) AS n FROM sv GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM sv a JOIN sv b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(n_common AS BIGINT) AS n_common,
       round(CAST(n_common AS DOUBLE)
             / (za.n + zb.n - n_common), 6) AS vocab_jaccard
FROM inter
JOIN sizes za ON za.source = src_a
JOIN sizes zb ON zb.source = src_b
"""

SOURCE_VOCAB_SPARK_SQL = SOURCE_VOCAB_SQL.replace(
    "unnest(list_filter(string_split_regex(trim(lower(text)),\n"
    "                                                 '\\s+'),\n"
    "                              x -> x <> ''))",
    "explode(filter(split(trim(lower(text)), '\\\\s+'), x -> x <> ''))",
)


@stage(
    "text_source_vocab_jaccard",
    SOURCE_VOCAB_SQL,
    "source-level vocabulary overlap: distinct-token Jaccard for every "
    "source pair via the token inverted index (bounded by vocab x "
    "sources, never docs x docs) — near-identical vocabularies flag "
    "mirrored crawls one level above document dedup; exact integer "
    "set sizes, one rounded division per pair",
)
def q_text_source_vocab_jaccard(spark, sf_dir):
    return _sql_query(SOURCE_VOCAB_SPARK_SQL, ("documents",))(spark, sf_dir)


COUNTER_GAUGE_SQL = f"""
WITH pts AS ({PTS}),
d AS (
  SELECT metric,
         CASE WHEN lag(value) OVER (PARTITION BY metric
                                    ORDER BY ts, arrival) IS NULL
              THEN NULL
              WHEN value >= lag(value) OVER (PARTITION BY metric
                                             ORDER BY ts, arrival)
              THEN 1 ELSE 0 END AS nondecreasing
  FROM pts
),
s AS (
  SELECT metric, count(nondecreasing) AS n,
         sum(nondecreasing) AS n_up
  FROM d WHERE nondecreasing IS NOT NULL GROUP BY metric
)
SELECT metric,
       CAST(n AS BIGINT) AS n_deltas,
       CAST(n_up AS BIGINT) AS n_nondecreasing,
       CASE WHEN n_up * 100 >= n * 95 THEN 'counter'
            ELSE 'gauge' END AS metric_class
FROM s
"""


@stage(
    "ts_counter_gauge_classify",
    COUNTER_GAUGE_SQL,
    "counter-vs-gauge heuristic: metrics whose raw series is >= 95% "
    "nondecreasing classify as counters (the schema-match aid for "
    "picking sum-vs-average aggregation and enabling counter_rate) — "
    "cross-multiplied integer threshold, (ts, arrival)-deterministic "
    "delta order",
)
def q_ts_counter_gauge_classify(spark, sf_dir):
    from pyspark.sql import Window

    pts = _points(spark, sf_dir)
    w = Window.partitionBy("metric").orderBy("ts", "arrival")
    nondec = F.when(
        F.col("value") >= F.lag("value").over(w), 1
    ).otherwise(0)
    prev_exists = F.lag("value").over(w).isNotNull()
    d = pts.select(
        "metric",
        F.when(prev_exists, nondec).alias("nondecreasing"),
    ).where(F.col("nondecreasing").isNotNull())
    s = d.groupBy("metric").agg(
        F.count("nondecreasing").alias("n"),
        F.sum("nondecreasing").alias("n_up"),
    )
    return s.select(
        "metric",
        F.col("n").cast("bigint").alias("n_deltas"),
        F.col("n_up").cast("bigint").alias("n_nondecreasing"),
        F.when(
            F.col("n_up") * 100 >= F.col("n") * 95, "counter"
        ).otherwise("gauge").alias("metric_class"),
    )


BREADTH_CONV_SQL = """
WITH u AS (
  SELECT user_id,
         count(DISTINCT event_type) AS n_types,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
)
SELECT CAST(n_types AS BIGINT) AS n_types,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
         AS conversion_rate
FROM u GROUP BY n_types
"""


@stage(
    "q_event_conversion_by_breadth",
    BREADTH_CONV_SQL,
    "does engagement breadth convert: purchase rate by distinct event "
    "types touched per user — the interaction readout on top of "
    "q_event_type_breadth (note n_types >= 1 includes the purchase "
    "type itself at the top bucket); integer counts, one rounded "
    "division per bucket",
)
def q_event_conversion_by_breadth(spark, sf_dir):
    return _sql_query(BREADTH_CONV_SQL, ("events",))(spark, sf_dir)


# ---------------------------------------------------------------------------
# Batch 10: tier-age distribution + packing-waste audit (bank at 50)
# ---------------------------------------------------------------------------

TIER_AGE_SQL = f"""
WITH pts AS ({PTS}),
now_t AS (SELECT max(ts) AS now FROM pts)
SELECT metric,
       CASE WHEN now - ts < 86400 THEN 'tier0_60s'
            WHEN now - ts < 604800 THEN 'tier1_300s'
            ELSE 'tier2_3600s' END AS tier,
       CAST(count(*) AS BIGINT) AS n_points
FROM pts, now_t GROUP BY 1, 2
"""


@stage(
    "ts_tier_age_distribution",
    TIER_AGE_SQL,
    "retention-tier point distribution: arrivals bucketed by the R2 "
    "archive-selection age boundaries (1d/7d from the TS_SCHEMA "
    "cascade) per metric — where the data actually lives across tiers, "
    "the companion to ts_tier_selection's routing check; integer age "
    "arithmetic against the broadcast stream head",
)
def q_ts_tier_age_distribution(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = pts.agg(F.max("ts").alias("now"))
    age = F.col("now") - F.col("ts")
    tier = (
        F.when(age < 86400, "tier0_60s")
        .when(age < 604800, "tier1_300s")
        .otherwise("tier2_3600s")
    )
    return (
        pts.crossJoin(F.broadcast(now))
        .groupBy("metric", tier.alias("tier"))
        .agg(F.count("*").cast("bigint").alias("n_points"))
    )


PACK_WASTE_SQL = r"""
WITH t AS (
  SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '')) AS n_tok
  FROM documents
),
sizes AS (
  SELECT 512 AS chunk UNION ALL SELECT 1024 UNION ALL SELECT 2048
)
SELECT CAST(chunk AS BIGINT) AS chunk_size,
       CAST(sum(CAST(floor((n_tok + chunk - 1) / chunk) AS BIGINT))
            AS BIGINT) AS n_chunks,
       CAST(sum(CAST(floor((n_tok + chunk - 1) / chunk) AS BIGINT) * chunk
                - n_tok) AS BIGINT) AS padding_tokens,
       round(CAST(sum(CAST(floor((n_tok + chunk - 1) / chunk) AS BIGINT)
                      * chunk - n_tok) AS DOUBLE)
             / sum(CAST(floor((n_tok + chunk - 1) / chunk) AS BIGINT)
                   * chunk), 6) AS waste_rate
FROM t, sizes GROUP BY chunk
"""

PACK_WASTE_SPARK_SQL = PACK_WASTE_SQL.replace(
    "len(list_filter(string_split_regex(trim(text), '\\s+'),\n"
    "                         x -> x <> ''))",
    "size(filter(split(trim(text), '\\\\s+'), x -> x <> ''))",
)


@stage(
    "pipeline_packing_waste",
    PACK_WASTE_SQL,
    "padding-waste what-if for document-isolated packing: chunks and "
    "padding tokens at 512/1024/2048-token sequence lengths in one "
    "pass (ceil division floor()ed before the cast — the DuckDB "
    "rounding-cast trap) — the document-boundary-respecting "
    "counterfactual to pipeline_sequence_packing's concat-then-chunk",
)
def q_pipeline_packing_waste(spark, sf_dir):
    return _sql_query(PACK_WASTE_SPARK_SQL, ("documents",))(spark, sf_dir)
