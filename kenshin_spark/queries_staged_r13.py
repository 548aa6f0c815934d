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


# --------------------------------------------------------------------------
# Batch 3: min-agg cascade, unaligned-now fetch, whitespace-tolerant
# line protocol, segment/region matrix, daily value envelopes, minhash
# signature uniformity, top priority per nation, band coverage, flag
# matrix.
# --------------------------------------------------------------------------

from kenshin_spark.config import Schema  # noqa: E402
from kenshin_spark.queries_staged_r8_engine import (  # noqa: E402
    CUT,
    _W,
    _grid_sql,
    _store,
    _week_slots,
)


@stage(
    "store_min_agg_cascade",
    f"""
    WITH {_W}
    SELECT metric, ts - ts % 300 AS ts, min(value) AS value
    FROM t0 GROUP BY 1, 2
    """,
    "A4 through the persisted cascade: a store whose schema declares "
    "`min` aggregation propagates tier0 -> 300s by per-slot minimum "
    "(exact comparisons like max — the other float-safe kernel); "
    "tier1 read back must equal the direct min replay",
)
def q_store_min_agg_cascade(spark, sf_dir):
    schema = Schema.from_strings(
        "bankmin", ".*", "60s:90d,300s:180d", xff=20.0,
        agg_method="min", cache_retention=600,
    )
    st = _store(spark, sf_dir, "store_min_cascade", schema=schema)
    slots = _week_slots(spark, sf_dir).localCheckpoint(eager=True)
    st.upsert(0, slots)
    st.propagate(slots.select("metric", "ts"))
    return st.read(1)


@stage(
    "store_fetch_unaligned_now",
    f"""
    WITH {_W},
    now_t AS (SELECT CAST({CUT} + 37 AS BIGINT) AS now),
    tier AS (SELECT metric, ts, value FROM t0),
    {_grid_sql("now - 3600 - 37", "now - 37", 60)}
    """,
    "R1 clamp arithmetic with an UNALIGNED now: a fetch issued 37 s "
    "past the slot boundary must round its window up to whole slots "
    "(roundup(from), roundup(until)) exactly like the reference's "
    "fetch clamp — the off-grid-request path every live dashboard "
    "exercises; the oracle replays the roundup",
)
def q_store_fetch_unaligned_now(spark, sf_dir):
    from kenshin_spark.queries_staged_r8_engine import _METRICS5

    st = _store(spark, sf_dir, "store_unaligned_now")
    st.upsert(0, _week_slots(spark, sf_dir))
    now = CUT + 37
    return st.fetch(_METRICS5, now - 3600 - 37, now - 37, now)


@stage(
    "lp_whitespace_tolerance",
    f"""
    WITH pts AS ({PTS})
    SELECT metric, count(*) * 3 AS n_parsed
    FROM pts WHERE value IS NOT NULL GROUP BY 1
    """,
    "wire-format whitespace tolerance: every point serialized three "
    "ways (single space, double space, tab) and ALL of them must "
    "parse — parse_metric_lines splits on \\s+ so collector quirks "
    "don't become dead letters; parsed counts are exactly 3x the "
    "source points per metric",
)
def q_lp_whitespace_tolerance(spark, sf_dir):
    from kenshin_spark.sources.line_protocol import parse_metric_lines

    pts = _points(spark, sf_dir).where(F.col("value").isNotNull())
    base = F.concat_ws(
        " ", "metric", F.col("value").cast("string"),
        F.col("ts").cast("string"),
    )
    double = F.concat(
        F.col("metric"), F.lit("  "), F.col("value").cast("string"),
        F.lit(" "), F.col("ts").cast("string"),
    )
    tabbed = F.concat(
        F.col("metric"), F.lit("\t"), F.col("value").cast("string"),
        F.lit("\t"), F.col("ts").cast("string"),
    )
    lines = (
        pts.select(base.alias("value"))
        .unionByName(pts.select(double.alias("value")))
        .unionByName(pts.select(tabbed.alias("value")))
    )
    parsed = parse_metric_lines(lines).where(F.col("corrupt").isNull())
    return parsed.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_parsed")
    )


@stage(
    "q_customer_segment_region_matrix",
    """
    SELECT c.c_mktsegment, r.r_name, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
    """,
    "segment x region customer matrix — the territory-planning grid, "
    "both dims broadcast",
)
def q_q_customer_segment_region_matrix(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("c_mktsegment", "r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@stage(
    "q_events_value_minmax_by_day",
    """
    SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS BIGINT)
             AS day,
           min(value) AS v_min,
           max(value) AS v_max,
           count(value) AS n_values
    FROM events GROUP BY 1
    """,
    "daily value envelope: exact min/max per day — the range "
    "metadata a zone-map/pruning layer would persist per partition",
)
def q_q_events_value_minmax_by_day(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.unix_timestamp("ts").cast("long") / 86400)
        .cast("long")
        .alias("day")
    ).agg(
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.count("value").alias("n_values"),
    )


@stage(
    "dedup_sig_uniformity",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - 2),
                 i -> array_to_string(toks[i : i + 2], ' ')
               )) AS shingle
        FROM (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM documents
        )
      )
    ),
    sig AS (
      SELECT doc_id,
             min(CAST(('0x' || substr(md5('0|' || shingle), 1, 15))
                 AS BIGINT)) AS h0
      FROM sh GROUP BY doc_id
    )
    SELECT CAST(h0 // 144115188075855872 AS BIGINT) AS band,
           count(*) AS n_docs
    FROM sig GROUP BY 1
    """,
    "minhash signature uniformity: the h0 component's top-3-bit "
    "distribution across docs (eight 2^57-wide bands of the 60-bit "
    "space) — minima of uniform hashes skew low, and this histogram "
    "is the sanity check that the seeded-md5 family behaves like the "
    "theory assumes; integer bucketing only",
)
def q_dedup_sig_uniformity(spark, sf_dir):
    from kenshin_spark.dedup.minhash import minhash_signatures, shingles

    sig = minhash_signatures(
        shingles(load_table(spark, sf_dir, "documents"))
    )
    return sig.groupBy(
        F.floor(F.col("h0") / F.lit(144115188075855872)).cast("long")
        .alias("band")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@stage(
    "q_nation_top_priority",
    """
    SELECT n_name, top_priority, n_orders FROM (
      SELECT n.n_name, o.o_orderpriority AS top_priority,
             count(*) AS n_orders,
             row_number() OVER (
               PARTITION BY n.n_name
               ORDER BY count(*) DESC, o.o_orderpriority) AS rnk
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ) t WHERE rnk = 1
    """,
    "dominant order priority per nation: grouped counts reduced to "
    "the per-nation argmax with a priority tie-break",
)
def q_q_nation_top_priority(spark, sf_dir):
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("n_orders").desc(), F.col("o_orderpriority")
    )
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "n_name",
            F.col("o_orderpriority").alias("top_priority"),
            "n_orders",
        )
    )


@stage(
    "render_band_coverage",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    b AS (
      SELECT metric,
             quantile_cont(value, 0.1) AS lo,
             quantile_cont(value, 0.9) AS hi
      FROM t0 GROUP BY 1
    )
    SELECT t.metric,
           count(*) AS n_slots,
           sum(CASE WHEN t.value >= b.lo AND t.value <= b.hi
                    THEN 1 ELSE 0 END) AS n_in_band
    FROM t0 t JOIN b ON b.metric = t.metric
    GROUP BY 1
    """,
    "percentile band coverage: how many tier0 slots sit inside the "
    "series' own [p10, p90] band — the nPercentile flat-line pair "
    "quantified (by construction ~80%%, deviations flag heavy tails); "
    "exact interpolated bounds, integer counts",
)
def q_render_band_coverage(spark, sf_dir):
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    b = t0.groupBy("metric").agg(
        F.expr("percentile(value, 0.1)").alias("lo"),
        F.expr("percentile(value, 0.9)").alias("hi"),
    )
    j = t0.join(b, "metric")
    return j.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum(
            (
                (F.col("value") >= F.col("lo"))
                & (F.col("value") <= F.col("hi"))
            ).cast("long")
        ).alias("n_in_band"),
    )


@stage(
    "q_lineitem_flag_status_matrix",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_lines,
           sum(CAST(l_quantity AS BIGINT)) AS total_qty
    FROM lineitem GROUP BY 1, 2
    """,
    "the q1 grouping reduced to its integer core: line counts and "
    "whole-unit quantity totals per (returnflag, linestatus)",
)
def q_q_lineitem_flag_status_matrix(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


# --------------------------------------------------------------------------
# Batch 4: ghost-metric grid, lang/source matrix, large-coordinate
# counts, same-day signup conversion, integer-value share, order value
# span.
# --------------------------------------------------------------------------


@stage(
    "store_fetch_ghost_metric",
    f"""
    WITH now_t AS (SELECT CAST({CUT} AS BIGINT) AS now),
    tier AS (SELECT CAST(NULL AS VARCHAR) AS metric,
                    CAST(NULL AS BIGINT) AS ts,
                    CAST(NULL AS DOUBLE) AS value
             WHERE FALSE),
    {_grid_sql("now - 3600", "now", 60,
               "SELECT 'ghost.metric' AS metric")}
    """,
    "R3 edge: fetching a metric the store has NEVER seen still emits "
    "the full NULL grid (the dashboard contract — a missing series "
    "renders as gaps, not an error or an empty frame); 60 slots of "
    "real SQL NULLs",
)
def q_store_fetch_ghost_metric(spark, sf_dir):
    st = _store(spark, sf_dir, "store_ghost_metric")
    st.upsert(0, _week_slots(spark, sf_dir))
    return st.fetch(["ghost.metric"], CUT - 3600, CUT, CUT)


@stage(
    "text_lang_source_matrix",
    """
    SELECT lang, source, count(*) AS n_docs,
           sum(n_chars) AS total_chars
    FROM documents GROUP BY 1, 2
    """,
    "corpus composition matrix: doc and character volume per "
    "(language, source) cell — the coverage table a mixture plan "
    "starts from",
)
def q_text_lang_source_matrix(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@stage(
    "emb_large_coord_counts",
    """
    SELECT label,
           count(*) AS n_vectors,
           sum(len(list_filter(embedding, x -> abs(x) > 0.3)))
             AS n_large_coords
    FROM embeddings GROUP BY 1
    """,
    "coordinate saturation per label: how many |x| > 0.3 components "
    "the label's vectors carry in total — the sparsity/peakedness "
    "profile int8 quantization ranges are tuned from; exact float "
    "comparisons folded to integers",
)
def q_emb_large_coord_counts(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n_large = F.size(
        F.filter("embedding", lambda x: F.abs(x) > 0.3)
    ).cast("long")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(n_large).alias("n_large_coords"),
    )


@stage(
    "q_events_signup_sameday_purchase",
    """
    WITH s AS (
      SELECT user_id,
             min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS signup_day
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS p_day
      FROM events WHERE event_type = 'purchase'
    )
    SELECT count(*) AS n_signups,
           sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_sameday_buyers
    FROM (
      SELECT s.user_id,
             max(CASE WHEN p.p_day = s.signup_day THEN TRUE
                      ELSE FALSE END) AS hit
      FROM s LEFT JOIN p ON p.user_id = s.user_id
      GROUP BY 1
    ) z
    """,
    "activation headline: users who purchased on their signup day — "
    "first-touch day join, integer day arithmetic, one number the "
    "growth review opens with",
)
def q_q_events_signup_sameday_purchase(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    s = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(day).alias("signup_day")
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", day.alias("p_day"))
        .distinct()
        .withColumnRenamed("user_id", "pu")
    )
    j = s.join(
        p,
        (F.col("pu") == F.col("user_id"))
        & (F.col("p_day") == F.col("signup_day")),
        "left",
    )
    per_u = j.groupBy("user_id").agg(
        F.max(F.col("pu").isNotNull()).alias("hit")
    )
    return per_u.agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.sum(F.col("hit").cast("long")).alias("n_sameday_buyers"),
    )


@stage(
    "ts_integer_value_share",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           count(value) AS n_values,
           sum(CASE WHEN value = floor(value) THEN 1 ELSE 0 END)
             AS n_whole,
           sum(CASE WHEN value = floor(value) THEN 1 ELSE 0 END)
             * 1000000 // count(value) AS whole_ppm
    FROM pts WHERE value IS NOT NULL GROUP BY 1
    """,
    "value-precision audit: how many of a metric's values are whole "
    "numbers (value == floor(value) — an exact float predicate) — "
    "separates counters and enum gauges from continuous measurements, "
    "the typing hint a schema advisor uses; floor-scaled ppm",
)
def q_ts_integer_value_share(spark, sf_dir):
    pts = _points(spark, sf_dir).where(F.col("value").isNotNull())
    whole = (F.col("value") == F.floor("value")).cast("long")
    return pts.groupBy("metric").agg(
        F.count("value").alias("n_values"),
        F.sum(whole).alias("n_whole"),
        F.floor(F.sum(whole) * 1000000 / F.count("value"))
        .cast("long")
        .alias("whole_ppm"),
    )


@stage(
    "q_customer_order_value_span",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           min(o_totalprice) AS min_value,
           max(o_totalprice) AS max_value,
           round(CAST(max(o_totalprice) - min(o_totalprice) AS DOUBLE), 2)
             AS value_span
    FROM orders GROUP BY 1 HAVING count(*) >= 2
    """,
    "per-customer order value envelope for repeat buyers: exact "
    "min/max and their spread — the basket-volatility statistic",
)
def q_q_customer_order_value_span(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_value"),
            F.max("o_totalprice").alias("max_value"),
            F.round(
                (F.max("o_totalprice") - F.min("o_totalprice")).cast(
                    "double"
                ),
                2,
            ).alias("value_span"),
        )
        .where(F.col("n_orders") >= 2)
    )


# --------------------------------------------------------------------------
# Batch 5: double-fire detector, hour co-activity, ship-before-order
# audit, first-letter profile, date envelope, region-quarter heat,
# intra-nation trade, histogram clip audit.
# --------------------------------------------------------------------------


@stage(
    "q_events_back_to_back",
    """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts
      FROM events
    ),
    g AS (
      SELECT user_id, event_type,
             ts - lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts) AS gap
      FROM e
    )
    SELECT event_type,
           count(*) AS n_pairs,
           sum(CASE WHEN gap <= 10 THEN 1 ELSE 0 END) AS n_rapid
    FROM g WHERE gap IS NOT NULL GROUP BY 1
    """,
    "double-fire detector: same-user same-type event pairs within "
    "10 s (client retry storms / duplicate instrumentation) — the "
    "at-least-once symptom the watermark dedup guards against, "
    "quantified per type; integer lag arithmetic",
)
def q_q_events_back_to_back(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    g = ev.withColumn("gap", F.col("ts") - F.lag("ts").over(w)).where(
        F.col("gap").isNotNull()
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("gap") <= 10).cast("long")).alias("n_rapid"),
    )


@stage(
    "ts_hour_coactivity_matrix",
    f"""
    WITH pts AS ({PTS}),
    h AS (SELECT DISTINCT metric, ts // 3600 AS hr FROM pts)
    SELECT a.metric AS metric_a, b.metric AS metric_b,
           count(*) AS n_shared_hours
    FROM h a JOIN h b
      ON b.hr = a.hr AND a.metric < b.metric
    GROUP BY 1, 2
    """,
    "metric co-activity matrix: hours where BOTH metrics reported, "
    "for every pair — the co-observation denominator the correlation "
    "rows divide by, exposed as its own integrity row; integer "
    "hour-set intersection",
)
def q_ts_hour_coactivity_matrix(spark, sf_dir):
    pts = _points(spark, sf_dir)
    h = pts.select(
        "metric", (F.col("ts") / 3600).cast("long").alias("hr")
    ).distinct()
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("b.hr") == F.col("a.hr"))
            & (F.col("a.metric") < F.col("b.metric")),
        )
        .groupBy(
            F.col("a.metric").alias("metric_a"),
            F.col("b.metric").alias("metric_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_hours"))
    )


@stage(
    "q_ship_before_order_audit",
    """
    SELECT count(*) AS n_lines,
           sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
             AS n_ship_before_order,
           sum(CASE WHEN l_shipdate = o_orderdate THEN 1 ELSE 0 END)
             AS n_same_day_ship
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    """,
    "temporal-integrity audit: lines shipped BEFORE their order date "
    "(impossible-history bug class) and same-day shipments — the "
    "date-sanity gate a fact load runs; one joined scan, integer "
    "counts",
)
def q_q_ship_before_order_audit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_shipdate") < F.col("o_orderdate")).cast("long")
        ).alias("n_ship_before_order"),
        F.sum(
            (F.col("l_shipdate") == F.col("o_orderdate")).cast("long")
        ).alias("n_same_day_ship"),
    )


@stage(
    "text_first_letter_profile",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    )
    SELECT substr(tok, 1, 1) AS first_letter,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct
    FROM toks WHERE tok <> '' GROUP BY 1
    """,
    "first-letter distribution of the token stream with per-letter "
    "vocabulary counts — the trie fan-out root profile; string "
    "slicing and counts",
)
def q_text_first_letter_profile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    return toks.groupBy(
        F.substring("tok", 1, 1).alias("first_letter")
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )


@stage(
    "q_orders_date_envelope",
    """
    SELECT CAST(min(o_orderdate) AS VARCHAR) AS first_order,
           CAST(max(o_orderdate) AS VARCHAR) AS last_order,
           CAST(datediff('day', min(o_orderdate), max(o_orderdate))
                AS BIGINT) AS span_days,
           count(DISTINCT o_orderdate) AS n_active_days,
           count(*) AS n_orders
    FROM orders
    """,
    "order-stream envelope: the first/last order dates, whole-day "
    "span, active-day count and volume — the one-row dataset "
    "fingerprint a load manifest records",
)
def q_q_orders_date_envelope(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.min("o_orderdate").cast("string").alias("first_order"),
        F.max("o_orderdate").cast("string").alias("last_order"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("long")
        .alias("span_days"),
        F.countDistinct("o_orderdate").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@stage(
    "store_restore_rollback",
    None,  # placeholder — real oracle set below (needs the r8 fragment)
)
def q_store_restore_rollback(spark, sf_dir):
    import os

    from kenshin_spark.queries_staged_r8_engine import (
        _BANK,
        _week_slots,
        _workdir,
    )
    from kenshin_spark.store import ParquetTieredStore

    st = ParquetTieredStore(
        spark,
        _BANK,
        os.path.join(
            _workdir(sf_dir, "store_restore_rollback"), "store"
        ),
        mode="mor",
        commit_protocol="manifest",
    )
    slots = _week_slots(spark, sf_dir).localCheckpoint(eager=True)
    st.upsert(0, slots.where(F.col("ts") % 120 == 0))
    good = st.commit.epoch()
    # the "bad batch": odd-minute slots that must vanish entirely
    st.upsert(0, slots.where(F.col("ts") % 120 == 60))
    st.restore(good)
    # the rollback is itself an op-labelled commit (DESCRIBE HISTORY)
    ops = [r["op"] for r in st.history()]
    assert ops[0] == "restore" and ops.count("upsert") == 2, ops
    # and the bad batch's files are tombstoned, not deleted: a reader
    # that planned pre-restore still finishes within the grace window
    assert st.commit.tombstones(), "restore must retire via tombstones"
    return st.read(0)


def _set_restore_oracle():
    from kenshin_spark.queries_staged_r8_engine import _W

    spec = STAGED_R13["store_restore_rollback"]
    STAGED_R13["store_restore_rollback"] = QuerySpec(
        fn=spec.fn,
        oracle=(
            f"WITH {_W} SELECT metric, ts, value FROM t0 "
            f"WHERE ts % 120 = 0"
        ),
        doc=(
            "RESTORE TABLE as a driver row: a bad ingest batch is "
            "rolled back in ONE forward metadata commit that retires "
            "(tombstones) every file added after the pinned seq, and "
            "the read back must equal exactly the pre-ingest "
            "even-minute LWW grid; the op ledger and the "
            "tombstone-not-delete retirement are asserted in-row "
            "(kenshin_spark/store.py restore, commit.py history)"
        ),
    )


_set_restore_oracle()


@stage(
    "q_intranation_trade_share",
    """
    WITH t AS (
      SELECT cn.n_nationkey = sn.n_nationkey AS domestic
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
    SELECT count(*) AS n_lines,
           sum(CASE WHEN domestic THEN 1 ELSE 0 END) AS n_domestic,
           sum(CASE WHEN domestic THEN 1 ELSE 0 END) * 1000000
             // count(*) AS domestic_ppm
    FROM t
    """,
    "domestic-trade share: lines where customer and supplier sit in "
    "the same nation (the q7 join tree reduced to one ppm number) — "
    "the fact table against two key joins and two broadcast dims",
)
def q_q_intranation_trade_share(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
    )
    dom = (F.col("c_nationkey") == F.col("s_nationkey")).cast("long")
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(dom).alias("n_domestic"),
        F.floor(F.sum(dom) * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("domestic_ppm"),
    )


@stage(
    "sketch_histogram_clip_audit",
    """
    WITH cells AS (
      SELECT CASE WHEN value < 50.0 THEN 0
                  WHEN value >= 200.0 THEN 76
                  ELSE CAST(floor((value - 50.0) / 2.0) + 1 AS INT)
             END AS bucket,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
    GROUP BY 1
    )
    SELECT sum(c) AS n_values,
           sum(CASE WHEN bucket = 0 THEN c ELSE 0 END) AS n_underflow,
           sum(CASE WHEN bucket = 76 THEN c ELSE 0 END) AS n_overflow
    FROM cells
    """,
    "histogram bounds-clipping audit BOTH ways: a deliberately narrow "
    "[50, 200) sketch and the mass falling into its underflow and "
    "overflow buckets — the two-sided range-validation the "
    "tail-mass row covers only above; integer cell sums",
)
def q_sketch_histogram_clip_audit(spark, sf_dir):
    from kenshin_spark.functions.sketches import histogram_sketches

    ev = load_table(spark, sf_dir, "events")
    cells = histogram_sketches(ev, "value", lo=50.0, hi=200.0, bins=75)
    return cells.agg(
        F.sum("c").alias("n_values"),
        F.sum(F.when(F.col("bucket") == 0, F.col("c")).otherwise(0))
        .alias("n_underflow"),
        F.sum(F.when(F.col("bucket") == 76, F.col("c")).otherwise(0))
        .alias("n_overflow"),
    )


# --------------------------------------------------------------------------
# Final bank rows: activity Gini, weekly medians, shared name words,
# basket concentration, common openers, value modes, discount bands,
# priority/dow matrix, inter-session gaps, alpha-only share, BMP row
# padding, CMS depth sensitivity, nation balance sheet, top-2 type mix.
# --------------------------------------------------------------------------


@stage(
    "q_events_activity_gini_by_type",
    """
    WITH u AS (
      SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, n,
             row_number() OVER (
               PARTITION BY event_type ORDER BY n, user_id) AS i
      FROM u
    ),
    s AS (
      SELECT event_type, count(*) AS k, sum(n) AS sx, sum(i * n) AS six
      FROM r GROUP BY 1
    )
    SELECT event_type, k AS n_users,
           CAST((2 * six - (k + 1) * sx) * 1000000 // (k * sx)
                AS BIGINT) AS gini_ppm
    FROM s
    """,
    "activity inequality per event type as a scaled-integer Gini: "
    "rank-weighted user activity sums — is purchase volume carried by "
    "whales while views spread evenly; integers until the final floor "
    "division",
)
def q_q_events_activity_gini_by_type(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("n", "user_id")
    r = u.withColumn("i", F.row_number().over(w))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sx"),
        F.sum(F.col("i") * F.col("n")).alias("six"),
    )
    return s.select(
        "event_type",
        F.col("k").alias("n_users"),
        F.floor(
            (2 * F.col("six") - (F.col("k") + 1) * F.col("sx"))
            * 1000000
            / (F.col("k") * F.col("sx"))
        ).cast("long").alias("gini_ppm"),
    )


@stage(
    "ts_median_value_weekly",
    f"""
    WITH pts AS ({PTS})
    SELECT metric, CAST(ts // 604800 AS BIGINT) AS week,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           count(value) AS n_points
    FROM pts WHERE value IS NOT NULL GROUP BY 1, 2
    """,
    "weekly median value per metric — the robust level trend the "
    "render layer's nPercentile flat-lines come from, materialized as "
    "state; exact interpolated medians",
)
def q_ts_median_value_weekly(spark, sf_dir):
    pts = _points(spark, sf_dir).where(F.col("value").isNotNull())
    return pts.groupBy(
        "metric", (F.col("ts") / 604800).cast("long").alias("week")
    ).agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.count("value").alias("n_points"),
    )


@stage(
    "q_part_name_common_words",
    r"""
    WITH w AS (
      SELECT p_partkey,
             unnest(string_split_regex(trim(p_name), '\s+')) AS word
      FROM part
    ),
    c AS (
      SELECT word, count(*) AS n_parts FROM w GROUP BY 1
    )
    SELECT word, n_parts FROM (
      SELECT word, n_parts,
             row_number() OVER (ORDER BY n_parts DESC, word) AS rnk
      FROM c
    ) t WHERE rnk <= 20
    """,
    "top-20 words across part names — the catalog's shared-vocabulary "
    "core (color/material tokens), with a word tie-break for "
    "deterministic ranking",
)
def q_q_part_name_common_words(spark, sf_dir):
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    w = part.select(
        F.explode(F.split(F.trim("p_name"), r"\s+")).alias("word")
    )
    c = w.groupBy("word").agg(F.count(F.lit(1)).alias("n_parts"))
    win = Window.orderBy(F.col("n_parts").desc(), F.col("word"))
    return (
        c.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 20)
        .select("word", "n_parts")
    )


@stage(
    "q_customer_basket_concentration",
    """
    WITH c AS (
      SELECT o_custkey,
             CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS max_cents,
             CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100)
                  AS BIGINT) AS total_cents,
             count(*) AS n_orders
      FROM orders GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT o_custkey, n_orders,
           max_cents * 1000000 // total_cents AS top_order_ppm
    FROM c
    """,
    "basket concentration for repeat buyers: the largest order's "
    "share of lifetime spend in integer cents (DECIMAL sum, floor to "
    "cents, floor-divide — the full cross-engine money discipline in "
    "one row); flags one-big-purchase customers",
)
def q_q_customer_basket_concentration(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    c = (
        orders.groupBy("o_custkey")
        .agg(
            F.floor(F.max("o_totalprice") * 100)
            .cast("long")
            .alias("max_cents"),
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
            ).cast("long").alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
    )
    return c.select(
        "o_custkey", "n_orders",
        F.expr("max_cents * 1000000 DIV total_cents").alias(
            "top_order_ppm"
        ),
    )


@stage(
    "text_common_openers",
    r"""
    WITH f AS (
      SELECT string_split_regex(trim(lower(text)), '\s+')[1] AS opener
      FROM documents
    )
    SELECT opener, n_docs FROM (
      SELECT opener, count(*) AS n_docs,
             row_number() OVER (ORDER BY count(*) DESC, opener) AS rnk
      FROM f GROUP BY 1
    ) t WHERE rnk <= 10
    """,
    "top-10 document openers (first token) — the template/boilerplate "
    "tell a curation pass reads before writing dedup rules",
)
def q_text_common_openers(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        F.element_at(
            F.split(F.trim(F.lower("text")), r"\s+"), 1
        ).alias("opener")
    )
    c = f.groupBy("opener").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy(F.col("n_docs").desc(), F.col("opener"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("opener", "n_docs")
    )


@stage(
    "ts_value_mode_per_metric",
    f"""
    WITH pts AS ({PTS}),
    c AS (
      SELECT metric, value, count(*) AS n FROM pts
      WHERE value IS NOT NULL GROUP BY 1, 2
    )
    SELECT metric, value AS mode_value, n AS n_at_mode FROM (
      SELECT metric, value, n,
             row_number() OVER (
               PARTITION BY metric ORDER BY n DESC, value) AS rnk
      FROM c
    ) t WHERE rnk = 1
    """,
    "modal raw value per metric with a value tie-break — the "
    "default-state detector (a gauge stuck at its resting level); "
    "grouped counts + per-group rank, exact float equality grouping",
)
def q_ts_value_mode_per_metric(spark, sf_dir):
    from pyspark.sql import Window

    pts = _points(spark, sf_dir).where(F.col("value").isNotNull())
    c = pts.groupBy("metric", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("metric").orderBy(
        F.col("n").desc(), F.col("value")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "metric", F.col("value").alias("mode_value"),
            F.col("n").alias("n_at_mode"),
        )
    )


@stage(
    "q_discount_by_quantity_bands",
    """
    SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_band,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 1000000) / 1000000 AS avg_discount
    FROM lineitem GROUP BY 1
    """,
    "discount depth by quantity band: DECIMAL-summed discounts "
    "divided once with the rounding guard — do bulk lines actually "
    "get better rates",
)
def q_q_discount_by_quantity_bands(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_band")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1))
                * 1000000
            )
            / 1000000
        ).alias("avg_discount"),
    )


@stage(
    "q_priority_weekday_matrix",
    """
    SELECT o_orderpriority,
           CAST((datediff('day', DATE '1970-01-01', o_orderdate) + 4) % 7
                AS BIGINT) AS dow,
           count(*) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
    "priority x weekday order matrix on the Thursday-anchored dow "
    "grid — does urgency cluster on particular days",
)
def q_q_priority_weekday_matrix(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dow = (
        (F.datediff("o_orderdate", F.lit("1970-01-01")) + 4) % 7
    ).cast("long")
    return orders.groupBy("o_orderpriority", dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@stage(
    "q_intersession_gap_bands",
    """
    WITH s AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT CASE WHEN gap_s <= 7200 THEN '30m-2h'
                WHEN gap_s <= 86400 THEN '2h-1d'
                ELSE '1d+' END AS band,
           count(*) AS n_gaps
    FROM s WHERE new_s = 1 AND gap_s IS NOT NULL
    GROUP BY 1
    """,
    "inter-session gap distribution: the silences that DEFINE session "
    "boundaries, banded — the histogram that justifies (or indicts) "
    "the 30-minute gap parameter; integer second arithmetic",
)
def q_q_intersession_gap_bands(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = ev.select(
        "user_id", "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    ).withColumn(
        "gap_s",
        F.unix_timestamp("ts").cast("long")
        - F.unix_timestamp("prev_ts").cast("long"),
    )
    gaps = s.where(F.col("gap_s") > 1800)
    band = (
        F.when(F.col("gap_s") <= 7200, "30m-2h")
        .when(F.col("gap_s") <= 86400, "2h-1d")
        .otherwise("1d+")
    )
    return gaps.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_gaps")
    )


@stage(
    "text_alpha_only_share",
    """
    SELECT source,
           count(*) AS n_docs,
           sum(CASE WHEN regexp_matches(text, '^[a-z ]*$')
                    THEN 1 ELSE 0 END) AS n_alpha_only
    FROM documents GROUP BY 1
    """,
    "charset purity per source: documents made only of lowercase "
    "letters and spaces (the synthetic corpus's contract — a nonzero "
    "complement means upstream contamination); anchored regex on "
    "both engines",
)
def q_text_alpha_only_share(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pure = F.col("text").rlike("^[a-z ]*$").cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(pure).alias("n_alpha_only"),
    )


@stage(
    "mm_bmp_row_padding",
    """
    SELECT doc_id,
           9 + doc_id % 4 AS width,
           6 AS height,
           54 + 6 * (((9 + doc_id % 4) * 3 + 3) // 4 * 4) AS n_bytes,
           CAST(((9 + doc_id % 4) * 3 + 3) // 4 * 4
                - (9 + doc_id % 4) * 3 AS BIGINT) AS pad_bytes
    FROM documents WHERE doc_id % 50 = 0
    """,
    "the BMP 4-byte row-padding edge: odd widths (9-12 px) whose "
    "3-byte pixels don't align — the exporter must pad each row to a "
    "4-byte boundary and the decoder must skip it; byte size and pad "
    "width verified against the BI_RGB arithmetic per doc",
)
def q_mm_bmp_row_padding(spark, sf_dir):
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 50 = 0")
        .select("doc_id")
    )

    def kern(batches):
        import numpy as np

        from kenshin_spark.multimodal import codecs

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 9 + did % 4, 6
                y = np.arange(h)[:, None]
                x = np.arange(w)[None, :]
                arr = ((did + 31 * y + 17 * x) % 256).astype(np.uint8)
                payload = codecs.encode_bmp(arr)
                dw, dh, _ = codecs.bmp_info(payload)
                row_bytes = (w * 3 + 3) // 4 * 4
                rows.append(
                    (did, dw, dh, len(payload), row_bytes - w * 3)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes",
                         "pad_bytes"],
            )

    return docs.mapInPandas(
        kern,
        "doc_id long, width long, height long, n_bytes long, "
        "pad_bytes long",
    )


def _cms_total_overcount(depth: int) -> str:
    return f"""
    SELECT CAST({depth} AS BIGINT) AS depth,
           sum(est - exact) AS total_overcount FROM (
      WITH cells AS (
        SELECT t.r AS row,
               CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' ||
                     CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256
                 AS bucket,
               count(*) AS c
        FROM events CROSS JOIN generate_series(0, {depth - 1}) t(r)
        GROUP BY 1, 2
      ),
      exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
      probe AS (
        SELECT e.user_id, e.exact, t.r AS row,
               CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' ||
                     CAST(e.user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256
                 AS bucket
        FROM exact e CROSS JOIN generate_series(0, {depth - 1}) t(r)
      )
      SELECT p.user_id, max(p.exact) AS exact,
             min(coalesce(cl.c, 0)) AS est
      FROM probe p
      LEFT JOIN cells cl ON cl.row = p.row AND cl.bucket = p.bucket
      GROUP BY 1
    ) z
    """


@stage(
    "sketch_cms_depth_sensitivity",
    " UNION ALL ".join(_cms_total_overcount(d) for d in (1, 2, 4)),
    "CMS depth sizing: the TOTAL overcount across all users at depth "
    "1/2/4 on a deliberately narrow width-256 sketch — each extra row "
    "takes a min over an independent hashing, collapsing collision "
    "error; the measured curve that picks depth; replayed bit-for-bit "
    "at every depth",
)
def q_sketch_cms_depth_sensitivity(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        cms_estimate,
        cms_merge,
        cms_sketches,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_id", F.col("user_id").cast("string")
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    out = None
    for d in (1, 2, 4):
        merged = cms_merge(cms_sketches(ev, "user_id", depth=d, width=256))
        est = cms_estimate(
            merged, exact.select("user_id"), "user_id", depth=d, width=256
        )
        agg = (
            est.join(exact, "user_id")
            .agg(
                F.lit(d).cast("long").alias("depth"),
                F.sum(F.col("est") - F.col("exact")).alias(
                    "total_overcount"
                ),
            )
        )
        out = agg if out is None else out.unionByName(agg)
    return out


@stage(
    "q_nation_balance_sheet",
    """
    WITH c AS (
      SELECT c_nationkey AS nk,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                   AS DOUBLE), 2) AS customer_balance
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nk,
             round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2)))
                   AS DOUBLE), 2) AS supplier_balance
      FROM supplier GROUP BY 1
    )
    SELECT n.n_name,
           coalesce(c.customer_balance, 0.0) AS customer_balance,
           coalesce(s.supplier_balance, 0.0) AS supplier_balance
    FROM nation n
    LEFT JOIN c ON c.nk = n.n_nationkey
    LEFT JOIN s ON s.nk = n.n_nationkey
    """,
    "per-nation balance sheet: DECIMAL-exact customer vs supplier "
    "account totals side by side, every nation present (left joins "
    "off the dimension) — the two-sided exposure table",
)
def q_q_nation_balance_sheet(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cb = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("customer_balance")
    )
    sb = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.round(
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("supplier_balance")
    )
    return (
        n.join(cb, n.n_nationkey == cb.nk, "left")
        .join(sb, n.n_nationkey == sb.nk, "left")
        .select(
            "n_name",
            F.coalesce("customer_balance", F.lit(0.0)).alias(
                "customer_balance"
            ),
            F.coalesce("supplier_balance", F.lit(0.0)).alias(
                "supplier_balance"
            ),
        )
    )


@stage(
    "q_events_top2_type_mix",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type) AS rnk
      FROM c
    )
    SELECT a.event_type AS primary_type, b.event_type AS secondary_type,
           count(*) AS n_users
    FROM r a JOIN r b
      ON b.user_id = a.user_id AND a.rnk = 1 AND b.rnk = 2
    GROUP BY 1, 2
    """,
    "behavioural pairing: each user's top-2 event types (count-ranked "
    "with a type tie-break) crossed into a (primary, secondary) "
    "matrix — the persona grid; integer ranks",
)
def q_q_events_top2_type_mix(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    r = c.withColumn("rnk", F.row_number().over(w))
    a = r.where(F.col("rnk") == 1).select(
        "user_id", F.col("event_type").alias("primary_type")
    )
    b = r.where(F.col("rnk") == 2).select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("secondary_type"),
    )
    return (
        a.join(b, a.user_id == b.u2)
        .groupBy("primary_type", "secondary_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
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
    "ts_cascade_count_conservation": ("tier1_input_slots",),
    "q_supplier_line_share": ("share_ppm",),
    "q_events_props_coverage": ("n_null", "n_parse_ok",),
    "render_band_coverage": ("n_in_band",),
    "q_lineitem_flag_status_matrix": ("total_qty",),
    "text_lang_source_matrix": ("total_chars",),
    "emb_large_coord_counts": ("n_large_coords",),
    "q_events_signup_sameday_purchase": ("n_sameday_buyers",),
    "ts_integer_value_share": ("n_whole", "whole_ppm",),
    "q_events_back_to_back": ("n_rapid",),
    "q_ship_before_order_audit": ("n_ship_before_order", "n_same_day_ship",),
    "q_intranation_trade_share": ("n_domestic", "domestic_ppm",),
    "sketch_histogram_clip_audit": ("n_values", "n_underflow", "n_overflow",),
    "text_alpha_only_share": ("n_alpha_only",),
    "sketch_cms_depth_sensitivity": ("total_overcount",),
}
apply_bigint_casts(STAGED_R13, _BIGINT_CASTS)
