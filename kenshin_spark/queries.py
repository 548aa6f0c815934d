"""The driver-contract query registry.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) appears
here as a named query: a Spark implementation ``(spark, sf_dir) →
DataFrame`` paired with an ANSI-SQL oracle string DuckDB runs on the same
parquet. Column names AND value representations match exactly — the driver
hash-compares them.

Cross-engine float discipline:
- raw passthrough doubles are left untouched (bit-identical in parquet);
- money-style sums go through DECIMAL so the arithmetic is exact integer
  math in both engines, then CAST to DOUBLE (identical conversion);
- small-group avgs / cosines are rounded to 6dp (fp noise ≪ 1e-10);
- all hashing is the portable md5-prefix-as-BIGINT (verified bit-equal).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_spark.config import Schema, SchemaSet, propagation_timeunit
from kenshin_spark.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from kenshin_spark.dedup.simhash import N_BITS
from kenshin_spark.engine import KenshinEngine
from kenshin_spark.functions.hashing import shard_of
from kenshin_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint_md5,
    language_id,
    marker_regex,
    quality_columns,
    token_count,
)
from kenshin_spark.io import load_table
from kenshin_spark.multimodal import attach_fake_payload, image_metadata
from kenshin_spark.operators.align import last_write_wins
from kenshin_spark.operators.downsample import downsample, ready_propagation_slots
from kenshin_spark.operators.fetch import grid_fill, select_archive
from kenshin_spark.operators.maintenance import (
    index_rebuild,
    metric_delete,
    metric_search,
)
from kenshin_spark.operators.merge import merge_series
from kenshin_spark.similarity import brute_force_topk, lsh_topk
from kenshin_spark.sources.line_protocol import events_as_points, parse_metric_lines


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs the weaker rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

#: events → the engine's point model (FIXTURES.md §6), DuckDB side
PTS = """
  SELECT event_type AS metric,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         value,
         event_id AS arrival
  FROM events
"""

#: scalar "now" = newest event, DuckDB side
NOW_T = "SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS now FROM events"

#: W5 aligned last-write-wins at 60 s, DuckDB side
LWW60 = """
  SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
  FROM pts GROUP BY 1, 2
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_points(load_table(spark, sf_dir, "events"))


def _now(points: DataFrame) -> int:
    return int(points.agg(F.max("ts")).collect()[0][0])


#: the engine schema used by the time-series queries below
TS_SCHEMA = Schema.from_strings(
    "events", ".*", "60s:1d,300s:7d,3600s:90d", xff=20.0, agg_method="average",
    cache_retention=600,
)

ROUTING_SCHEMAS = SchemaSet(
    (
        Schema.from_strings("errors", "^error", "10s:12h,60s:2d", xff=20.0,
                            agg_method="sum"),
        Schema.from_strings("conversion", "^(purchase|signup)$", "60s:7d",
                            xff=20.0, agg_method="sum"),
        Schema.from_strings("traffic", "^(click|view)", "10s:1d,300s:30d",
                            xff=20.0, agg_method="average"),
    )
)


# ---------------------------------------------------------------------------
# Time-series engine queries (SURVEY §2.2-2.6)
# ---------------------------------------------------------------------------


@register(
    "ts_align_lww",
    f"WITH pts AS ({PTS}) {LWW60}",
    "W5 — align ts to 60s slots, last-write-wins by arrival "
    "(kenshin/storage.py:427-445, rurouni/cache.py:264-280)",
)
def q_ts_align_lww(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")


@register(
    "ts_tag_filter",
    f"""
    WITH pts AS (
      SELECT event_type || ';shard=' || CAST(user_id % 4 AS VARCHAR)
               AS metric,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts,
             value, event_id AS arrival
      FROM events
    )
    SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
    FROM pts
    WHERE regexp_extract(metric, ';shard=([^;]*)', 1) = '2'
    GROUP BY 1, 2
    """,
    "key/value series tags (SURVEY §1.1; Graphite 1.1 tagged-series "
    "syntax, reference series names tests/test_storage.py:42-45): the "
    "full tagged string is the series identity; tags project out as a "
    "MAP<STRING,STRING> via str_to_map (pure JVM) and the tag filter "
    "prunes the metric set BEFORE the LWW align",
)
def q_ts_tag_filter(spark, sf_dir):
    from kenshin_spark.functions.tags import metrics_matching_tags

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit(";shard="),
            (F.col("user_id") % 4).cast("string"),
        ).alias("metric"),
        F.unix_timestamp("ts").cast("long").alias("ts"),
        "value",
        F.col("event_id").alias("arrival"),
    )
    # catalog-style lookup: tag match selects the series set, then the
    # (broadcastable) set prunes the point stream before aggregation
    wanted = metrics_matching_tags(
        pts.select("metric").distinct(), {"shard": "2"}
    )
    return last_write_wins(
        pts.join(F.broadcast(wanted), "metric"), 60, arrival_col="arrival"
    )


@register(
    "ts_tag_catalog",
    """
    WITH m AS (
      SELECT DISTINCT event_type || ';env='
             || CASE WHEN user_id % 2 = 0 THEN 'prod' ELSE 'dev' END
             || ';shard=' || CAST(user_id % 4 AS VARCHAR) AS metric
      FROM events
    ),
    kv AS (
      SELECT metric, 'env' AS tag_key,
             regexp_extract(metric, ';env=([^;]*)', 1) AS tag_value FROM m
      UNION ALL
      SELECT metric, 'shard',
             regexp_extract(metric, ';shard=([^;]*)', 1) FROM m
    )
    SELECT tag_key, tag_value, count(*) AS n_series
    FROM kv GROUP BY 1, 2
    """,
    "tag catalog (the Graphite /tags autocomplete API): every tag key/"
    "value with its series count, from exploding the str_to_map tag "
    "projection over the distinct series set — catalog-sized input, not "
    "the point stream",
)
def q_ts_tag_catalog(spark, sf_dir):
    from kenshin_spark.functions.tags import series_tags

    ev = load_table(spark, sf_dir, "events")
    metrics = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit(";env="),
            F.when(F.col("user_id") % 2 == 0, "prod").otherwise("dev"),
            F.lit(";shard="),
            (F.col("user_id") % 4).cast("string"),
        ).alias("metric")
    ).distinct()
    return (
        metrics.select(
            F.explode(series_tags("metric")).alias("tag_key", "tag_value")
        )
        .groupBy("tag_key", "tag_value")
        .agg(F.count("*").alias("n_series"))
    )


@register(
    "ts_agg_kernel",
    f"""
    WITH pts AS ({PTS})
    SELECT metric, ts - ts % 300 AS ts,
           round(avg(value), 6) AS avg_value,
           round(sum(value), 6) AS sum_value,
           arg_max(value,
                   CASE WHEN value IS NOT NULL
                        THEN ts * 1000000 + arrival END) AS last_value,
           max(value) AS max_value,
           min(value) AS min_value,
           count(value) AS n_points
    FROM pts GROUP BY 1, 2
    """,
    "W9/A1-A5 — the complete aggregation kernel (kenshin/agg.py:9-36) over "
    "300s windows; NULL-ignoring semantics are Spark/DuckDB built-ins",
)
def q_ts_agg_kernel(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return (
        pts.groupBy("metric", (F.col("ts") - F.col("ts") % 300).alias("ts"))
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.expr(
                "max_by(value, CASE WHEN value IS NOT NULL"
                " THEN ts * 1000000 + arrival END)"
            ).alias("last_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count("value").alias("n_points"),
        )
    )


@register(
    "ts_downsample_tier1",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
    FROM t0 GROUP BY 1, 2
    """,
    "W7 — write-time downsample: tier1(300s avg) over tier0(60s LWW), the "
    "propagation chain of kenshin/storage.py:482-586",
)
def q_ts_downsample_tier1(spark, sf_dir):
    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return downsample(t0, 300, "average").withColumn("value", F.round("value", 6))


@register(
    "ts_downsample_cascade",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    t1 AS (
      SELECT metric, ts - ts % 300 AS ts, avg(value) AS value
      FROM t0 GROUP BY 1, 2
    )
    SELECT metric, ts - ts % 3600 AS ts, round(avg(value), 6) AS value
    FROM t1 GROUP BY 1, 2
    """,
    "W7 cascade — tier2(1h) aggregates tier1's *points* (avg of avgs), "
    "exactly like the reference propagates archive→archive",
)
def q_ts_downsample_cascade(spark, sf_dir):
    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    t1 = downsample(t0, 300, "average")
    return downsample(t1, 3600, "average").withColumn("value", F.round("value", 6))


@register(
    "ts_asof_join",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    t1 AS (
      SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
      FROM t0 GROUP BY 1, 2
    ),
    l AS (SELECT metric, ts, value FROM pts),
    j AS (
      SELECT l.metric, l.ts, l.value, r.ts AS rts, r.value AS rvalue
      FROM l ASOF LEFT JOIN t1 r
        ON l.metric = r.metric AND l.ts >= r.ts
    )
    SELECT metric, ts, value,
           CASE WHEN ts - rts <= 900 THEN rts END AS ts_right,
           CASE WHEN ts - rts <= 900 THEN rvalue END AS value_right
    FROM j
    """,
    "As-of join: every raw point annotated with the most recent tier-1 "
    "(300s) rollup at-or-before it, tolerance 900s — union-tag + window "
    "carry-forward (ONE shuffle, no range-join explosion); the oracle is "
    "DuckDB's native ASOF LEFT JOIN",
)
def q_ts_asof_join(spark, sf_dir):
    from kenshin_spark.operators.asof import asof_join

    pts = _points(spark, sf_dir).select("metric", "ts", "value")
    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    t1 = downsample(t0, 300, "average").withColumn("value", F.round("value", 6))
    return asof_join(pts, t1, tolerance=900)


@register(
    "ts_fetch_grid",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    bounds AS (
      SELECT ((now - 21600 + 299) // 300) * 300 AS from_r,
             ((now + 299) // 300) * 300 AS until_r
      FROM now_t
    ),
    tier1 AS (
      SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
      FROM pts GROUP BY 1, 2
    ),
    grid AS (
      SELECT m.metric,
             unnest(generate_series(b.from_r, b.until_r - 300, 300)) AS ts
      FROM (SELECT DISTINCT metric FROM pts) m, bounds b
    )
    SELECT g.metric, g.ts, t.value
    FROM grid g LEFT JOIN tier1 t ON g.metric = t.metric AND g.ts = t.ts
    """,
    "R3 — regular-grid materialization with NULL fill "
    "(kenshin/storage.py:646-694): last 6h on the 300s grid",
)
def q_ts_fetch_grid(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = _now(pts)
    tier1 = downsample(pts, 300, "average").withColumn("value", F.round("value", 6))
    metrics = pts.select("metric").distinct()
    return grid_fill(tier1, metrics, now - 21600, now, 300)


@register(
    "ts_tier_selection",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    t0 AS ({LWW60}),
    t1 AS (
      SELECT metric, ts - ts % 300 AS ts, avg(value) AS value
      FROM t0 GROUP BY 1, 2
    )
    SELECT metric, ts, round(value, 6) AS value, CAST(300 AS BIGINT) AS step
    FROM t1, now_t
    WHERE ts >= now - 259200 AND ts <= now
    """,
    "R2 — archive selection by query *age* (kenshin/storage.py:639-642): a "
    "3-day-old from_time selects the 300s tier on this policy",
)
def q_ts_tier_selection(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = _now(pts)
    age = 259200  # 3 days → planner must choose tier1 (300s, 7d retention)
    idx = select_archive(list(TS_SCHEMA.archives), now - age, now)
    assert idx == 1, "planner should pick tier1 for a 3-day query age"
    step = TS_SCHEMA.archives[idx].sec_per_point
    t0 = last_write_wins(pts, 60, arrival_col="arrival")
    t1 = downsample(t0, step, "average")
    return (
        t1.where((F.col("ts") >= now - age) & (F.col("ts") <= now))
        .select(
            "metric", "ts", F.round("value", 6).alias("value"),
            F.lit(step).cast("long").alias("step"),
        )
    )


@register(
    "ts_retention_expiry",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}), t0 AS ({LWW60})
    SELECT metric, count(*) AS n_live, min(ts) AS min_ts, max(ts) AS max_ts
    FROM t0, now_t
    WHERE t0.ts >= now_t.now - 86400 AND t0.ts <= now_t.now
    GROUP BY metric
    """,
    "O4 — retention expiry: tier0 keeps 1 day; at scale this is a "
    "partition drop, here the surviving-rows predicate",
)
def q_ts_retention_expiry(spark, sf_dir):
    from kenshin_spark.operators.retention import apply_retention

    pts = _points(spark, sf_dir)
    now = _now(pts)
    t0 = last_write_wins(pts, 60, arrival_col="arrival")
    live = apply_retention(t0, TS_SCHEMA.archives[0], now)
    return live.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "ts_schema_match",
    f"""
    WITH m AS (SELECT DISTINCT event_type AS metric FROM events)
    SELECT metric, {ROUTING_SCHEMAS.match_sql_case('metric', 'regexp_matches')}
           AS schema_name
    FROM m
    """,
    "P5 — first-regex-wins retention-policy routing "
    "(rurouni/storage.py:196-210), rendered as a JVM-side CASE chain",
)
def q_ts_schema_match(spark, sf_dir):
    metrics = _points(spark, sf_dir).select("metric").distinct()
    return metrics.withColumn(
        "schema_name",
        F.expr(ROUTING_SCHEMAS.match_sql_case("metric", "regexp_like")),
    )


@register(
    "ts_index_rebuild",
    f"""
    WITH pts AS ({PTS})
    SELECT metric, count(value) AS point_count, min(ts) AS min_ts,
           max(ts) AS max_ts,
           {ROUTING_SCHEMAS.match_sql_case('metric', 'regexp_matches')}
           AS schema_name
    FROM pts GROUP BY metric
    """,
    "M1/R9 — rebuild the metrics dim table from the points table "
    "(rurouni/storage.py:56-77, bin/kenshin-info.py)",
)
def q_ts_index_rebuild(spark, sf_dir):
    return index_rebuild(_points(spark, sf_dir), ROUTING_SCHEMAS)


@register(
    "ts_metric_search",
    """
    SELECT DISTINCT event_type AS metric FROM events
    WHERE regexp_matches(event_type, '^(click|error)$')
       OR regexp_matches(event_type, 'chase')
    """,
    "M4 — regex metric search (bin/kenshin-get-metrics.py:8-30)",
)
def q_ts_metric_search(spark, sf_dir):
    return metric_search(_points(spark, sf_dir), ["^(click|error)$", "chase"])


@register(
    "ts_metric_delete",
    f"""
    WITH pts AS ({PTS})
    SELECT metric, count(*) AS n_points FROM pts
    WHERE metric NOT IN ('signup', 'view')
    GROUP BY metric
    """,
    "M5 — metric delete (bin/kenshin-delete.py:39-96): surviving rows",
)
def q_ts_metric_delete(spark, sf_dir):
    survivors = metric_delete(_points(spark, sf_dir), ["signup", "view"])
    return survivors.groupBy("metric").agg(F.count(F.lit(1)).alias("n_points"))


@register(
    "ts_merge_series",
    f"""
    WITH pts AS ({PTS}),
    p AS (
      SELECT metric, ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    a AS (SELECT metric, ts, value FROM p WHERE ts % 2 = 0),
    b AS (SELECT metric, ts, value * 2 AS value FROM p)
    SELECT COALESCE(a.metric, b.metric) AS metric,
           COALESCE(a.ts, b.ts) AS ts,
           COALESCE(a.value, b.value) AS value
    FROM a FULL OUTER JOIN b ON a.metric = b.metric AND a.ts = b.ts
    """,
    "S7 — merge metric sources, earlier source wins on collisions "
    "(bin/kenshin-rehash.py:103-214); sources pre-deduped per (metric, ts)",
)
def q_ts_merge_series(spark, sf_dir):
    pts = _points(spark, sf_dir)
    p = pts.groupBy("metric", "ts").agg(
        F.expr("max_by(value, arrival)").alias("value")
    )
    a = p.where(F.col("ts") % 2 == 0).select("metric", "ts", "value")
    b = p.select("metric", "ts", (F.col("value") * 2).alias("value"))
    return merge_series([a, b], prefer_first=True)


@register(
    "ts_line_protocol",
    f"WITH pts AS ({PTS}) SELECT metric, ts, value FROM pts",
    "S1 — line-protocol parse round-trip (rurouni/protocols.py:31-42): "
    "well-formed lines parse back exactly; malformed lines drop to the "
    "dead-letter column (oracle = the original points)",
)
def q_ts_line_protocol(spark, sf_dir):
    pts = _points(spark, sf_dir)
    lines = pts.select(
        F.concat_ws(
            " ",
            F.col("metric"),
            F.col("value").cast("string"),
            F.col("ts").cast("string"),
        ).alias("line")
    )
    corrupt = pts.sparkSession.createDataFrame(
        [("garbage",), ("a b",), ("x 1 2 3",), ("   ",), ("m nan_v 12",)],
        ["line"],
    )
    from kenshin_spark.dedup.fanout import fan_out

    parsed = parse_metric_lines(
        fan_out(lines).unionByName(corrupt), line_col="line"
    )
    return parsed.where(F.col("corrupt").isNull()).select("metric", "ts", "value")


_FNV_ORACLE = """
    WITH RECURSIVE names AS (SELECT DISTINCT event_type AS metric FROM events),
    h AS (
      SELECT metric, 1 AS i, CAST(2166136261 AS BIGINT) AS hash FROM names
      UNION ALL
      SELECT metric, i + 1,
             (xor(hash, CAST(unicode(substr(metric, i, 1)) AS BIGINT))
              * 16777619) % 4294967296
      FROM h WHERE i <= length(metric)
    ),
    final AS (SELECT metric, hash FROM h WHERE i = length(metric) + 1),
    signed AS (
      SELECT metric,
             CASE WHEN hash >= 2147483648 THEN hash - 4294967296
                  ELSE hash END AS h32
      FROM final
    )
    SELECT metric, CAST(((h32 % 8) + 8) % 8 AS BIGINT) AS shard FROM signed
"""


@register(
    "ts_shard_routing",
    _FNV_ORACLE,
    "P1/P2 — fnv1a-32 instance sharding (rurouni/fnv1a.pyx:6-23, "
    "rurouni/utils.py:107-108); the oracle recomputes fnv1a in recursive "
    "SQL, so placement is verified bit-for-bit",
)
def q_ts_shard_routing(spark, sf_dir):
    metrics = _points(spark, sf_dir).select("metric").distinct()
    return metrics.select(
        "metric", shard_of("metric", 8).cast("long").alias("shard")
    )


@register(
    "ts_propagation_ready",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    slots AS (SELECT DISTINCT metric, ts - ts % 300 AS slot_ts FROM pts)
    SELECT metric, slot_ts FROM slots, now_t
    WHERE slot_ts + 300 <= now - now % 6000
    """,
    "W8 — xff propagation batching (kenshin/storage.py:505-521): which "
    "300s slots a 60s→300s cascade with xff=20 (timeunit 6000s) would "
    "propagate as of `now`",
)
def q_ts_propagation_ready(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = _now(pts)
    assert propagation_timeunit(20.0, 60, 300) == 6000
    return ready_propagation_slots(pts, 60, 300, 20.0, now)


@register(
    "ts_hot_cold_union",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    cold AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts, now_t WHERE pts.ts < now_t.now - 600 GROUP BY 1, 2
    ),
    hot AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts, now_t WHERE pts.ts >= now_t.now - 720 GROUP BY 1, 2
    )
    SELECT COALESCE(h.metric, c.metric) AS metric,
           COALESCE(h.ts, c.ts) AS ts,
           COALESCE(h.value, c.value) AS value
    FROM hot h FULL OUTER JOIN cold c ON h.metric = c.metric AND h.ts = c.ts
    """,
    "S3/§3.3 — hot(unflushed) ∪ cold fetch merge with hot winning on "
    "overlap (rurouni/cache.py:161-169 + graphite-side merge)",
)
def q_ts_hot_cold_union(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = _now(pts)
    eng = KenshinEngine(TS_SCHEMA)
    cold = last_write_wins(
        pts.where(F.col("ts") < now - 600), 60, arrival_col="arrival"
    )
    hot = last_write_wins(
        pts.where(F.col("ts") >= now - 720), 60, arrival_col="arrival"
    )
    return eng.fetch_union(cold, hot)


@register(
    "render_moving_average",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           round(avg(value) OVER (
             PARTITION BY metric ORDER BY ts
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS value
    FROM t0
    """,
    "graphite movingAverage(series, 3) over tier0 — trailing-window mean, "
    "NULL-ignoring in both engines (render layer, README.md:73-75)",
)
def q_render_moving_average(spark, sf_dir):
    from kenshin_spark.functions.render import moving_average

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return moving_average(t0, 3).withColumn("value", F.round("value", 6))


@register(
    "render_moving_median",
    f"""
    WITH pts AS ({{PTS}}), t0 AS ({{LWW60}})
    SELECT metric, ts,
           round(median(value) OVER (
             PARTITION BY metric ORDER BY ts
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 6) AS value
    FROM t0
    """.format(PTS=PTS, LWW60=LWW60),
    "graphite movingMedian(series, 5) over tier0 — EXACT trailing-window "
    "median (percentile, not approx_percentile: the render layer feeds "
    "alerts), NULL-ignoring, interpolating even counts like quantile_cont",
)
def q_render_moving_median(spark, sf_dir):
    from kenshin_spark.functions.render import moving_median

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return moving_median(t0, 5).withColumn("value", F.round("value", 6))


@register(
    "render_time_shift",
    f"""
    WITH pts AS ({{PTS}}), t0 AS ({{LWW60}})
    SELECT a.metric, a.ts, a.value, b.value AS value_shifted,
           round(a.value - b.value, 6) AS delta
    FROM t0 a LEFT JOIN t0 b
      ON a.metric = b.metric AND b.ts = a.ts - 86400
    """.format(PTS=PTS, LWW60=LWW60),
    "graphite timeShift(series, '1d') overlay: today's slot joined to "
    "yesterday's (same-key self-join — co-partitioned, no extra shuffle "
    "beyond the tier0 alignment) with the day-over-day delta",
)
def q_render_time_shift(spark, sf_dir):
    from kenshin_spark.functions.render import time_shift

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    shifted = time_shift(t0, 86400).withColumnRenamed("value", "value_shifted")
    return (
        t0.join(shifted, ["metric", "ts"], "left")
        .select(
            "metric",
            "ts",
            "value",
            "value_shifted",
            F.round(F.col("value") - F.col("value_shifted"), 6).alias("delta"),
        )
    )


@register(
    "ts_seasonal_profile",
    f"""
    WITH pts AS ({{PTS}}), t0 AS ({{LWW60}})
    SELECT metric,
           CAST(floor((ts % 86400) / 3600) AS BIGINT) AS bucket_of_period,
           round(avg(value), 6) AS mean_value,
           CAST(count(value) AS BIGINT) AS n_slots
    FROM t0 GROUP BY 1, 2
    """.format(PTS=PTS, LWW60=LWW60),
    "per-metric hour-of-day seasonal baseline over tier0 — the "
    "de-seasoning companion to ts_anomaly_zscore; 24 buckets/metric "
    "regardless of history length, so the profile broadcasts",
)
def q_ts_seasonal_profile(spark, sf_dir):
    from kenshin_spark.functions.render import seasonal_profile

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return seasonal_profile(t0)


@register(
    "render_derivative",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           round(value - lag(value) OVER (
             PARTITION BY metric ORDER BY ts
           ), 6) AS value
    FROM t0
    """,
    "graphite derivative(series) over tier0 — per-slot delta via lag",
)
def q_render_derivative(spark, sf_dir):
    from kenshin_spark.functions.render import derivative

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return derivative(t0).withColumn("value", F.round("value", 6))


@register(
    "render_keep_last_value",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    bounds AS (
      SELECT ((now - 21600 + 299) // 300) * 300 AS from_r,
             ((now + 299) // 300) * 300 AS until_r
      FROM now_t
    ),
    tier1 AS (
      SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
      FROM pts GROUP BY 1, 2
    ),
    grid AS (
      SELECT m.metric,
             unnest(generate_series(b.from_r, b.until_r - 300, 300)) AS ts
      FROM (SELECT DISTINCT metric FROM pts) m, bounds b
    ),
    g AS (
      SELECT g.metric, g.ts, t.value
      FROM grid g LEFT JOIN tier1 t ON g.metric = t.metric AND g.ts = t.ts
    )
    SELECT metric, ts,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY metric ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value
    FROM g
    """,
    "graphite keepLastValue over a NULL-filled fetch grid — forward fill "
    "via last_value IGNORE NULLS (composes render on top of R3)",
)
def q_render_keep_last_value(spark, sf_dir):
    from kenshin_spark.functions.render import keep_last_value

    pts = _points(spark, sf_dir)
    now = _now(pts)
    tier1 = downsample(pts, 300, "average").withColumn(
        "value", F.round("value", 6)
    )
    metrics = pts.select("metric").distinct()
    grid = grid_fill(tier1, metrics, now - 21600, now, 300)
    return keep_last_value(grid)


@register(
    "render_interpolate",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    bounds AS (
      SELECT ((now - 21600 + 299) // 300) * 300 AS from_r,
             ((now + 299) // 300) * 300 AS until_r
      FROM now_t
    ),
    tier1 AS (
      SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
      FROM pts GROUP BY 1, 2
    ),
    grid AS (
      SELECT m.metric,
             unnest(generate_series(b.from_r, b.until_r - 300, 300)) AS ts
      FROM (SELECT DISTINCT metric FROM pts) m, bounds b
    ),
    g AS (
      SELECT g.metric, g.ts, t.value
      FROM grid g LEFT JOIN tier1 t ON g.metric = t.metric AND g.ts = t.ts
    ),
    scans AS (
      SELECT metric, ts, value,
             last_value(value IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN value IS NOT NULL THEN ts END
                        IGNORE NULLS) OVER wb AS prev_t,
             first_value(value IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN value IS NOT NULL THEN ts END
                         IGNORE NULLS) OVER wf AS next_t
      FROM g
      WINDOW wb AS (PARTITION BY metric ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY metric ORDER BY ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT metric, ts,
           CASE WHEN value IS NOT NULL THEN value
                WHEN prev_t IS NOT NULL AND next_t IS NOT NULL THEN
                  prev_v + (next_v - prev_v) * (ts - prev_t)
                         / (next_t - prev_t)
           END AS value
    FROM scans
    """,
    "graphite interpolate(series): linear fill of interior NULL runs "
    "over a NULL-filled fetch grid — two IGNORE NULLS window scans per "
    "series + a single lerp expression evaluated op-for-op identically "
    "by both engines (no round needed); leading/trailing NULLs stay NULL",
)
def q_render_interpolate(spark, sf_dir):
    from kenshin_spark.functions.render import interpolate

    pts = _points(spark, sf_dir)
    now = _now(pts)
    tier1 = downsample(pts, 300, "average").withColumn(
        "value", F.round("value", 6)
    )
    metrics = pts.select("metric").distinct()
    grid = grid_fill(tier1, metrics, now - 21600, now, 300)
    return interpolate(grid)


@register(
    "render_per_second",
    # NO round(): dv, dt, and dv/dt are computed from identical doubles
    # in identical order in both engines, so the raw quotient is
    # bit-identical — while round() itself diverges at repr boundaries
    # (Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    # binary value; measured one 6th-decimal flip at sf0.01).
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           CASE WHEN value - lag(value) OVER w >= 0
                THEN (value - lag(value) OVER w)
                     / (ts - lag(ts) OVER w) END AS value
    FROM t0
    WINDOW w AS (PARTITION BY metric ORDER BY ts)
    """,
    "graphite perSecond(series) over tier0 — counter delta / time delta, "
    "resets (negative deltas) → NULL",
)
def q_render_per_second(spark, sf_dir):
    from kenshin_spark.functions.render import per_second

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return per_second(t0)


@register(
    "render_integral_top2",
    # the running sum goes through DECIMAL (the repo's money-math
    # discipline): DuckDB evaluates window sums with a segment tree, so
    # a DOUBLE running sum accumulates in a different order than Spark's
    # sequential frame (measured ulp drift); exact decimal math is
    # order-free, with ONE cast back to DOUBLE at the end
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    top2 AS (
      SELECT metric FROM t0
      GROUP BY metric ORDER BY avg(value) DESC, metric LIMIT 2
    )
    SELECT t0.metric, ts,
           CAST(CASE WHEN value IS NOT NULL THEN
             sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY t0.metric ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) END AS DOUBLE) AS value
    FROM t0 JOIN top2 ON t0.metric = top2.metric
    """,
    "graphite integral(highestAverage(series_list, 2)) — series "
    "SELECTION (one aggregate ranks series, the winner set broadcasts "
    "back) composed with the running-sum transform; render functions "
    "compose over the grid contract",
)
def q_render_integral_top2(spark, sf_dir):
    from kenshin_spark.functions.render import highest_average, integral

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    dec = highest_average(t0, 2).withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    return integral(dec).withColumn("value", F.col("value").cast("double"))


@register(
    "render_max_datapoints",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    b AS (
      SELECT min(ts) AS t_lo,
             ((max(ts) - min(ts)) // 60 + 1 + 49) // 50 AS factor
      FROM t0
    )
    SELECT metric,
           t_lo + ((ts - t_lo) // (60 * factor)) * (60 * factor) AS ts,
           max(value) AS value
    FROM t0, b
    GROUP BY 1, 2
    """,
    "Graphite maxDataPoints + consolidateBy(series,'max'): the smallest "
    "multiple of the tier step that fits the window under 50 points, "
    "max-consolidated into buckets anchored at the window start — "
    "pure-integer step derivation and an order-free agg, so the result "
    "is bit-exact cross-engine (avg consolidation exists in the API but "
    "its big-bucket double summation rounds engine-dependently)",
)
def q_render_max_datapoints(spark, sf_dir):
    from kenshin_spark.functions.render import max_datapoints

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    lo, hi = t0.agg(F.min("ts"), F.max("ts")).first()
    return max_datapoints(
        t0, 50, 60, anchor=lo, span_slots=(hi - lo) // 60 + 1, agg="max"
    )


@register(
    "render_percentile_of_series",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT 'percentileOfSeries' AS metric, ts,
           round(quantile_cont(value, 0.9), 6) AS value
    FROM t0 GROUP BY ts
    """,
    "graphite percentileOfSeries(series_list, 90) — pointwise exact "
    "percentile across series; Spark percentile() and DuckDB "
    "quantile_cont share linear interpolation",
)
def q_render_percentile_of_series(spark, sf_dir):
    from kenshin_spark.functions.render import percentile_of_series

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return percentile_of_series(t0, 0.9).withColumn(
        "value", F.round("value", 6)
    )


@register(
    "ts_anomaly_zscore",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    s AS (
      SELECT metric, ts, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd
      FROM t0
      WINDOW w AS (PARTITION BY metric ORDER BY ts
                   ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
    )
    SELECT metric, ts, value,
           round(CASE WHEN sd <> 0 THEN (value - mu) / sd END, 6) AS zscore
    FROM s
    """,
    "trailing-window z-score anomaly scores: each point against the mean/"
    "stddev of its previous 12 slots (current excluded) — one window "
    "shuffle per series",
)
def q_ts_anomaly_zscore(spark, sf_dir):
    from kenshin_spark.functions.render import zscore

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return zscore(t0, 12).withColumn("zscore", F.round("zscore", 6))


@register(
    "ts_level_shift",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    s AS (
      SELECT metric, ts, value,
             avg(value) OVER wt AS m_trail,
             count(value) OVER wt AS n_trail,
             avg(value) OVER wl AS m_lead,
             count(value) OVER wl AS n_lead
      FROM t0
      WINDOW wt AS (PARTITION BY metric ORDER BY ts
                    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
             wl AS (PARTITION BY metric ORDER BY ts
                    ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
    )
    SELECT metric, ts, value,
           round(CASE WHEN n_trail = 6 AND n_lead = 6
                      THEN m_lead - m_trail END, 6) AS shift
    FROM s
    """,
    "level-shift (step-change) score: leading-window mean minus "
    "trailing-window mean per point, NULL until both windows are full — "
    "the sustained-change complement to the z-score spike detector",
)
def q_ts_level_shift(spark, sf_dir):
    from kenshin_spark.functions.render import level_shift

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return level_shift(t0, 6).withColumn("shift", F.round("shift", 6))


@register(
    "ts_metric_correlation",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT a.metric AS metric_a, b.metric AS metric_b,
           round(corr(a.value, b.value), 6) AS r,
           count(*) AS n_slots
    FROM t0 a JOIN t0 b ON a.ts = b.ts AND a.metric < b.metric
    WHERE a.value IS NOT NULL AND b.value IS NOT NULL
    GROUP BY 1, 2
    """,
    "pairwise Pearson correlation between metrics over co-observed "
    "60s slots: grid self-join on ts (shuffle keyed by ts), one corr "
    "aggregate per pair. Pair space is O(M²/2) per slot — this "
    "unrestricted form is the test-scale oracle twin; production calls "
    "operators.correlate.metric_correlation with a targets/glob/seeds "
    "scope that bounds pairs to |scope|²/2 (or |seeds|×M), see its "
    "module docstring and tests/test_ops.py::TestMetricCorrelationScope",
)
def q_ts_metric_correlation(spark, sf_dir):
    from kenshin_spark.operators.correlate import metric_correlation

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return metric_correlation(t0)


@register(
    "ts_debug_discontinuities",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts, prev_ts, gap FROM (
      SELECT metric, ts,
             lag(ts) OVER (PARTITION BY metric ORDER BY ts) AS prev_ts,
             ts - lag(ts) OVER (PARTITION BY metric ORDER BY ts) AS gap
      FROM t0
    ) x WHERE gap IS NOT NULL AND gap <> 60
    """,
    "R10 — the point-level debug scan (bin/kenshin-debug.py:19-61 "
    "--error mode): walk each series and report timestamp "
    "discontinuities (slots where the step isn't the archive step)",
)
def q_ts_debug_discontinuities(spark, sf_dir):
    from pyspark.sql import Window

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    w = Window.partitionBy("metric").orderBy("ts")
    return (
        t0.select(
            "metric",
            "ts",
            F.lag("ts").over(w).alias("prev_ts"),
            (F.col("ts") - F.lag("ts").over(w)).alias("gap"),
        )
        .where(F.col("gap").isNotNull() & (F.col("gap") != 60))
    )


@register(
    "ts_pickle_roundtrip",
    f"WITH pts AS ({PTS}) SELECT metric, ts, value FROM pts",
    "S2 — pickle batch source (rurouni/protocols.py:45-62): points packed "
    "into the reference's wire format, shipped as binary blobs, unpacked "
    "by the Arrow-batched mapInPandas deserializer; oracle = the original "
    "points (lossless roundtrip), corrupt blobs dropped",
)
def q_ts_pickle_roundtrip(spark, sf_dir):
    from kenshin_spark.sources.pickle_batch import (
        pack_points_to_batches,
        parse_pickle_batches,
    )

    pts = _points(spark, sf_dir).select("metric", "ts", "value")
    # distributed pack (applyInPandas) — no driver-side materialization
    blobs = pack_points_to_batches(pts, batch_size=500)
    corrupt = spark.createDataFrame(
        [(bytearray(b"not a pickle"),)], "payload binary"
    )
    return parse_pickle_batches(blobs.unionByName(corrupt))


# ---------------------------------------------------------------------------
# Analytical queries (the engine's general DataFrame/SQL surface — exposed
# "for free" per SURVEY §2.7, and the bench headliners)
# ---------------------------------------------------------------------------

#: money math goes through DECIMAL so both engines do exact integer
#: arithmetic, then one identical decimal→double conversion at the end.
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
)

Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum({_DISC_PRICE}) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(sum({_DISC_PRICE} * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE), 2) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

Q3_SQL = f"""
SELECT l_orderkey,
  round(CAST(sum({_DISC_PRICE}) AS DOUBLE), 2) AS revenue,
  CAST(o_orderdate AS STRING) AS o_orderdate,
  o_orderpriority
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

Q5_SQL = f"""
SELECT n_name,
  round(CAST(sum({_DISC_PRICE}) AS DOUBLE), 2) AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

TOPK_SQL = """
SELECT n_name, c_custkey, c_acctbal, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT n.n_name, c.c_custkey, c.c_acctbal,
         row_number() OVER (
           PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey
         ) AS rnk
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) t WHERE rnk <= 3
"""

EVENTS_DAILY_SQL = """
SELECT event_type, CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) AS day,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type, date_trunc('day', ts)
"""

Q6_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2)
         AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""

Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       round(CAST(sum({_DISC_PRICE}) AS DOUBLE), 2) AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t GROUP BY c_count
"""

Q14_SQL = """
SELECT round(
  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
       (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
    AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""

Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS STRING) AS o_orderdate,
       round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_qty
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
"""

ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

SESSIONS_SQL = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       max(ts) - min(ts) AS duration_s
FROM sessions GROUP BY user_id, session_id
"""


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""

Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
           AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

Q16_SQL = """
SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT)
         AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 9, 19, 29, 39, 49)
GROUP BY p_brand, p_size
"""

Q19_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
       AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)
"""


def _sql_query(sql: str, tables: tuple[str, ...]):
    """Build a queries() callable that registers the needed views and runs
    the SAME SQL text Catalyst and DuckDB both accept."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return fn


QUERIES["q1_pricing_summary"] = QuerySpec(
    fn=_sql_query(Q1_SQL, ("lineitem",)),
    oracle=Q1_SQL,
    doc="TPC-H Q1-style pricing summary — groupBy agg over the fact table; "
    "exact DECIMAL money math, identical SQL on both engines",
)
QUERIES["q3_shipping_priority"] = QuerySpec(
    fn=_sql_query(Q3_SQL, ("customer", "orders", "lineitem")),
    oracle=Q3_SQL,
    doc="TPC-H Q3-style: 3-way join + agg + deterministic top-10",
)
QUERIES["q5_local_supplier"] = QuerySpec(
    fn=_sql_query(Q5_SQL, ("customer", "orders", "lineitem", "supplier",
                           "nation", "region")),
    oracle=Q5_SQL,
    doc="TPC-H Q5-style: 6-way join with co-nation predicate",
)
QUERIES["q4_late_orders"] = QuerySpec(
    fn=_sql_query(Q4_SQL, ("orders", "lineitem")),
    oracle=Q4_SQL,
    doc="TPC-H Q4-style: EXISTS semi-join (orders with a late-shipped "
    "line) + priority counts — Catalyst plans a left-semi hash join",
)
QUERIES["q7_nation_volume"] = QuerySpec(
    fn=_sql_query(
        Q7_SQL, ("lineitem", "orders", "customer", "supplier", "nation")
    ),
    oracle=Q7_SQL,
    doc="TPC-H Q7-style: bidirectional two-nation shipping volume by "
    "year; nation dims broadcast, fact table never shuffles for the dims",
)
QUERIES["q16_supplier_cnt"] = QuerySpec(
    fn=_sql_query(Q16_SQL, ("part", "lineitem")),
    oracle=Q16_SQL,
    doc="TPC-H Q16-style: distinct-supplier counts per brand/size bucket "
    "(multi-distinct agg over a dim join)",
)
QUERIES["q19_disjunctive"] = QuerySpec(
    fn=_sql_query(Q19_SQL, ("lineitem", "part")),
    oracle=Q19_SQL,
    doc="TPC-H Q19-style: three OR-blocks of brand/size/quantity "
    "predicates — exercises disjunctive predicate pushdown",
)
QUERIES["q_window_topk_customers"] = QuerySpec(
    fn=_sql_query(TOPK_SQL, ("customer", "nation")),
    oracle=TOPK_SQL,
    doc="window functions: per-nation top-3 customers by balance",
)
QUERIES["q_events_daily"] = QuerySpec(
    fn=_sql_query(EVENTS_DAILY_SQL, ("events",)),
    oracle=EVENTS_DAILY_SQL,
    doc="event-stream daily rollup: counts, distinct users, value sums",
)
QUERIES["q6_forecast_revenue"] = QuerySpec(
    fn=_sql_query(Q6_SQL, ("lineitem",)),
    oracle=Q6_SQL,
    doc="TPC-H Q6-style: tight multi-predicate scan + scalar agg — the "
    "pushdown showcase (all three filters reach the parquet scan)",
)
QUERIES["q10_returned_items"] = QuerySpec(
    fn=_sql_query(Q10_SQL, ("customer", "orders", "lineitem", "nation")),
    oracle=Q10_SQL,
    doc="TPC-H Q10-style: returned-item revenue per customer, top-20",
)
QUERIES["q13_order_distribution"] = QuerySpec(
    fn=_sql_query(Q13_SQL, ("customer", "orders")),
    oracle=Q13_SQL,
    doc="TPC-H Q13-style: outer join + double aggregation (count "
    "distribution of orders per customer, including zero-order customers)",
)
QUERIES["q14_promo_effect"] = QuerySpec(
    fn=_sql_query(Q14_SQL, ("lineitem", "part")),
    oracle=Q14_SQL,
    doc="TPC-H Q14-style: promo revenue share, conditional agg over a join",
)
QUERIES["q18_large_orders"] = QuerySpec(
    fn=_sql_query(Q18_SQL, ("customer", "orders", "lineitem")),
    oracle=Q18_SQL,
    doc="TPC-H Q18-style: HAVING on a grouped join (large-volume orders)",
)
QUERIES["q_rollup_orders"] = QuerySpec(
    fn=_sql_query(ROLLUP_SQL, ("orders",)),
    oracle=ROLLUP_SQL,
    doc="GROUP BY ROLLUP (status, priority) with subtotal + grand-total "
    "rows — grouping-sets surface the reference never had (SURVEY §2.7)",
)
QUERIES["q_event_sessions"] = QuerySpec(
    # identical SQL except each engine's epoch-seconds function
    fn=_sql_query(
        SESSIONS_SQL.replace("floor(epoch(ts))", "unix_timestamp(ts)"),
        ("events",),
    ),
    oracle=SESSIONS_SQL,
    doc="event sessionization: 30-min-gap session ids via lag + running "
    "sum windows, then per-session stats — the classic stream-analytics "
    "pattern over the events table",
)


_PROFILE_NUM = ("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
_PROFILE_TXT = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM + _PROFILE_TXT:
        lo, hi = (
            (
                f"CAST(CAST(min({c}) AS DECIMAL(18,2)) AS VARCHAR)",
                f"CAST(CAST(max({c}) AS DECIMAL(18,2)) AS VARCHAR)",
            )
            if c in _PROFILE_NUM
            else (f"min({c})", f"max({c})")
        )
        parts.append(
            f"""SELECT '{c}' AS col_name,
              CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_nulls,
              CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
              {lo} AS min_value, {hi} AS max_value
            FROM lineitem"""
        )
    return "\nUNION ALL\n".join(parts)


def _q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profiler (the data-quality step every ingestion
    pipeline runs before training): nulls, exact distinct counts, and
    min/max — ONE sub-aggregate per column, unioned.

    Why not one multi-distinct aggregate: six ``count_distinct`` columns
    in a single agg make Catalyst expand to grouping-id form — an Expand
    that multiplies the full scan ×7 before the exchange (measured 14 s
    at sf0.1, the slowest query in the repo; a 100 TB fact table would
    shuffle 700 TB). Per-column sub-aggregates each scan ONE pruned
    parquet column with a single-distinct two-stage agg (partial distinct
    map-side, no Expand): total bytes read equals one 6-column scan and
    every exchange carries only distinct values. Numeric bounds go
    through DECIMAL(18,2) so the string repr is engine-neutral."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROFILE_NUM + _PROFILE_TXT:
        if c in _PROFILE_NUM:
            lo = F.min(c).cast("decimal(18,2)").cast("string")
            hi = F.max(c).cast("decimal(18,2)").cast("string")
        else:
            lo, hi = F.min(c), F.max(c)
        parts.append(
            li.select(F.col(c))
            .agg(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                lo.alias("min_value"),
                hi.alias("max_value"),
            )
            .select(
                F.lit(c).alias("col_name"),
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


QUERIES["q_table_profile"] = QuerySpec(
    fn=_q_table_profile,
    oracle=_profile_oracle(),
    doc="per-column profiler over lineitem: nulls / exact distincts / "
    "min-max via per-column single-distinct sub-aggregates unioned — no "
    "Expand, each scan reads one pruned parquet column",
)


def _q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kenshin_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts"),
    )
    return funnel(ev, ["view", "click", "purchase"], within=7 * 86400)


QUERIES["q_event_funnel"] = QuerySpec(
    fn=_q_event_funnel,
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts
      FROM events
    ),
    s1 AS (
      SELECT user_id, min(ts) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND e.ts >= s1.t_view AND e.ts <= s1.t_view + 604800
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= s2.t_click AND e.ts <= s2.t_click + 604800
      GROUP BY 1
    )
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    doc="sequential funnel (operators/funnel.py): first view, first "
    "click within 7d of it, first purchase within 7d of that — one "
    "filtered user-keyed aggregate + join per step, no full-stream "
    "windows; drop-offs keep NULL step columns",
)


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kenshin_spark.operators.interval import interval_join

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    sessions = spark.sql(
        SESSIONS_SQL.replace("floor(epoch(ts))", "unix_timestamp(ts)")
    ).select("user_id", "session_id", "session_start", "session_end")
    pts = ev.select(
        "user_id", "event_id", F.unix_timestamp("ts").cast("long").alias("ts")
    )
    return interval_join(
        pts,
        sessions,
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        on="user_id",
        bucket=3600,
    )


QUERIES["q_interval_join"] = QuerySpec(
    fn=_q_interval_join,
    oracle=f"""
    WITH s AS ({SESSIONS_SQL}),
    e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts
      FROM events
    )
    SELECT e.user_id, e.event_id, e.ts,
           s.session_id, s.session_start, s.session_end
    FROM e JOIN s ON e.user_id = s.user_id
                 AND e.ts BETWEEN s.session_start AND s.session_end
    """,
    doc="bucketized interval join (operators/interval.py): events "
    "equi-joined to their containing session windows on (user_id, time "
    "bucket) + exact containment post-filter — no nested-loop join; the "
    "oracle is the plain theta join",
)


# ---------------------------------------------------------------------------
# Text analysis (LLM-data-pipeline layer, on `documents`)
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             AS n_tokens
    FROM documents
    """,
    "token counting (whitespace tokens), pure column expressions",
)
def q_text_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count("text").cast("long").alias("n_tokens"))


_STOP_RE = marker_regex(STOPWORDS)

@register(
    "text_quality",
    rf"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stopwords,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           round(n_stopwords * 1.0 / n_tokens, 6) AS stopword_ratio,
           round(n_alpha * 1.0 / n_chars, 6) AS alpha_ratio,
           round(n_chars * 1.0 / n_tokens, 6) AS mean_token_len
    FROM f
    """,
    "quality scoring: length / stopword / alpha ratios",
)
def q_text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cols = quality_columns("text")
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "text_quality_filter",
    rf"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stopwords,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             n_tokens >= 25 AND n_tokens <= 100000 AS len_ok,
             n_chars >= 3 * n_tokens AND n_chars <= 10 * n_tokens
               AS mean_token_ok,
             n_stopwords >= 2 AS stopword_ok,
             n_alpha * 50 >= n_chars * 41 AS alpha_ok
      FROM f
    )
    SELECT doc_id, len_ok, mean_token_ok, stopword_ok, alpha_ok,
           len_ok AND mean_token_ok AND stopword_ok AND alpha_ok AS keep
    FROM r
    """,
    "Gopher-style quality filter verdict: every rule an integer "
    "cross-multiplication on raw counts (no float division), so the "
    "keep/drop decision is bit-identical across engines",
)
def q_text_quality_filter(spark, sf_dir):
    from kenshin_spark.functions.text import quality_verdict

    docs = load_table(spark, sf_dir, "documents")
    cols = quality_verdict("text")
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def _lang_oracle() -> str:
    score = {
        lang: f"len(regexp_extract_all(lower(text), '{marker_regex(w)}'))"
        for lang, w in LANG_MARKERS.items()
    }
    greatest = "greatest(" + ", ".join(score.values()) + ")"
    # earlier languages win ties — same order as the Spark CASE
    whens = " ".join(
        f"WHEN {score[lang]} = {greatest} AND {greatest} > 0 THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"SELECT doc_id, CASE {whens} ELSE 'und' END AS pred_lang FROM documents"


@register(
    "text_language_id",
    _lang_oracle(),
    "language-ID n-gram/stopword heuristic (argmax of marker-word counts)",
)
def q_text_language_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", language_id("text").alias("pred_lang"))


@register(
    "text_token_count_bpe",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    "BPE-ish token counting: word runs + single symbols via one "
    "regexp_count — the tokenizer-budget estimator, fully JVM-side",
)
def q_text_token_count_bpe(spark, sf_dir):
    from kenshin_spark.functions.text import bpe_ish_token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens")
    )


@register(
    "text_rolling_fingerprint",
    """
    SELECT doc_id,
           list_min(list_transform(
             regexp_extract_all(
               regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), '.{8}'),
             c -> CAST(('0x' || substr(md5(c), 1, 15)) AS BIGINT)
           )) AS fingerprint
    FROM documents
    """,
    "rolling-hash document fingerprint: min over md5 hashes of 8-char "
    "chunks of the normalized text (a min-pooled shingle signature)",
)
def q_text_rolling_fingerprint(spark, sf_dir):
    from kenshin_spark.functions.text import rolling_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint("text").alias("fingerprint")
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
             AS fingerprint
    FROM documents
    """,
    "document fingerprinting: md5 over normalized content",
)
def q_text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Deduplication (LLM-data-pipeline layer)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
             AS fingerprint,
           min(doc_id) AS survivor_id,
           count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    "exact dedup: hash-groupBy on normalized content, smallest id survives",
)
def q_dedup_exact(spark, sf_dir):
    return exact_dedup(load_table(spark, sf_dir, "documents"))


#: DuckDB twin of the portable md5-prefix 60-bit hash
_DH = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

_SHINGLES = r"""
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


def _minhash_oracle() -> str:
    mins = ", ".join(
        f"min({_DH.format(x=chr(39) + str(s) + '|' + chr(39) + ' || shingle')}) AS h{s}"
        for s in range(8)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(CAST(h{2*b} AS VARCHAR) || ',' || "
        f"CAST(h{2*b+1} AS VARCHAR)) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
    WITH sh AS ({_SHINGLES}),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6)
             AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6) >= 0.5
    """


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    "MinHash+LSH near-dup: shingle → 8 seeded-md5 minhashes → 4 bands → "
    "bucket join → exact Jaccard verify ≥ 0.5; the oracle recomputes the "
    "identical hashes in SQL",
)
def q_dedup_minhash(spark, sf_dir):
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


def _minhash_incremental_oracle() -> str:
    mins = ", ".join(
        f"min({_DH.format(x=chr(39) + str(s) + '|' + chr(39) + ' || shingle')}) AS h{s}"
        for s in range(8)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(CAST(h{2*b} AS VARCHAR) || ',' || "
        f"CAST(h{2*b+1} AS VARCHAR)) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
    WITH sh AS ({_SHINGLES}),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS new_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.corpus_id, c.new_id, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.corpus_id
      JOIN sh sb ON sb.doc_id = c.new_id AND sb.shingle = sa.shingle
      GROUP BY c.corpus_id, c.new_id
    )
    SELECT i.corpus_id, i.new_id,
           round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6)
             AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.corpus_id
    JOIN sizes zb ON zb.doc_id = i.new_id
    WHERE round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6) >= 0.5
    """


@register(
    "dedup_minhash_incremental",
    _minhash_incremental_oracle(),
    "incremental dedup — the daily-ingest shape: the corpus (doc_id % 10 "
    "<> 0) contributes its PRECOMPUTED band index; only the new batch "
    "(doc_id % 10 = 0) is shingled and banded, and corpus text is "
    "re-shingled only for colliding candidates (semi-join bounded)",
)
def q_dedup_minhash_incremental(spark, sf_dir):
    from kenshin_spark.dedup.minhash import (
        minhash_band_index,
        minhash_pairs_against_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    new = docs.where("doc_id % 10 = 0")
    corpus = docs.where("doc_id % 10 <> 0")
    return minhash_pairs_against_index(
        new, corpus, minhash_band_index(corpus), threshold=0.5
    )


def _clusters_oracle() -> str:
    # The oracle recomputes the MinHash-LSH pair set, then resolves
    # connected components by recursive label reachability: (node, lbl)
    # holds every label reachable from node along pair edges, so
    # min(lbl) per node is the component minimum — exactly the
    # cluster_id the Spark min-label propagation converges to.
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM cc
    """


@register(
    "dedup_clusters",
    _clusters_oracle(),
    "Duplicate clusters: connected components (iterative min-label "
    "propagation, localCheckpoint per round) over the MinHash-LSH pair "
    "graph; cluster_id = min doc_id of the component. The oracle resolves "
    "the same components with a recursive reachability CTE.",
)
def q_dedup_clusters(spark, sf_dir):
    from kenshin_spark.dedup import duplicate_clusters

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)
    return duplicate_clusters(pairs)


@register(
    "text_vocab_topk",
    r"""
    WITH tok AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    df_counts AS (
      SELECT tok, count(*) AS doc_freq FROM tok GROUP BY tok
    )
    SELECT tok, doc_freq FROM df_counts
    ORDER BY doc_freq DESC, tok LIMIT 50
    """,
    "vocabulary statistics: top-50 tokens by document frequency "
    "(distinct per doc), deterministic tie-break by token — the "
    "corpus-profiling pass before tokenizer/filter decisions",
)
def q_text_vocab_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    return (
        tok.groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "tok")
        .limit(50)
    )


@register(
    "text_oov_rate",
    r"""
    WITH occ AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tokd AS (SELECT DISTINCT doc_id, tok FROM occ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS doc_freq FROM tokd GROUP BY tok
      ) ORDER BY doc_freq DESC, tok LIMIT 100
    )
    SELECT o.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS oov_rate
    FROM occ o LEFT JOIN vocab v USING (tok)
    GROUP BY o.doc_id
    """,
    "tokenizer-coverage check: per-doc out-of-vocabulary rate against "
    "the corpus' own top-100 doc-frequency vocabulary (deterministic "
    "tie-break) — the tiny vocab broadcasts, the occurrence stream "
    "map-side-joins it, and the only exchange carries per-doc partial "
    "counts",
)
def q_text_oov_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tokd = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    vocab = (
        tokd.groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "tok")
        .limit(100)
        .select("tok", F.lit(1).alias("_in"))
    )
    occ = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    return (
        occ.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov") * F.lit(1.0) / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


@register(
    "text_collocations",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i + 1]
             )) AS bigram
      FROM toks
    ),
    uni AS (
      SELECT unnest(ts) AS tok FROM toks
    ),
    nb AS (SELECT count(*) AS n_bigrams FROM bg),
    uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
    bc AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram)
    SELECT bc.bigram, bc.c AS pair_count,
           round(bc.c * 1.0 * (SELECT n_bigrams FROM nb) /
                 (ua.c * ub.c), 6) AS lift
    FROM bc
    JOIN uc ua ON ua.tok = string_split(bc.bigram, ' ')[1]
    JOIN uc ub ON ub.tok = string_split(bc.bigram, ' ')[2]
    WHERE bc.c >= 20
    """,
    "collocation mining: bigram lift = P(ab) / (P(a)P(b)) computed as an "
    "exact integer-derived rational (no log PMI — libm last-ulp differs "
    "across engines), min support 20",
)
def q_text_collocations(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("ts")
    )
    bg = toks.select(
        F.explode(
            F.transform(
                F.slice(
                    F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))
                ),
                lambda x, i: F.concat_ws(
                    " ", F.slice(F.col("ts"), i + 1, 2)
                ),
            )
        ).alias("bigram")
    )
    uni = toks.select(F.explode("ts").alias("tok"))
    n_bigrams = bg.count()
    uc = uni.groupBy("tok").agg(F.count("*").alias("c"))
    bc = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= 20)
    )
    a = F.split(F.col("bigram"), " ")[0]
    b = F.split(F.col("bigram"), " ")[1]
    ua, ub = uc.alias("ua"), uc.alias("ub")
    return (
        bc.join(ua, a == F.col("ua.tok"))
        .join(ub, b == F.col("ub.tok"))
        .select(
            "bigram",
            "pair_count",
            F.round(
                F.col("pair_count") * F.lit(float(n_bigrams)) /
                (F.col("ua.c") * F.col("ub.c")),
                6,
            ).alias("lift"),
        )
    )


def _curation_oracle() -> str:
    # the full pipeline, one SQL program: quality rules → MinHash pairs on
    # the kept set → connected components → drop non-canonical members →
    # deterministic hash sample → per-source stats
    mins = ", ".join(
        f"min({_DH.format(x=chr(39) + str(s) + '|' + chr(39) + ' || shingle')}) AS h{s}"
        for s in range(8)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(CAST(h{2*b} AS VARCHAR) || ',' || "
        f"CAST(h{2*b+1} AS VARCHAR)) AS band_key FROM sig"
        for b in range(4)
    )
    ntok = r"len(string_split_regex(trim(text), '\s+'))"
    nalpha = "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
    return rf"""
    WITH RECURSIVE kept AS (
      SELECT doc_id, text, source FROM documents
      WHERE {ntok} BETWEEN 25 AND 100000
        AND length(text) >= 3 * {ntok} AND length(text) <= 10 * {ntok}
        AND len(regexp_extract_all(lower(text), '{_STOP_RE}')) >= 2
        AND {nalpha} * 50 >= length(text) * 41
    ),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - 2),
                 i -> array_to_string(toks[i : i + 2], ' ')
               )) AS shingle
        FROM (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
          FROM kept
        )
      )
    ),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6)
            >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    dropped AS (SELECT node AS doc_id FROM cc WHERE node <> cluster_id),
    curated AS (
      SELECT k.* FROM kept k
      WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
        AND ('0x' || substr(md5('ksp|' || CAST(k.doc_id AS VARCHAR)), 1, 15))
              ::BIGINT % 1000000 < 500000
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum({ntok}) AS BIGINT) AS total_tokens
    FROM curated GROUP BY source
    """


@register(
    "pipeline_corpus_curation",
    _curation_oracle(),
    "the capstone training-data pipeline, END-TO-END in one plan: Gopher "
    "quality rules → MinHash-LSH pairs on the kept set → connected "
    "components → drop non-canonical cluster members → 50% deterministic "
    "hash sample → per-source doc/token stats. Every stage is the same "
    "oracled operator the standalone queries use — the oracle replays "
    "the whole program in SQL, recursion included",
)
def q_pipeline_corpus_curation(spark, sf_dir):
    from kenshin_spark.dedup import canonical_survivors, minhash_lsh_pairs
    from kenshin_spark.functions.sampling import hash_sample
    from kenshin_spark.functions.text import quality_verdict, token_count

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.where(quality_verdict("text")["keep"]).select(
        "doc_id", "text", "source"
    )
    pairs = minhash_lsh_pairs(kept, threshold=0.5)
    dropped = (
        canonical_survivors(pairs).where(~F.col("keep")).select("doc_id")
    )
    curated = hash_sample(
        kept.join(dropped, "doc_id", "left_anti"), 0.5, "doc_id"
    )
    return curated.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
    )


@register(
    "text_repetition_filter",
    r"""
    WITH g AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> array_to_string(toks[i : i + 1], ' ')
             )) AS gram
      FROM (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents
      )
    ),
    per AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    s AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_grams,
             CAST(max(cnt) AS BIGINT) AS top_gram_count,
             CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
               AS dup_gram_count
      FROM per GROUP BY doc_id
    )
    SELECT doc_id, n_grams, top_gram_count, dup_gram_count,
           (top_gram_count * 8 <= n_grams
            AND dup_gram_count * 10 <= n_grams * 3) AS rep_ok
    FROM s
    """,
    "Gopher-style repetition filter on token 2-grams (the corpus has no "
    "lines/paragraphs): top-gram slot share <= 1/8 AND duplicated-gram "
    "slot share <= 3/10, both as integer cross-multiplications. "
    "Row-local Arrow Counter kernel — zero shuffles; the oracle replays "
    "the multiset via explode + two grouped aggs",
)
def q_text_repetition_filter(spark, sf_dir):
    from kenshin_spark.pipeline import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


_BENCH_BUCKET = (
    "('0x' || substr(md5('bench|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    " % 1000000"
)


@register(
    "pipeline_decontaminate",
    rf"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - 3),
                 i -> array_to_string(toks[i : i + 3], ' ')
               )) AS shingle
        FROM (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
          FROM documents
        )
      )
    ),
    bench_ids AS (
      SELECT doc_id FROM documents WHERE {_BENCH_BUCKET} < 50000
    ),
    bench_sh AS (
      SELECT DISTINCT shingle FROM sh JOIN bench_ids USING (doc_id)
    )
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
    FROM sh s JOIN bench_sh USING (shingle)
    WHERE s.doc_id NOT IN (SELECT doc_id FROM bench_ids)
    GROUP BY s.doc_id
    """,
    "benchmark decontamination (GPT-3 appendix-C style): flag corpus docs "
    "sharing any word 4-gram with a 5% held-out 'benchmark' split. The "
    "benchmark shingle set broadcasts; the corpus side is a map-side "
    "semi-join + doc-keyed count — no corpus shuffle",
)
def q_pipeline_decontaminate(spark, sf_dir):
    from kenshin_spark.functions.sampling import sample_bucket
    from kenshin_spark.pipeline import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    is_bench = sample_bucket("doc_id", "bench") < 50000
    return decontaminate(docs.where(~is_bench), docs.where(is_bench), n=4)


@register(
    "pipeline_source_mixture",
    """
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT min(cnt) AS mn FROM c)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
    WHERE (('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 1000000) * c.cnt
          < m.mn * 1000000
    GROUP BY d.lang
    """,
    "corpus-mixture rebalancing: downsample every language to the "
    "smallest language's size (the corpus is ~3x en-heavy) with the "
    "exact-integer hash rule bucket*cnt < min*DEN — membership is a pure "
    "function of the row, the mixture aggregates broadcast, the corpus "
    "never shuffles",
)
def q_pipeline_source_mixture(spark, sf_dir):
    from kenshin_spark.pipeline import rebalance_to_min

    docs = load_table(spark, sf_dir, "documents")
    kept = rebalance_to_min(docs, "lang", "doc_id")
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "pipeline_sequence_packing",
    r"""
    WITH base AS (
      SELECT doc_id,
             ('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS h,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, h % 8 AS shard, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY h % 8 ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING
             ) - n_tokens AS start_tok
      FROM base
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(start_tok // 2048 AS BIGINT) AS seq_in_shard,
           CAST(start_tok % 2048 AS BIGINT) AS seq_offset
    FROM c
    """,
    "training-sequence packing (concatenate-then-chunk): deterministic "
    "md5 shard + shuffle order, per-shard window cumsum → every doc's "
    "(sequence, offset) position in fixed 2048-token training sequences. "
    "Pure integer/md5 arithmetic, window co-partitioned with the shard "
    "(no global sort) — the oracle replays assignment exactly",
)
def q_pipeline_sequence_packing(spark, sf_dir):
    from kenshin_spark.pipeline import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=2048, n_shards=8)


@register(
    "text_chunking",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    ex AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 48))
               AS start_tok,
             generate_subscripts(
               generate_series(0, greatest(len(toks) - 1, 0), 48), 1
             ) - 1 AS chunk_idx
      FROM t
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least(64, n - start_tok) AS BIGINT) AS chunk_tokens,
           array_to_string(toks[start_tok + 1 : start_tok + 64], ' ')
             AS chunk_text
    FROM ex
    """,
    "RAG-style overlapping chunking: 64-token windows advancing by 48 "
    "(16-token overlap), row-local JVM expressions (sequence + "
    "posexplode + slice) — zero shuffles, chunk text re-joined from the "
    "token slice",
)
def q_text_chunking(spark, sf_dir):
    from kenshin_spark.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk=64, step=48)


@register(
    "text_tfidf_topk",
    r"""
    WITH toks AS (
      SELECT doc_id, tok AS term FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, count(*) AS doc_freq
      FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
             (tf.tf * n.n_docs) / dfreq.doc_freq AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, doc_freq, score, CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
      ) AS rnk FROM scored
    ) t WHERE rnk <= 5
    """,
    "per-doc top-5 terms by tf-idf with LINEAR idf (tf*N/doc_freq): one "
    "exact integer product + one division keeps the score bit-identical "
    "across engines (libm ln is not correctly rounded — a log-idf rank "
    "could flip at a tie); same ranking as log idf when doc_freq "
    "differs. Two partial-agg shuffles + one AQE vocab join + one "
    "per-doc window",
)
def q_text_tfidf_topk(spark, sf_dir):
    from kenshin_spark.pipeline import tfidf_topk

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, k=5)


@register(
    "text_pii_scrub",
    r"""
    WITH decorated AS (
      SELECT doc_id, source,
             text
             || (CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com now' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                      || CAST(doc_id % 100 AS VARCHAR) ELSE '' END) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
             AS scrubbed_fp
    FROM decorated
    """,
    "PII scrubbing: redact emails + IPv4s with fixed tags. The corpus is "
    "synthetic, so deterministic PII is injected per doc_id first; the "
    "oracle hashes the scrubbed text — redaction is verified byte-exact",
)
def q_text_pii_scrub(spark, sf_dir):
    from kenshin_spark.pipeline import pii_counts, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    d = docs.select("doc_id", t.alias("t"))
    c = pii_counts("t")
    return d.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        F.md5(scrub_pii("t")).alias("scrubbed_fp"),
    )


@register(
    "sample_stratified",
    """
    SELECT doc_id, source
    FROM documents
    WHERE ('0x' || substr(md5('ksp|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 1000000
          < CASE WHEN source = 'src1' THEN 800000
                 WHEN source = 'src2' THEN 500000
                 ELSE 200000 END
    """,
    "deterministic stratified hash sample: membership is a pure function "
    "of (seed, doc_id) — layout/cluster independent, re-run stable, "
    "consistent across rates — with per-source rates (src1 80%, src2 "
    "50%, rest 20%); the oracle reproduces exact membership, not an "
    "approximate count",
)
def q_sample_stratified(spark, sf_dir):
    from kenshin_spark.functions.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        docs,
        {"src1": 0.8, "src2": 0.5},
        stratum_col="source",
        key_col="doc_id",
        default_rate=0.2,
    ).select("doc_id", "source")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS ({_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6)
             AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6) >= 0.4
    """,
    "n-gram Jaccard near-dup: exact pairwise Jaccard over word 3-gram "
    "sets via the inverted-index join",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.4)


def _simhash_oracle() -> str:
    th = _DH.format(x="tok")
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(N_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {j})"
        for j in range(N_BITS)
    )
    return rf"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    hashed AS (SELECT doc_id, {th} AS h FROM toks),
    bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {fp} AS simhash FROM bits
    """


@register(
    "dedup_simhash",
    _simhash_oracle(),
    "SimHash 60-bit fingerprints over distinct word tokens — one shuffle, "
    "60 conditional-sum aggregates; oracle reproduces bit-for-bit",
)
def q_dedup_simhash(spark, sf_dir):
    return simhash_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_neardup",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) >= 0.4
    """,
    "embedding-cosine near-dup pairs (threshold 0.4 on unit-normalized "
    "synthetic vectors)",
)
def q_dedup_embedding(spark, sf_dir):
    return embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "emb_centroids",
    """
    SELECT label, t.dim, round(avg(embedding[t.dim + 1]), 6) AS centroid,
           count(*) AS n_vecs
    FROM embeddings, range(64) t(dim)
    GROUP BY 1, 2
    """,
    "per-label mean embedding (flat (label, dim) rows): posexplode + "
    "map-side-combined avg — the exchange carries |labels| x dim rows per "
    "task regardless of corpus size",
)
def q_emb_centroids(spark, sf_dir):
    from kenshin_spark.functions.vectors import centroid_rows

    return centroid_rows(load_table(spark, sf_dir, "embeddings"))


#: nearest-centroid assignment CTEs — shared by emb_nearest_centroid and
#: the SemDeDup oracle (dedup_semantic)
_NN_CTES = """
    c AS (
      SELECT label AS pred_label, t.dim,
             round(avg(embedding[t.dim + 1]), 6) AS cv
      FROM embeddings, range(64) t(dim) GROUP BY 1, 2
    ),
    carr AS (
      SELECT pred_label, list(cv ORDER BY dim) AS cvec
      FROM c GROUP BY pred_label
    ),
    scored AS (
      SELECT e.vec_id, e.label, ca.pred_label,
             list_dot_product(e.embedding::DOUBLE[], ca.cvec) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(ca.cvec, ca.cvec))) AS cos
      FROM embeddings e CROSS JOIN carr ca
    ),
    best AS (
      SELECT vec_id, label, pred_label, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, pred_label) AS rn
      FROM scored
    )
"""


@register(
    "emb_nearest_centroid",
    f"""
    WITH {_NN_CTES.strip()}
    SELECT vec_id, label, pred_label, round(cos, 6) AS cosine,
           label = pred_label AS correct
    FROM best WHERE rn = 1
    """,
    "nearest-centroid classification: exact per-label mean centroids "
    "(rounded, so both engines score identical inputs), Arrow-matmul "
    "argmax emitting only the tie-safe label, then ONE sequential "
    "zip_with dot against the chosen centroid for the reported cosine",
)
def q_emb_nearest_centroid(spark, sf_dir):
    from kenshin_spark.similarity.classify import nearest_centroid

    return nearest_centroid(load_table(spark, sf_dir, "embeddings"))


@register(
    "dedup_semantic",
    f"""
    WITH {_NN_CTES.strip()},
    asg AS (SELECT vec_id, pred_label FROM best WHERE rn = 1),
    e AS (
      SELECT m.vec_id, m.embedding, g.pred_label
      FROM embeddings m JOIN asg g ON m.vec_id = g.vec_id
    )
    SELECT x.pred_label AS cluster, x.vec_id AS vec_a, y.vec_id AS vec_b,
           round(
             list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) *
              sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))),
             6) AS cosine
    FROM e x JOIN e y
      ON x.pred_label = y.pred_label AND x.vec_id < y.vec_id
    WHERE round(
             list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) *
              sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))),
             6) >= 0.4
    """,
    "SemDeDup-style blocked near-dup: nearest-centroid cells bound the "
    "pairwise verify to Σ|cell|² instead of n²; pairs are a strict subset "
    "of dedup_embedding_neardup (cross-cell pairs are the traded recall). "
    "Assignment + verify replay exactly in SQL — cells are deterministic "
    "per-label means, not an RNG k-means",
)
def q_dedup_semantic(spark, sf_dir):
    from kenshin_spark.dedup.semantic import semantic_neardup_pairs

    return semantic_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "sim_topk_quantized",
    """
    WITH q0 AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS e,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
      FROM embeddings
    ),
    qv AS (
      SELECT vec_id,
             list_transform(e, x ->
               floor(x * 127 / (CASE WHEN s = 0 THEN 1 ELSE s END) + 0.5)
             ) AS qe
      FROM q0
    ),
    q AS (SELECT * FROM qv WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.qe, c.qe) AS BIGINT) AS dot
      FROM qv c, q WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY dot DESC, neighbor_id
      ) AS rnk FROM scored
    ) t WHERE rnk <= 10
    """,
    "int8-quantized top-k (FAISS SQ-style max-abs scalar quantization): "
    "integer dot products are exact under any summation order, so the "
    "Arrow matmul fast path hash-matches the SQL oracle with no float "
    "rounding discipline — 4x smaller vectors at 100 TB",
)
def q_sim_topk_quantized(spark, sf_dir):
    from kenshin_spark.similarity.quantize import quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


# ---------------------------------------------------------------------------
# Similarity search (LLM-data-pipeline layer, on `embeddings`)
# ---------------------------------------------------------------------------


@register(
    "sim_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(
               list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               6) AS cosine
      FROM embeddings c, q
      WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rnk FROM scored
    ) t WHERE rnk <= 10
    """,
    "similarity search baseline: exact cosine top-10 for 5 query vectors "
    "(zip_with/aggregate dot products, broadcast queries, window top-k)",
)
def q_sim_topk_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10)


@register(
    "sim_range_search",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(
             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
              sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
             6) AS cosine
    FROM embeddings c, q
    WHERE q.vec_id <> c.vec_id
      AND round(
            list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
            (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
             sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
            6) >= 0.25
    """,
    "range query (radius companion to top-k): every neighbor with "
    "cosine ≥ 0.25 of each query vector — scan-and-filter with NO "
    "per-query sort or window; corpus stays partitioned, queries "
    "broadcast; the banded LSH/IVF variants bound the scan identically",
)
def q_sim_range_search(spark, sf_dir):
    from kenshin_spark.similarity import range_search

    emb = load_table(spark, sf_dir, "embeddings")
    return range_search(emb, emb.where(F.col("vec_id") < 5), threshold=0.25)


def _duck_plane(p: list[float]) -> str:
    # %.17e keeps DuckDB literals DOUBLE-typed: plain decimals parse as
    # DECIMAL first, and DECIMAL -> DOUBLE is NOT value-preserving
    # (measured ~12% off-by-ULP). Exponent literals parse as DOUBLE.
    return "[" + ",".join(f"{x:.17e}" for x in p) + "]::DOUBLE[]"


def _duck_band_sigs(vec: str, bands: int, r: int, dim: int = 64) -> str:
    """DuckDB twin of similarity.band_signatures_udf: a list of ``bands``
    band signatures (list is 1-indexed in DuckDB)."""
    from kenshin_spark.similarity import _hyperplane

    planes = _hyperplane(dim, bands * r)
    exprs = []
    for b in range(bands):
        bits = [
            f"(CASE WHEN list_dot_product({vec}::DOUBLE[], "
            f"{_duck_plane(planes[b * r + i])}) >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(r)
        ]
        exprs.append(" + ".join(bits))
    return "[" + ", ".join(exprs) + "]"


def _lsh_topk_oracle(bands: int, r: int) -> str:
    # candidate iff some band signature is within Hamming-1 of the
    # query's (multi-probe): xor of the band sigs in {0} ∪ {1<<i}
    flips = ",".join(str(1 << i) for i in range(r))
    collide = " OR ".join(
        f"(c.s[{j + 1}] = q.s[{j + 1}] OR "
        f"xor(c.s[{j + 1}], q.s[{j + 1}]) IN ({flips}))"
        for j in range(bands)
    )
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding, {_duck_band_sigs('embedding', bands, r)} AS s
      FROM embeddings
    ),
    q AS (SELECT * FROM sigs WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(
               list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               6) AS cosine
      FROM sigs c, q
      WHERE q.vec_id <> c.vec_id AND ({collide})
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rnk FROM scored
    ) t WHERE rnk <= 10
    """


@register(
    "sim_topk_lsh",
    _lsh_topk_oracle(16, 4),
    "ANN scale path: banded hyperplane LSH (16 bands x 4 planes, "
    "OR-amplified) + Hamming-1 multi-probe on the query side; exact "
    "cosine verify over candidates only. Oracle recomputes the identical "
    "md5-derived planes and sign tests in SQL",
)
def q_sim_topk_lsh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, k=10)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + mapInPandas, stub codec)
# ---------------------------------------------------------------------------


def _lsh_neardup_oracle(bands: int, r: int, threshold: float) -> str:
    collide = " OR ".join(
        f"a.s[{j + 1}] = b.s[{j + 1}]" for j in range(bands)
    )
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding, {_duck_band_sigs('embedding', bands, r)} AS s
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.embedding AS ea, b.embedding AS eb
      FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
      WHERE {collide}
    )
    SELECT vec_a, vec_b,
           round(
             list_dot_product(ea::DOUBLE[], eb::DOUBLE[]) /
             (sqrt(list_dot_product(ea::DOUBLE[], ea::DOUBLE[])) *
              sqrt(list_dot_product(eb::DOUBLE[], eb::DOUBLE[]))),
             6) AS cosine
    FROM cand
    WHERE round(
             list_dot_product(ea::DOUBLE[], eb::DOUBLE[]) /
             (sqrt(list_dot_product(ea::DOUBLE[], ea::DOUBLE[])) *
              sqrt(list_dot_product(eb::DOUBLE[], eb::DOUBLE[]))),
             6) >= {threshold!r}
    """


@register(
    "dedup_embedding_lsh",
    _lsh_neardup_oracle(16, 4, 0.4),
    "embedding near-dup at scale: banded hyperplane LSH (16 bands x 4 "
    "planes, OR-amplified) bounds the pair space to Σ|bucket|² per band; "
    "exact cosine verify over candidates (~97% recall of the exact pairs "
    "at sf0.01, subset-of-exact by construction). Oracle recomputes the "
    "identical planes and sign tests in SQL",
)
def q_dedup_embedding_lsh(spark, sf_dir):
    from kenshin_spark.dedup.embedding import embedding_neardup_pairs_lsh

    return embedding_neardup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


def _pinned_sample_cte(n: int) -> str:
    """The n corpus vectors with smallest md5(cast(vec_id as string)) —
    DuckDB twin of ``similarity.pinned.md5_sample``: ``(c, cv)``."""
    return f"""
      SELECT c, cv FROM (
        SELECT row_number() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c,
               embedding::DOUBLE[] AS cv
        FROM embeddings
      ) WHERE c < {n}
    """


def _ivf_pinned_oracle(n_cells: int, n_probe: int, k: int) -> str:
    """Replays ``ivf_topk_pinned`` bit-for-bit: same md5-sample centroids,
    same ``cc - 2·(x·c)`` fold-exact distance, same ``(d2, cell)``
    tie-break for assignment and probe selection."""
    return f"""
    WITH cent AS (
      SELECT c, cv, list_dot_product(cv, cv) AS cc
      FROM ({_pinned_sample_cte(n_cells)})
    ),
    asg AS (
      SELECT vec_id, ev, cell FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS ev, cent.c AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY cent.cc
                   - 2 * list_dot_product(e.embedding::DOUBLE[], cent.cv),
                   cent.c
               ) AS rn
        FROM embeddings e, cent
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qv,
               cent.c AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY cent.cc
                   - 2 * list_dot_product(e.embedding::DOUBLE[], cent.cv),
                   cent.c
               ) AS rn
        FROM embeddings e, cent WHERE e.vec_id < 5
      ) WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(
               list_dot_product(p.qv, a.ev) /
               (sqrt(list_dot_product(p.qv, p.qv)) *
                sqrt(list_dot_product(a.ev, a.ev))),
               6) AS cosine
      FROM asg a JOIN probe p ON a.cell = p.cell AND a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rnk FROM scored
    ) t WHERE rnk <= {k}
    """


def _pq_pinned_ctes(m: int, ksub: int, dim: int = 64) -> str:
    """Shared CTE chain replaying ``pinned._pq_scored_pinned``: codebook j
    = j-th subvector slice of the ksub md5-sample rows; codes by fold-exact
    subspace argmin (ties → smallest code); score = list_dot_product of the
    query against the flattened reconstruction (the exact fold the Spark
    side mirrors). Ends with ``scored(query_id, neighbor_id, qv, score)``."""
    dsub = dim // m
    sl = f"js.j * {dsub} + 1, js.j * {dsub} + {dsub}"
    return f"""
    samp AS ({_pinned_sample_cte(ksub)}),
    js AS (SELECT unnest(generate_series(0, {m - 1})) AS j),
    cb AS (
      SELECT js.j, samp.c,
             list_slice(samp.cv, {sl}) AS cw,
             list_dot_product(list_slice(samp.cv, {sl}),
                              list_slice(samp.cv, {sl})) AS cc
      FROM samp, js
    ),
    subv AS (
      SELECT e.vec_id, js.j,
             list_slice(e.embedding::DOUBLE[], {sl}) AS sv
      FROM embeddings e, js
    ),
    codes AS (
      SELECT vec_id, j, cw FROM (
        SELECT s.vec_id, s.j, cb.cw,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY cb.cc - 2 * list_dot_product(s.sv, cb.cw), cb.c
               ) AS rn
        FROM subv s JOIN cb ON s.j = cb.j
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT vec_id, flatten(list(cw ORDER BY j)) AS rv
      FROM codes GROUP BY vec_id
    ),
    q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT q.query_id, r.vec_id AS neighbor_id, q.qv,
             round(list_dot_product(q.qv, r.rv), 6) AS score
      FROM recon r, q WHERE q.query_id <> r.vec_id
    )
    """


def _pq_pinned_oracle(m: int, ksub: int, k: int) -> str:
    return f"""
    WITH {_pq_pinned_ctes(m, ksub)}
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, score FROM (
      SELECT query_id, neighbor_id, score, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rnk FROM scored
    ) t WHERE rnk <= {k}
    """


def _pq_rerank_pinned_oracle(m: int, ksub: int, candidates: int, k: int) -> str:
    return f"""
    WITH {_pq_pinned_ctes(m, ksub)},
    pool AS (
      SELECT query_id, neighbor_id, qv FROM (
        SELECT query_id, neighbor_id, qv, row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, neighbor_id
        ) AS rnk FROM scored
      ) t WHERE rnk <= {candidates}
    ),
    rer AS (
      SELECT p.query_id, p.neighbor_id,
             round(
               list_dot_product(p.qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(p.qv, p.qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))),
               6) AS cosine
      FROM pool p JOIN embeddings e ON p.neighbor_id = e.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rnk FROM rer
    ) t WHERE rnk <= {k}
    """


@register(
    "sim_topk_pq",
    _pq_pinned_oracle(16, 16, 10),
    "product-quantization ANN (Jégou 2011): m=16 subspace codebooks, "
    "asymmetric-distance scoring over 1-byte codes — the 16×-smaller-scan "
    "memory path. Registered with the PINNED quantizer (codebooks = the "
    "md5-sample k-means init state, distances as sequential left-folds) "
    "so the oracle replays encode + ADC bit-for-bit in SQL; the "
    "Lloyd-trained production path (similarity/pq.py) is pytest "
    "recall-asserted",
)
def q_sim_topk_pq(spark, sf_dir):
    from kenshin_spark.similarity.pinned import pq_topk_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return pq_topk_pinned(emb, queries, k=10)


@register(
    "sim_topk_pq_rerank",
    _pq_rerank_pinned_oracle(16, 16, 50, 10),
    "two-stage ANN serving stack: PQ ADC over compressed codes recalls a "
    "50-candidate pool per query (the only corpus-wide read), exact "
    "cosine re-ranks the pool against raw vectors. Pinned codebooks make "
    "both stages SQL-replayable — the oracle reproduces pool AND re-rank",
)
def q_sim_topk_pq_rerank(spark, sf_dir):
    from kenshin_spark.similarity.pinned import pq_rerank_topk_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return pq_rerank_topk_pinned(emb, queries, k=10, candidates=50)


@register(
    "sim_topk_ivf",
    _ivf_pinned_oracle(8, 3, 10),
    "IVF ANN: coarse-quantizer cells, n_probe=3 cells scanned per query; "
    "at scale cells are Parquet partitions (partition-pruned probes). "
    "Registered with the PINNED quantizer (centroids = md5-sample rows, "
    "fold-exact distances, (d2, cell) tie-breaks) so assignment AND probe "
    "selection replay in SQL; the Lloyd-trained path (ivf_topk) keeps the "
    "pytest recall assertion",
)
def q_sim_topk_ivf(spark, sf_dir):
    from kenshin_spark.similarity.pinned import ivf_topk_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk_pinned(emb, queries, k=10, n_cells=8, n_probe=3)


@register(
    "sim_topk_ivf_fullprobe",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(
               list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               6) AS cosine
      FROM embeddings c, q
      WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rnk FROM scored
    ) t WHERE rnk <= 10
    """,
    "IVF with n_probe = n_cells: every cell is scanned, so the result "
    "must EQUAL brute force — the oracle is the exact top-k SQL. Proves "
    "the IVF machinery (quantizer, assignment, probe join) loses nothing "
    "except by cell pruning",
)
def q_sim_topk_ivf_fullprobe(spark, sf_dir):
    from kenshin_spark.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=10, n_cells=8, n_probe=8)


@register(
    "mm_frame_sample",
    """
    WITH v AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS n_bytes,
             least(8, greatest(1, (octet_length(encode(text)) * 10) // 1000))
               AS n_frames
      FROM documents
    )
    SELECT v.doc_id,
           CAST(u.i AS INT) AS frame_idx,
           CAST(u.i * 1000 AS BIGINT) AS frame_ts_ms,
           md5(v.text || '|frame' || u.i) AS frame_md5,
           CAST(v.n_bytes AS BIGINT) AS frame_bytes
    FROM v, unnest(generate_series(0, v.n_frames - 1)) AS u(i)
    """,
    "multimodal video plumbing: one payload row → N frame rows inside "
    "mapInPandas (cardinality-changing Arrow kernel); decode is the "
    "deterministic stub, so the oracle recomputes frames exactly",
)
def q_mm_frame_sample(spark, sf_dir):
    from kenshin_spark.multimodal.transforms import sample_frames

    docs = attach_fake_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs, every_ms=1000, max_frames=8)


@register(
    "mm_image_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(64 + CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 1024
                AS INT) AS width,
           CAST(64 + CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 1024
                AS INT) AS height,
           'fake' AS format
    FROM documents
    """,
    "multimodal: opaque binary payload → typed metadata via Arrow-batched "
    "mapInPandas; codec is a deterministic stub (no image libs in this "
    "container), Spark-side plumbing is real",
)
def q_mm_image_metadata(spark, sf_dir):
    docs = attach_fake_payload(load_table(spark, sf_dir, "documents"))
    return image_metadata(docs)


@register(
    "mm_audio_features",
    """
    SELECT doc_id,
           (length(text) // 2) * 1000 // 16000 AS duration_ms,
           16000 AS sample_rate,
           round((list_sum(list_transform(string_split(text, ''),
                                          x -> ascii(x)))
                  * 1.0 / length(text)) / 255.0, 6) AS rms,
           length(text) // 2 AS n_samples
    FROM documents
    """,
    "multimodal audio: payload bytes → duration/sample-count/RMS via the "
    "Arrow mapInPandas kernel (stub decoder — librosa/torchaudio slot in "
    "here); the oracle recomputes the byte arithmetic from the utf-8 "
    "payload, proving the Spark-side plumbing end-to-end",
)
def q_mm_audio_features(spark, sf_dir):
    from kenshin_spark.multimodal.transforms import audio_features

    docs = attach_fake_payload(load_table(spark, sf_dir, "documents"))
    return audio_features(docs).withColumn("rms", F.round("rms", 6))


# ---------------------------------------------------------------------------
# TPC-style round-3 additions (q8/q15/q17 adapted to the available columns;
# the testdata has no partsupp/commitdate/shipmode/phone, so q2/q9/q11/q12/
# q20/q21/q22 cannot be expressed) + grouping-sets/window/percentile surface
# ---------------------------------------------------------------------------

Q8_SQL = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nat = 'NATION_1' THEN volume END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
           AS volume,
         n2.n_name AS nat
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""

Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

#: Q17's classic form compares l_quantity < 0.2*avg(...) — a DOUBLE
#: threshold whose last-ulp depends on summation order, so the two engines
#: could disagree at a razor-edge boundary. Cross-multiplied DECIMAL form
#: (5·q·count < sum ⟺ q < 0.2·avg) is ORDER-EXACT in both engines while
#: still exercising correlated-scalar-subquery decorrelation (twice).
Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size <= 15
  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 *
        (SELECT count(*) FROM lineitem l2
         WHERE l2.l_partkey = p_partkey)
      < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(12,2)))
         FROM lineitem l3 WHERE l3.l_partkey = p_partkey)
"""

Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum({_DISC_PRICE}) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""

Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
"""

Q22_SQL = """
WITH tot AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
       count(*) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM customer, tot
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""

QUERIES["q9_nation_revenue"] = QuerySpec(
    fn=_sql_query(Q9_SQL, ("lineitem", "orders", "supplier", "nation",
                           "part")),
    oracle=Q9_SQL,
    doc="TPC-H Q9-style (adapted: testdata has no partsupp/supplycost, "
    "so revenue stands in for profit): 5-way join — fact table joins "
    "three broadcastable dims + orders — grouped by supplier nation × "
    "order year; DECIMAL money math",
)
QUERIES["q21_sole_return_supplier"] = QuerySpec(
    fn=_sql_query(Q21_SQL, ("supplier", "lineitem", "orders")),
    oracle=Q21_SQL,
    doc="TPC-H Q21-style (adapted: no commit/receipt dates in testdata, "
    "returnflag='R' stands in for late delivery): suppliers who were "
    "the SOLE returning supplier on a multi-supplier finished order — "
    "correlated EXISTS + NOT EXISTS, which Catalyst decorrelates into "
    "left-semi and left-anti hash joins on l_orderkey",
)
QUERIES["q22_dormant_customers"] = QuerySpec(
    fn=_sql_query(Q22_SQL, ("customer", "orders")),
    oracle=Q22_SQL,
    doc="TPC-H Q22-style (adapted: above-mean acctbal via exact DECIMAL "
    "cross-multiplication instead of a float avg threshold; dormant = "
    "no order since 2000-01-01): scalar aggregate broadcast + "
    "NOT EXISTS anti join, grouped by nation",
)

#: Q2's ps_supplycost has no testdata analog (no partsupp table), so the
#: observed unit price min(l_extendedprice / l_quantity) per
#: (part, supplier) stands in for the catalog supply cost. The division
#: is one IEEE op on two parquet doubles — bit-identical in both engines
#: — and the correlated min + outer equality compare those exact doubles,
#: so no rounding is needed until display.
Q2_SQL = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY 1, 2
)
SELECT round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal, s_name, n_name,
       CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
       round(CAST(unit_price AS DOUBLE), 6) AS unit_price
FROM part, unit, supplier, nation, region
WHERE p_partkey = unit.l_partkey AND s_suppkey = unit.l_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND p_size <= 10 AND p_type = 'LARGE'
  AND unit_price = (
    SELECT min(u2.unit_price)
    FROM unit u2, supplier s2, nation n2, region r2
    WHERE u2.l_partkey = p_partkey AND s2.s_suppkey = u2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""

Q11_SQL = """
WITH val AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT CAST(l_partkey AS BIGINT) AS partkey,
       round(CAST(v AS DOUBLE), 2) AS total_value
FROM val
WHERE v * (SELECT count(*) FROM val) * 2 > (SELECT sum(v) FROM val) * 3
"""

Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""

Q20_SQL = """
SELECT s_name, round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 100)
"""

#: Spark-side formulation of Q2: the correlated scalar-min subquery would
#: make Catalyst aggregate lineitem TWICE (a WITH body is inlined per
#: reference, and each inlining is a full (part,supp) shuffle — measured
#: 7.1 s at sf0.1). A window min over the region-filtered unit table is
#: the same value set in ONE lineitem pass + one vocab-sized window
#: shuffle (measured 3.2 s). The DuckDB oracle keeps the classic
#: correlated form — two independent formulations agreeing is a stronger
#: check than replaying one.
Q2_SPARK_SQL = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT u.l_partkey, u.unit_price, s_acctbal, s_name, n_name,
         min(u.unit_price) OVER (PARTITION BY u.l_partkey) AS min_price
  FROM unit u
  JOIN supplier ON s_suppkey = u.l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal, s_name, n_name,
       CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
       round(CAST(unit_price AS DOUBLE), 6) AS unit_price
FROM eu JOIN part ON p_partkey = eu.l_partkey
WHERE p_size <= 10 AND p_type = 'LARGE' AND unit_price = min_price
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""

QUERIES["q2_min_cost_supplier"] = QuerySpec(
    fn=_sql_query(Q2_SPARK_SQL, ("part", "lineitem", "supplier", "nation",
                                 "region")),
    oracle=Q2_SQL,
    doc="TPC-H Q2-style (adapted: observed min unit price from lineitem "
    "stands in for the missing partsupp supply cost): for each small "
    "LARGE-type part, the EUROPE supplier(s) matching the region-wide "
    "minimum unit price. Spark runs the single-pass window-min "
    "formulation (one lineitem aggregate, dims broadcast); the oracle "
    "runs the classic correlated scalar-min subquery — independent "
    "formulations, identical rows; totally-ordered top-100",
)
QUERIES["q11_important_parts"] = QuerySpec(
    fn=_sql_query(Q11_SQL, ("lineitem", "supplier", "nation")),
    oracle=Q11_SQL,
    doc="TPC-H Q11-style (adapted: revenue by part from one nation's "
    "suppliers stands in for partsupp stock value; threshold is 2× the "
    "mean share so it stays scale-invariant, unlike Q11's fixed "
    "fraction/SF): filter against two broadcast scalar aggregates, "
    "DECIMAL cross-multiplied (2·v·n > 3·Σv ⟺ v > 1.5·Σv/n) so the "
    "threshold is order-exact in both engines",
)
QUERIES["q12_priority_lines"] = QuerySpec(
    fn=_sql_query(Q12_SQL, ("orders", "lineitem")),
    oracle=Q12_SQL,
    doc="TPC-H Q12-style (adapted: no l_shipmode/commitdate in testdata "
    "— returnflag classes stand in for ship modes, shipdate-year for "
    "the receipt window): two-class CASE counting of urgent vs other "
    "order priorities per class — pushed date filter, one "
    "shuffle-keyed join, conditional aggregation",
)
QUERIES["q20_promotion_suppliers"] = QuerySpec(
    fn=_sql_query(Q20_SQL, ("supplier", "nation", "lineitem", "part")),
    oracle=Q20_SQL,
    doc="TPC-H Q20-style (adapted: shipped volume above threshold "
    "stands in for the missing partsupp availqty comparison): "
    "suppliers of widget parts who moved >100 units in 1996 — nested "
    "IN subqueries (part semi-join inside a grouped HAVING semi-join) "
    "that Catalyst turns into two left-semi hash joins; completes the "
    "22/22 TPC-H-style derivative suite",
)

CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

CUME_SQL = """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) AS STRING) AS d,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY CAST(CAST(o_orderdate AS DATE) AS STRING)
)
SELECT d, round(CAST(rev AS DOUBLE), 2) AS day_revenue,
       round(CAST(sum(rev) OVER (
         ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS cum_revenue
FROM daily
"""

#: one percentile aggregate evaluating all three quantiles in a single
#: pass over each group (the three-separate-aggregates form re-built the
#: per-group value buffer three times — measured ~2× slower). Engines
#: differ in list syntax (Spark `array(...)`/0-based, DuckDB `[...]`/
#: 1-based) but both do R-7 linear interpolation over the same parquet
#: doubles — bit-equal.
PCT_SQL = """
SELECT l_returnflag,
       round(CAST(ps[0] AS DOUBLE), 4) AS p25,
       round(CAST(ps[1] AS DOUBLE), 4) AS p50,
       round(CAST(ps[2] AS DOUBLE), 4) AS p95,
       n_lines
FROM (
  SELECT l_returnflag,
         percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D)) AS ps,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem
  GROUP BY l_returnflag
)
"""

PCT_ORACLE = """
SELECT l_returnflag,
       round(CAST(ps[1] AS DOUBLE), 4) AS p25,
       round(CAST(ps[2] AS DOUBLE), 4) AS p50,
       round(CAST(ps[3] AS DOUBLE), 4) AS p95,
       n_lines
FROM (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, [0.25, 0.5, 0.95]) AS ps,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem
  GROUP BY l_returnflag
)
"""

QUERIES["q8_market_share"] = QuerySpec(
    fn=_sql_query(
        Q8_SQL,
        ("part", "lineitem", "orders", "customer", "nation", "region",
         "supplier"),
    ),
    oracle=Q8_SQL,
    doc="TPC-H Q8-style: one nation's market share inside a region's "
    "part-type market by order year — 8-way star join where every dim "
    "broadcasts; conditional/total DECIMAL sums divided as DOUBLE",
)
QUERIES["q15_top_supplier"] = QuerySpec(
    fn=_sql_query(Q15_SQL, ("supplier", "lineitem")),
    oracle=Q15_SQL,
    doc="TPC-H Q15-style: top supplier by quarterly revenue — CTE reuse "
    "+ scalar-subquery max, DECIMAL-exact equality (no float ties)",
)
QUERIES["q17_small_quantity"] = QuerySpec(
    fn=_sql_query(Q17_SQL, ("lineitem", "part")),
    oracle=Q17_SQL,
    doc="TPC-H Q17-style: lines below 1/5 of their part's mean quantity "
    "— two correlated scalar subqueries (Catalyst decorrelates both "
    "into aggregated joins), cross-multiplied DECIMAL so the threshold "
    "is order-exact across engines",
)
QUERIES["q_cube_orders"] = QuerySpec(
    fn=_sql_query(CUBE_SQL, ("orders",)),
    oracle=CUBE_SQL,
    doc="GROUP BY CUBE (status × priority): all four grouping levels in "
    "one pass — completes the grouping-sets surface next to ROLLUP",
)
QUERIES["q_cumulative_revenue"] = QuerySpec(
    fn=_sql_query(CUME_SQL, ("orders",)),
    oracle=CUME_SQL,
    doc="running-total window over a daily rollup: cumulative revenue by "
    "day, DECIMAL-exact prefix sums rendered as DOUBLE",
)
QUERIES["q_price_percentiles"] = QuerySpec(
    fn=_sql_query(PCT_SQL, ("lineitem",)),
    oracle=PCT_ORACLE,
    doc="exact interpolated price percentiles per return flag — Spark "
    "`percentile` vs DuckDB `quantile_cont`, same R-7 linear "
    "interpolation over identical parquet doubles",
)


@register(
    "render_ewma",
    f"""
    WITH RECURSIVE pts AS ({PTS}),
    t0 AS (
      SELECT metric, ts - ts % 3600 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    ordered AS (
      SELECT metric, ts, value,
             row_number() OVER (PARTITION BY metric ORDER BY ts) AS rn
      FROM t0
    ),
    rec AS (
      SELECT metric, ts, value, rn, value AS ew FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.metric, o.ts, o.value, o.rn,
             CASE WHEN o.value IS NULL THEN r.ew
                  WHEN r.ew IS NULL THEN o.value
                  ELSE 0.3 * o.value + (1 - 0.3) * r.ew END
      FROM ordered o JOIN rec r ON o.metric = r.metric AND o.rn = r.rn + 1
    )
    SELECT metric, ts,
           round(CASE WHEN value IS NULL THEN NULL ELSE ew END, 6) AS value
    FROM rec
    """,
    "graphite exponentialMovingAverage(series, 0.3) over hourly tier — "
    "inherently recursive (not a window expression): Spark side is a "
    "per-series Arrow applyInPandas scan, oracle replays the recurrence "
    "with a RECURSIVE CTE; (1-α) kept as a computed expression in both "
    "engines so the float math is op-for-op identical",
)
def q_render_ewma(spark, sf_dir):
    from kenshin_spark.functions.render import ewma

    t0 = last_write_wins(_points(spark, sf_dir), 3600, arrival_col="arrival")
    return ewma(t0, 0.3).withColumn("value", F.round("value", 6))


@register(
    "render_moving_stdev",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    sums AS (
      SELECT metric, ts,
             sum(value) OVER w AS s1,
             sum(value * value) OVER w AS s2,
             CAST(count(value) OVER w AS DOUBLE) AS n
      FROM t0
      WINDOW w AS (PARTITION BY metric ORDER BY ts
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT metric, ts,
           round(CASE WHEN n >= 2 THEN
             sqrt(greatest((s2 - s1 * s1 / n) / (n - 1.0), 0.0))
           END, 6) AS value
    FROM sums
    """,
    "graphite movingStdDev(series, 5): trailing sample deviation via the "
    "EXPLICIT two-sum formula in both engines (their native stddev "
    "aggregates use different streaming algorithms with different "
    "rounding paths; two window sums + one scalar expression are "
    "op-for-op identical)",
)
def q_render_moving_stdev(spark, sf_dir):
    from kenshin_spark.functions.render import moving_stdev

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return moving_stdev(t0, 5).withColumn("value", F.round("value", 6))


@register(
    "render_remove_above_percentile",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    cuts AS (
      SELECT metric, quantile_cont(value, 0.95) AS _cut
      FROM t0 GROUP BY metric
    )
    SELECT t0.metric, ts,
           CASE WHEN value <= _cut THEN value END AS value
    FROM t0 JOIN cuts ON t0.metric = cuts.metric
    """,
    "graphite removeAbovePercentile(series, 95): slots above the exact "
    "interpolated per-series P95 become NULL (outlier clipping); the "
    "tiny percentile aggregate broadcasts back onto the stream",
)
def q_render_remove_above_percentile(spark, sf_dir):
    from kenshin_spark.functions.render import remove_above_percentile

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return remove_above_percentile(t0, 95.0)


@register(
    "render_holt_forecast",
    f"""
    WITH RECURSIVE pts AS ({PTS}),
    t0 AS (
      SELECT metric, ts - ts % 3600 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    ordered AS (
      SELECT metric, ts, value,
             row_number() OVER (PARTITION BY metric ORDER BY ts) AS rn
      FROM t0
    ),
    rec AS (
      SELECT metric, ts, value, rn,
             value AS level, CAST(0 AS DOUBLE) AS trend,
             CAST(0 AS DOUBLE) AS dev,
             CAST(NULL AS DOUBLE) AS forecast,
             CAST(NULL AS BOOLEAN) AS aberrant
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.metric, o.ts, o.value, o.rn,
             0.1 * o.value + (1 - 0.1) * (r.level + r.trend),
             0.0035 * ((0.1 * o.value + (1 - 0.1) * (r.level + r.trend))
                       - r.level) + (1 - 0.0035) * r.trend,
             0.1 * abs(o.value - (r.level + r.trend)) + (1 - 0.1) * r.dev,
             r.level + r.trend,
             abs(o.value - (r.level + r.trend)) > 3 * r.dev
      FROM ordered o JOIN rec r ON o.metric = r.metric AND o.rn = r.rn + 1
    )
    SELECT metric, ts, value, round(forecast, 6) AS forecast,
           round(dev, 6) AS deviation,
           CAST(aberrant AS INTEGER) AS aberrant
    FROM rec
    """,
    "Holt double-exponential forecast + EWMA deviation band + 3-sigma "
    "aberration flag (the holtWinters* primitive; season handled by "
    "seasonal_profile) — recursive, so Arrow applyInPandas per series; "
    "oracle replays all three recurrences in one RECURSIVE CTE with "
    "op-for-op identical float expressions. The flag travels as a "
    "nullable INTEGER: NULL booleans render as None on Spark but NaN on "
    "DuckDB through pandas, which breaks order-insensitive comparison; "
    "NULL ints become float64-NaN on BOTH sides",
)
def q_render_holt_forecast(spark, sf_dir):
    from kenshin_spark.functions.render import holt_linear

    t0 = last_write_wins(_points(spark, sf_dir), 3600, arrival_col="arrival")
    return (
        holt_linear(t0)
        .withColumn("forecast", F.round("forecast", 6))
        .withColumn("deviation", F.round("deviation", 6))
        .withColumn("aberrant", F.col("aberrant").cast("int"))
    )


@register(
    "render_group_by_node",
    """
    WITH dotted AS (
      SELECT event_type || '.s' || CAST(user_id % 3 AS VARCHAR) AS metric,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts,
             value, event_id AS arrival
      FROM events
    ),
    t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM dotted GROUP BY 1, 2
    )
    SELECT string_split(metric, '.')[2] AS metric, ts,
           round(sum(value), 6) AS value
    FROM t0 GROUP BY 1, 2
    """,
    "graphite groupByNode(series_list, 1, 'sum') — series paths split on "
    "dots, slots combined per shared segment (the sumSeries family "
    "generalized); dotted paths synthesized as event_type.s<user shard>",
)
def q_render_group_by_node(spark, sf_dir):
    from kenshin_spark.functions.render import group_by_node

    ev = load_table(spark, sf_dir, "events")
    dotted = ev.select(
        F.concat_ws(
            "", F.col("event_type"), F.lit(".s"), (F.col("user_id") % 3)
        ).alias("metric"),
        F.unix_timestamp("ts").cast("long").alias("ts"),
        "value",
        F.col("event_id").alias("arrival"),
    )
    t0 = last_write_wins(dotted, 60, arrival_col="arrival")
    return group_by_node(t0, 1, "sum").withColumn(
        "value", F.round("value", 6)
    )


# ---------------------------------------------------------------------------
# Exact substring-level dedup (Lee et al. 2022 ExactSubstr relaxation)
# ---------------------------------------------------------------------------

@register(
    "dedup_substring_ngram",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 8], ' ')),
                             1, 15))::BIGINT AS gh
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 8)) AS i
        FROM t WHERE len(toks) >= 8
      )
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
    per AS (
      SELECT g.doc_id, count(*) AS dup_grams
      FROM g JOIN dup USING (gh) GROUP BY g.doc_id
    )
    SELECT t.doc_id,
           CAST(greatest(len(t.toks) - 7, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(per.dup_grams, 0) AS BIGINT) AS dup_grams,
           CASE WHEN len(t.toks) >= 8 THEN
             round(CAST(coalesce(per.dup_grams, 0) AS DOUBLE)
                   / (len(t.toks) - 7), 6)
           END AS dup_frac
    FROM t LEFT JOIN per USING (doc_id)
    """,
    "exact substring-level dedup profile (Lee et al. 2022 relaxed to "
    "fixed 8-token windows): per-doc fraction of windows whose exact "
    "text recurs corpus-wide. Windows are row-local JVM expressions "
    "reduced to 60-bit md5 hashes before any shuffle — only 8-byte keys "
    "move, cost linear in total tokens, NO pairwise step",
)
def q_dedup_substring_ngram(spark, sf_dir):
    from kenshin_spark.dedup.substring import duplicated_ngram_profile

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_ngram_profile(docs, w=8, min_count=2)


@register(
    "dedup_substring_top",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(toks[i + 1 : i + 8], ' ') AS gram_text
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 8)) AS i
        FROM t WHERE len(toks) >= 8
      )
    ),
    counts AS (
      SELECT ('0x' || substr(md5(gram_text), 1, 15))::BIGINT AS gh,
             min(gram_text) AS gram_text,
             count(*) AS occurrences,
             count(DISTINCT doc_id) AS n_docs
      FROM g GROUP BY 1
    )
    SELECT gram_text, occurrences, n_docs
    FROM counts ORDER BY occurrences DESC, gh LIMIT 20
    """,
    "boilerplate audit: the 20 most-repeated exact 8-token windows with "
    "their text recovered — counting runs on hashes, text is pulled back "
    "only for the winners via a broadcast semi-join; ties broken by hash "
    "for cross-engine determinism",
)
def q_dedup_substring_top(spark, sf_dir):
    from kenshin_spark.dedup.substring import top_duplicated_grams

    docs = load_table(spark, sf_dir, "documents")
    return top_duplicated_grams(docs, w=8, k=20)


# ---------------------------------------------------------------------------
# Cohort retention over events
# ---------------------------------------------------------------------------

@register(
    "q_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ),
    wk AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
      FROM events
    )
    SELECT f.cohort_week,
           wk.week - f.cohort_week AS week_offset,
           count(DISTINCT wk.user_id) AS n_users
    FROM wk JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    "classic cohort-retention matrix: users bucketed by epoch-week of "
    "first activity, counted at each later active week offset. Two "
    "partial-agg shuffles on user_id (co-partitioned — AQE reuses the "
    "exchange) + one join + one final agg; all integer week arithmetic",
)
def q_retention_cohorts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    week = F.floor(F.unix_timestamp("ts") / 604800).cast("long")
    firsts = ev.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    weeks = ev.select("user_id", week.alias("week")).distinct()
    return (
        weeks.join(firsts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring (pinned-weight linear classifier)
# ---------------------------------------------------------------------------

@register(
    "text_quality_model",
    r"""
    WITH feat AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(len(regexp_extract_all(lower(text),
               '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS BIGINT)
               AS n_stopwords,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS n_digits,
             CAST(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
               AS BIGINT) AS n_punct
      FROM documents
    )
    SELECT doc_id, n_tokens, n_stopwords, n_digits, n_punct,
           30 * n_stopwords + 2 * least(n_tokens, 500)
             - 5 * n_punct - 2 * n_digits AS score,
           (30 * n_stopwords + 2 * least(n_tokens, 500)
             - 5 * n_punct - 2 * n_digits >= 100
            AND n_tokens >= 25) AS keep
    FROM feat
    """,
    "model-based quality filter: a pinned-INTEGER-weight linear scorer "
    "over count features (fasttext-style classifier distilled to exact "
    "arithmetic — a monotone sigmoid never changes the keep decision, "
    "so the logit threshold is evaluated in integer space and is "
    "bit-identical across engines). Row-local, zero shuffles",
)
def q_text_quality_model(spark, sf_dir):
    from kenshin_spark.functions.text import quality_model_score

    docs = load_table(spark, sf_dir, "documents")
    return quality_model_score(docs)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (multimodal extension)
# ---------------------------------------------------------------------------

#: DuckDB replay of the fake 8×8 pixel grid (multimodal/phash.py:fake_pixels)
_PHASH_PX0 = """
  SELECT doc_id, i,
         ('0x' || substr(md5(h || '|' || CAST(i AS VARCHAR)), 1, 2))::BIGINT
           AS p
  FROM (SELECT doc_id, md5(text) AS h,
               unnest(generate_series(0, 63)) AS i
        FROM documents)
"""

#: pixels → mean-threshold bits → 8 bands of 8 bits (shared oracle tail)
_PHASH_BANDS = """
tot AS (SELECT doc_id, sum(p) AS s FROM px GROUP BY doc_id),
bits AS (
  SELECT px.doc_id, i, CASE WHEN p * 64 >= s THEN 1 ELSE 0 END AS bit
  FROM px JOIN tot USING (doc_id)
),
bands AS (
  SELECT doc_id, i // 8 AS band_idx,
         sum(bit * (1 << (i % 8))) AS band_val
  FROM bits GROUP BY doc_id, i // 8
)
"""


@register(
    "mm_phash_bands",
    f"""
    WITH px AS ({_PHASH_PX0}),
    {_PHASH_BANDS}
    SELECT doc_id, CAST(band_idx AS BIGINT) AS band_idx,
           CAST(band_val AS BIGINT) AS band_val
    FROM bands
    """,
    "average-hash image fingerprints as 8×8-bit bands: decode(stub) → "
    "64-cell grid → exact integer mean threshold → banded 64-bit hash. "
    "All row-local JVM higher-order functions (transform/aggregate), "
    "zero shuffles; 8 rows × 16 bytes per image is all that ever moves",
)
def q_mm_phash_bands(spark, sf_dir):
    from kenshin_spark.multimodal.phash import ahash_bands, fake_pixels

    docs = load_table(spark, sf_dir, "documents")
    base = fake_pixels(attach_fake_payload(docs).select("doc_id", "payload"))
    return ahash_bands(base).select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_val")
    ).select(
        "doc_id",
        F.col("band_idx").cast("long").alias("band_idx"),
        F.col("band_val").cast("long").alias("band_val"),
    )


@register(
    "mm_phash_neardup",
    f"""
    WITH px0 AS ({_PHASH_PX0}),
    px AS (
      SELECT doc_id, i, p FROM px0
      UNION ALL
      SELECT doc_id + 100000, i,
             CASE WHEN i IN (5, 17, 42) THEN p + 16 ELSE p END
      FROM px0
    ),
    {_PHASH_BANDS},
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ham AS (
      SELECT c.doc_a, c.doc_b,
             sum(bit_count(CAST(xor(x.band_val, y.band_val) AS BIGINT)))
               AS hamming
      FROM cand c
      JOIN bands x ON x.doc_id = c.doc_a
      JOIN bands y ON y.doc_id = c.doc_b AND y.band_idx = x.band_idx
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM ham WHERE hamming <= 6
    """,
    "perceptual-hash near-dup image pairs at Hamming ≤ 6 over the corpus "
    "plus deterministically perturbed clones (the golden-perturbation "
    "harness — a fake decoder has no perceptual locality, so controlled "
    "pixel edits stand in for re-encoded images). Banded equi-join is a "
    "COMPLETE candidate generator by pigeonhole (6 < 8 bands); exact "
    "bit_count re-verify; only 64-byte fingerprints shuffle",
)
def q_mm_phash_neardup(spark, sf_dir):
    from kenshin_spark.multimodal.phash import (
        fake_pixels,
        perturb_pixels,
        phash_neardup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = fake_pixels(
        attach_fake_payload(docs).select("doc_id", "payload")
    ).select("doc_id", "pixels")
    clones = perturb_pixels(
        base.withColumn("doc_id", F.col("doc_id") + 100000)
    )
    return phash_neardup_pairs(base.unionByName(clones))


# ---------------------------------------------------------------------------
# Bigram-LM coherence
# ---------------------------------------------------------------------------

@register(
    "text_bigram_lm",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2
      )
    ),
    big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    sc AS (
      SELECT bg.doc_id, (big.c2 * 1000000) // uni.c1 AS s
      FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)
    ),
    per AS (
      SELECT doc_id, count(*) AS n_bigrams, sum(s) AS tot
      FROM sc GROUP BY 1
    )
    SELECT toks.doc_id,
           CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN per.n_bigrams > 0 THEN
             round(CAST(per.tot AS DOUBLE) / per.n_bigrams, 6)
           END AS mean_scaled_prob
    FROM toks LEFT JOIN per USING (doc_id)
    """,
    "bigram-LM coherence: mean corpus-conditional transition probability "
    "per document (the perplexity stand-in next to the unigram LM score) "
    "— every probability is the integer (c2*1e6) DIV c1, per-doc sums "
    "are exact, one final division; libm-free and bit-replayable",
)
def q_text_bigram_lm(spark, sf_dir):
    from kenshin_spark.pipeline import bigram_coherence

    docs = load_table(spark, sf_dir, "documents")
    return bigram_coherence(docs)


# ---------------------------------------------------------------------------
# Native session windows (streaming-capable operator, batch-verified)
# ---------------------------------------------------------------------------

@register(
    "q_event_sessions_native",
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
      SELECT *, sum(new_s) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
      ) AS sid FROM s
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_value
    FROM g GROUP BY user_id, sid
    """,
    "Spark's NATIVE session_window operator (the streaming-capable one — "
    "same call tree serves live streams with watermark state eviction) "
    "verified against the lag+cumsum SQL sessionization: merge boundary "
    "is INCLUSIVE (events exactly gap apart merge, probed empirically), "
    "session_end = last event + gap, microsecond-exact timestamps, "
    "DECIMAL-exact value sums",
)
def q_event_sessions_native(spark, sf_dir):
    from kenshin_spark.streaming.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap="30 minutes")


# ---------------------------------------------------------------------------
# Containment near-dup + duplicated-span extraction
# ---------------------------------------------------------------------------

@register(
    "dedup_containment",
    f"""
    WITH sh AS ({_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_inter * 1.0 / za.n_sh, 6) AS containment
    FROM inter i JOIN sizes za ON za.doc_id = i.doc_a
    WHERE round(i.n_inter * 1.0 / za.n_sh, 6) >= 0.5
    """,
    "directed containment near-dup (|A∩B|/|A| ≥ 0.5): the asymmetric "
    "companion to Jaccard — a copied article inside a longer page "
    "scores containment ≈ 1 where Jaccard dilutes; same inverted-index "
    "shingle join, Σ|bucket|² cost, never all-pairs",
)
def q_dedup_containment(spark, sf_dir):
    from kenshin_spark.dedup.ngram import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )


@register(
    "dedup_substring_spans",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 8], ' ')),
                             1, 15))::BIGINT AS gh
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 8)) AS i
        FROM t WHERE len(toks) >= 8
      )
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
    pos AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos
             ) AS grp
      FROM pos
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(*) + 7 AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
    """,
    "the actionable output of substring dedup (Lee et al. remove SPANS, "
    "not documents): maximal runs of consecutive duplicated 8-token "
    "windows per doc via the pos - row_number() island trick; a "
    "duplicated region of L tokens yields span_tokens = L exactly",
)
def q_dedup_substring_spans(spark, sf_dir):
    from kenshin_spark.dedup.substring import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, w=8, min_count=2)


# ---------------------------------------------------------------------------
# Per-metric value histogram (Prometheus-style distribution over tier0)
# ---------------------------------------------------------------------------

@register(
    "ts_value_histogram",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric,
           CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_slots
    FROM t0 WHERE value IS NOT NULL
    GROUP BY metric, floor(value / 25.0)
    """,
    "Prometheus-style per-metric value distribution over the LWW tier0 "
    "stream: fixed-width histogram buckets via floor(value/width) — one "
    "double division then floor, bit-identical across engines; a "
    "single partial-aggregated shuffle keyed (metric, bucket), output "
    "is bounded by metrics × occupied buckets so it always broadcasts "
    "back for alerting joins",
)
def q_ts_value_histogram(spark, sf_dir):
    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    bucket = F.floor(F.col("value") / 25.0).cast("long")
    return (
        t0.where(F.col("value").isNotNull())
        .groupBy("metric", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_slots"))
        .select(
            "metric",
            "bucket",
            (F.col("bucket") * 25.0).alias("bucket_lo"),
            "n_slots",
        )
    )


# ---------------------------------------------------------------------------
# Corpus quality report + IVF index health
# ---------------------------------------------------------------------------

@register(
    "pipeline_quality_report",
    rf"""
    WITH f AS (
      SELECT doc_id, source,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stopwords,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
      FROM documents
    ),
    r AS (
      SELECT source, n_tokens,
             (n_tokens >= 25 AND n_tokens <= 100000
              AND n_chars >= 3 * n_tokens AND n_chars <= 10 * n_tokens
              AND n_stopwords >= 2
              AND n_alpha * 50 >= n_chars * 41) AS keep
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           round(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS keep_rate
    FROM r GROUP BY source
    """,
    "the curation dashboard: per-source doc/token counts, Gopher-rule "
    "keep counts and keep rate — what a data-engineering team reviews "
    "before committing a training mix. Row-local rules + one "
    "partial-agg shuffle keyed by source; all-integer rule arithmetic",
)
def q_pipeline_quality_report(spark, sf_dir):
    from kenshin_spark.functions.text import quality_verdict, token_count

    docs = load_table(spark, sf_dir, "documents")
    keep = quality_verdict("text")["keep"]
    base = docs.select(
        "source",
        keep.alias("_keep"),
        token_count("text").cast("long").alias("_tok"),
    )
    kept1 = F.when(F.col("_keep"), 1).otherwise(0)
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept1).alias("n_kept"),
        F.sum("_tok").alias("n_tokens"),
        F.sum(F.when(F.col("_keep"), F.col("_tok")).otherwise(0)).alias(
            "kept_tokens"
        ),
        F.round(F.sum(kept1) * 1.0 / F.count(F.lit(1)), 6).alias("keep_rate"),
    )


@register(
    "emb_ivf_cell_stats",
    f"""
    WITH cent AS (
      SELECT c, cv, list_dot_product(cv, cv) AS cc
      FROM ({_pinned_sample_cte(8)})
    ),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, cent.c AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY cent.cc
                   - 2 * list_dot_product(e.embedding::DOUBLE[], cent.cv),
                   cent.c
               ) AS rn
        FROM embeddings e, cent
      ) WHERE rn = 1
    ),
    tot AS (SELECT count(*) AS n FROM embeddings)
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(count(*) * 8.0 / tot.n, 6) AS balance
    FROM asg, tot GROUP BY cell, tot.n
    """,
    "IVF index health: per-cell population and balance factor of the "
    "pinned coarse quantizer (balance = n·cells/N; a hot cell means "
    "probe over-scan and a skewed Parquet partition at 100 TB) — the "
    "monitoring query after every index (re)build; assignment replayed "
    "bit-exactly by the oracle",
)
def q_emb_ivf_cell_stats(spark, sf_dir):
    from kenshin_spark.similarity.pinned import ivf_cell_stats_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_cell_stats_pinned(emb, n_cells=8)


# ---------------------------------------------------------------------------
# Hopping (sliding) windows
# ---------------------------------------------------------------------------

@register(
    "q_events_hopping_window",
    """
    WITH e AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts, value
      FROM events
    ),
    w AS (
      SELECT event_type, value, (ts - ts % 1800) - k * 1800 AS w_start
      FROM e, generate_series(0, 1) s(k)
    )
    SELECT event_type,
           w_start AS window_start,
           w_start + 3600 AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_value
    FROM w GROUP BY 1, 2, 3
    """,
    "Spark's native HOPPING window (1 h windows sliding every 30 min — "
    "the streaming-dashboard staple next to tumbling q_events_daily and "
    "session q_event_sessions_native): each event lands in dur/slide "
    "aligned windows; the oracle replays the assignment with a "
    "generate_series fan-out. Epoch-aligned starts, DECIMAL-exact sums; "
    "one partial-agg shuffle keyed (window, type)",
)
def q_events_hopping_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp("window.start").cast("long").alias("window_start"),
            F.unix_timestamp("window.end").cast("long").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Incremental substring dedup (daily-ingest shape)
# ---------------------------------------------------------------------------

@register(
    "dedup_substring_incremental",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 8], ' ')),
                             1, 15))::BIGINT AS gh
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 8)) AS i
        FROM t WHERE len(toks) >= 8
      )
    ),
    idx AS (
      SELECT gh, count(*) AS occ FROM g WHERE doc_id % 10 <> 0 GROUP BY gh
    ),
    bg AS (SELECT * FROM g WHERE doc_id % 10 = 0),
    bocc AS (SELECT gh, count(*) AS bocc FROM bg GROUP BY gh),
    dup AS (
      SELECT gh FROM bocc LEFT JOIN idx USING (gh)
      WHERE bocc + coalesce(occ, 0) >= 2
    ),
    per AS (
      SELECT bg.doc_id, count(*) AS dup_grams
      FROM bg JOIN dup USING (gh) GROUP BY bg.doc_id
    )
    SELECT t.doc_id,
           CAST(greatest(len(t.toks) - 7, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(per.dup_grams, 0) AS BIGINT) AS dup_grams,
           CASE WHEN len(t.toks) >= 8 THEN
             round(CAST(coalesce(per.dup_grams, 0) AS DOUBLE)
                   / (len(t.toks) - 7), 6)
           END AS dup_frac
    FROM t LEFT JOIN per USING (doc_id)
    WHERE t.doc_id % 10 = 0
    """,
    "incremental substring dedup — the daily-ingest shape next to "
    "dedup_minhash_incremental: only the new batch (doc_id % 10 = 0) is "
    "tokenized; the corpus contributes its persisted (gram-hash, occ) "
    "index through one hash-keyed join. Per-batch cost is O(batch "
    "tokens + collisions); intra-batch repeats still count via "
    "batch_occ + corpus_occ >= 2",
)
def q_dedup_substring_incremental(spark, sf_dir):
    from kenshin_spark.dedup.substring import (
        duplicated_profile_against_index,
        substring_gram_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    new = docs.where("doc_id % 10 = 0")
    corpus = docs.where("doc_id % 10 <> 0")
    return duplicated_profile_against_index(
        new, substring_gram_index(corpus, w=8), w=8, min_count=2
    )


# ---------------------------------------------------------------------------
# Dedup cluster-size distribution
# ---------------------------------------------------------------------------

@register(
    "dedup_cluster_stats",
    f"""
    WITH base AS ({_clusters_oracle()}),
    sizes AS (
      SELECT cluster_id, count(*) AS sz FROM base GROUP BY cluster_id
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
    "the dedup dashboard: duplicate-cluster size distribution (how much "
    "of the corpus is 2x, 3x, Nx duplicated) over the same connected "
    "components as dedup_clusters; two tiny aggregations on top of the "
    "CC output — at scale run against the materialized cluster table, "
    "not a recompute",
)
def q_dedup_cluster_stats(spark, sf_dir):
    from kenshin_spark.dedup import duplicate_clusters

    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )
    cc = duplicate_clusters(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .groupBy(F.col("_sz").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Token diversity, embedding norm profile, Pareto analysis
# ---------------------------------------------------------------------------

@register(
    "text_token_diversity",
    r"""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> '' GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           round(1.0 - CAST(sum(tf * tf) AS DOUBLE)
                       / (sum(tf) * sum(tf)), 6) AS simpson
    FROM tf GROUP BY doc_id
    """,
    "token-level Simpson diversity (1 - Σtf²/n²): the numeric "
    "concentration score next to the rule-based repetition filter — "
    "degenerate repeated-token text scores near 0, diverse text near "
    "1. Exact integer sums, one division; two partial-agg shuffles",
)
def q_text_token_diversity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.round(
            1.0
            - F.sum(F.col("tf") * F.col("tf")).cast("double")
            / (F.sum("tf") * F.sum("tf")),
            6,
        ).alias("simpson"),
    )


@register(
    "emb_norm_profile",
    """
    WITH norms AS (
      SELECT label,
             round(sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])), 6) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           min(nrm) AS min_norm,
           max(nrm) AS max_norm,
           round(CAST(sum(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS mean_norm
    FROM norms GROUP BY label
    """,
    "embedding data-quality profile: per-label vector-norm range and "
    "mean (unnormalized or zero vectors break cosine retrieval — this "
    "is the check before building any index). Norms are row-local "
    "sequential folds rounded to 6dp, then summed through DECIMAL so "
    "the mean is order-exact; one partial-agg shuffle keyed by label",
)
def q_emb_norm_profile(spark, sf_dir):
    from kenshin_spark.functions.vectors import dot_product

    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.round(
        F.sqrt(dot_product(F.col("embedding"), F.col("embedding"))), 6
    )
    return (
        emb.select("label", nrm.alias("_nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("_nrm").alias("min_norm"),
            F.max("_nrm").alias("max_norm"),
            F.round(
                F.sum(F.col("_nrm").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_norm"),
        )
    )


@register(
    "q_customer_pareto",
    """
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT sum(r) AS t FROM rev),
    ranked AS (
      SELECT o_custkey, r,
             row_number() OVER (ORDER BY r DESC, o_custkey) AS rnk,
             sum(r) OVER (ORDER BY r DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    )
    SELECT o_custkey,
           CAST(rnk AS BIGINT) AS rank,
           round(CAST(r AS DOUBLE), 2) AS revenue,
           round(CAST(cum AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
             AS cum_share
    FROM ranked, tot WHERE rnk <= 100
    """,
    "Pareto / top-contributor analysis: customers ranked by lifetime "
    "revenue with the cumulative revenue share ('does 20% of customers "
    "drive 80%?'). DECIMAL-exact running sums (order-free), one "
    "deterministic global window over the customer-level aggregate "
    "(small after the groupBy — never over raw orders)",
)
def q_customer_pareto(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_r")
    )
    total = rev.agg(F.sum("_r")).collect()[0][0]  # scalar agg
    w = Window.orderBy(F.col("_r").desc(), "o_custkey")
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "_cum",
            F.sum("_r").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .where(F.col("rank") <= 100)
        .select(
            "o_custkey",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("_r").cast("double"), 2).alias("revenue"),
            F.round(
                F.col("_cum").cast("double") / float(total), 6
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# Integer-scaled PageRank over the token-transition graph
# ---------------------------------------------------------------------------

def _pagerank_iter(prev: str) -> str:
    return f"""
  SELECT n.tok, 150000 + (85 * coalesce(s.contrib, 0)) // 100 AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.w2 AS tok, sum((p.pr * e.c) // o.tot) AS contrib
    FROM e JOIN {prev} p ON p.tok = e.w1 JOIN outd o ON o.w1 = e.w1
    GROUP BY e.w2) s ON s.tok = n.tok
"""


@register(
    "text_token_pagerank",
    rf"""
    WITH toks AS (
      SELECT string_split_regex(trim(lower(text)), '\s+') AS ts
      FROM documents
    ),
    bg AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
            FROM toks)
    ),
    e AS (
      SELECT w1, w2, count(*) AS c FROM bg
      GROUP BY 1, 2 HAVING count(*) >= 10
    ),
    outd AS (SELECT w1, sum(c) AS tot FROM e GROUP BY w1),
    nodes AS (
      SELECT DISTINCT tok FROM (
        SELECT w1 AS tok FROM e UNION ALL SELECT w2 FROM e)
    ),
    p0 AS (SELECT tok, CAST(1000000 AS BIGINT) AS pr FROM nodes),
    it1 AS ({_pagerank_iter('p0')}),
    it2 AS ({_pagerank_iter('it1')}),
    it3 AS ({_pagerank_iter('it2')})
    SELECT tok, CAST(pr AS BIGINT) AS pagerank
    FROM it3 ORDER BY pr DESC, tok LIMIT 50
    """,
    "weighted PageRank over the token-transition graph (3 power "
    "iterations, edges = bigrams with support ≥ 10) — an ITERATIVE "
    "numeric graph algorithm with a bit-exact oracle: ranks are "
    "integer-scaled (×1e6), damping is ×85//100, contributions are "
    "integer floor divisions, so sums are order-free and the SQL "
    "oracle unrolls the identical iterations. Pregel step = 2 hash "
    "joins + 1 partial-agg shuffle per round, vocab-sized state",
)
def q_text_token_pagerank(spark, sf_dir):
    from kenshin_spark.functions.graph import token_pagerank

    docs = load_table(spark, sf_dir, "documents")
    return token_pagerank(docs, min_support=10, iters=3, k=50)


# ---------------------------------------------------------------------------
# Semi-structured (JSON) property extraction + batch counter rate
# ---------------------------------------------------------------------------

@register(
    "q_events_json_props",
    r"""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_even
    FROM x GROUP BY event_type
    """,
    "semi-structured property extraction: parse the events.props JSON "
    "column (Spark get_json_object ≡ DuckDB json_extract_string) and "
    "aggregate the extracted integer per event type — the schema-on-read "
    "path every event pipeline needs; JSON parsing is JVM-side, "
    "all-integer aggregates, one partial-agg shuffle",
)
def q_events_json_props(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    x = ev.select("event_type", k.alias("k"))
    return x.groupBy("event_type").agg(
        F.count("k").cast("long").alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_even"),
    )


@register(
    "ts_counter_rate",
    f"""
    WITH pts AS ({PTS}),
    mono AS (
      SELECT metric, ts,
             sum(CAST(floor(value) AS BIGINT)) OVER (
               PARTITION BY metric ORDER BY ts, arrival
               ROWS UNBOUNDED PRECEDING
             ) AS counter
      FROM pts
    ),
    d AS (
      SELECT metric, ts,
             counter - lag(counter) OVER w AS dv,
             ts - lag(ts) OVER w AS dt
      FROM mono WINDOW w AS (PARTITION BY metric ORDER BY ts)
    )
    SELECT metric, ts,
           CASE WHEN dt > 0 AND dv >= 0 THEN dv / dt END AS rate
    FROM d
    """,
    "Prometheus-style counter rate (batch twin of the streaming "
    "with_counter_rate): per-sample positive delta over elapsed time, "
    "negative deltas (counter resets) -> NULL instead of a huge "
    "negative spike. Monotone counter synthesized by a running sum so "
    "the semantics are exercised on this corpus; dv and dt come from "
    "the same lag windows in both engines; the counter accumulates "
    "INTEGER increments (floor(value)) because engines associate "
    "windowed float sums differently (segment tree vs running) — "
    "integer sums are association-free, then rate is one exact "
    "division",
)
def q_ts_counter_rate(spark, sf_dir):
    from pyspark.sql import Window

    pts = _points(spark, sf_dir)
    wsum = (
        Window.partitionBy("metric")
        .orderBy("ts", "arrival")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mono = pts.select(
        "metric",
        "ts",
        F.sum(F.floor("value").cast("long")).over(wsum).alias("counter"),
    )
    w = Window.partitionBy("metric").orderBy("ts")
    dv = F.col("counter") - F.lag("counter").over(w)
    dt = F.col("ts") - F.lag("ts").over(w)
    return mono.select(
        "metric",
        "ts",
        F.when((dt > 0) & (dv >= 0), dv / dt).alias("rate"),
    )


# ---------------------------------------------------------------------------
# Pivot, availability SLA, inter-order gaps
# ---------------------------------------------------------------------------

@register(
    "q_orders_pivot",
    """
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             AS ym,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS F,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS O,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS P
    FROM orders GROUP BY 1
    """,
    "Spark's pivot API (groupBy(ym).pivot(status, [F,O,P]).count()): "
    "month × order-status wide counts — the explicit value list keeps "
    "the plan a single pass (no distinct-values pre-query) and the "
    "output schema deterministic; oracle spells the same table as CASE "
    "sums",
)
def q_orders_pivot(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    out = (
        orders.groupBy(ym.alias("ym"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "ym",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ("F", "O", "P")],
    )


@register(
    "ts_availability",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    bounds AS (
      SELECT ((now - 86400 + 59) // 60) * 60 AS from_r,
             ((now + 59) // 60) * 60 AS until_r
      FROM now_t
    ),
    slots AS (
      SELECT metric, count(DISTINCT ts - ts % 60) AS n_present
      FROM pts, bounds
      WHERE ts >= from_r AND ts < until_r
      GROUP BY metric
    )
    SELECT s.metric,
           CAST(s.n_present AS BIGINT) AS present_slots,
           CAST((b.until_r - b.from_r) / 60 AS BIGINT) AS expected_slots,
           round(s.n_present * 1.0 / ((b.until_r - b.from_r) / 60), 6)
             AS availability
    FROM slots s, bounds b
    """,
    "SLA availability: per metric, the fraction of expected tier0 slots "
    "carrying at least one point over the trailing 24 h — the uptime "
    "dashboard every TSDB serves; exact integer slot counts, one "
    "division",
)
def q_ts_availability(spark, sf_dir):
    pts = _points(spark, sf_dir)
    now = _now(pts)
    from_r = -(-(now - 86400) // 60) * 60
    until_r = -(-now // 60) * 60
    expected = (until_r - from_r) // 60
    return (
        pts.where((F.col("ts") >= from_r) & (F.col("ts") < until_r))
        .groupBy("metric")
        .agg(
            F.countDistinct(F.col("ts") - F.col("ts") % 60).alias("_p")
        )
        .select(
            "metric",
            F.col("_p").cast("long").alias("present_slots"),
            F.lit(expected).cast("long").alias("expected_slots"),
            F.round(F.col("_p") * 1.0 / expected, 6).alias("availability"),
        )
    )


@register(
    "q_median_order_gap",
    """
    WITH gaps AS (
      SELECT o_custkey,
             CAST(floor(epoch(o_orderdate)) AS BIGINT)
               - lag(CAST(floor(epoch(o_orderdate)) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                 ) AS gap
      FROM orders
    )
    SELECT o_custkey,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           round(CAST(quantile_cont(gap, 0.5) AS DOUBLE) / 86400.0, 6)
             AS median_gap_days
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY o_custkey HAVING count(gap) >= 3
    """,
    "repeat-purchase cadence: per customer, the exact interpolated "
    "median gap between consecutive orders (lag window + grouped "
    "percentile, R-7 interpolation in both engines over exact integer "
    "second gaps), customers with ≥ 3 gaps",
)
def q_median_order_gap(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    ep = F.unix_timestamp("o_orderdate").cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey", (ep - F.lag(ep).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("gap").cast("long").alias("n_gaps"),
            F.round(
                F.expr("percentile(gap, 0.5)") / 86400.0, 6
            ).alias("median_gap_days"),
        )
        .where(F.col("n_gaps") >= 3)
    )


# ---------------------------------------------------------------------------
# Unpivot (melt) + higher-order-function filter
# ---------------------------------------------------------------------------

@register(
    "q_lineitem_unpivot",
    """
    WITH long AS (
      SELECT 'l_quantity' AS measure,
             CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2))
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT measure,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(min(v) AS DOUBLE), 2) AS min_v,
           round(CAST(max(v) AS DOUBLE), 2) AS max_v,
           round(CAST(sum(v) AS DOUBLE), 2) AS sum_v
    FROM long GROUP BY measure
    """,
    "Spark's unpivot/melt API: four numeric lineitem measures to long "
    "form, then one grouped profile — wide→long is the standard reshape "
    "before per-measure statistics; DECIMAL casts keep the sums exact; "
    "oracle spells the melt as UNION ALL",
)
def q_lineitem_unpivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = li.select(
        *[F.col(c).cast("decimal(18,2)").alias(c) for c in cols]
    ).unpivot([], cols, "measure", "v")
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("v").cast("double"), 2).alias("min_v"),
        F.round(F.max("v").cast("double"), 2).alias("max_v"),
        F.round(F.sum("v").cast("double"), 2).alias("sum_v"),
    )


@register(
    "emb_sparsity",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding::DOUBLE[],
                                x -> abs(x) < 0.05)) AS BIGINT)
             AS n_small,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(len(list_filter(embedding::DOUBLE[],
                                 x -> abs(x) < 0.05)) * 1.0
                 / len(embedding), 6) AS small_frac
    FROM embeddings
    """,
    "embedding sparsity profile via the filter higher-order function "
    "(JVM lambda, zero shuffles): per-vector count and fraction of "
    "near-zero components — dead dimensions waste index memory and "
    "distort cosine; exact double comparison, one division",
)
def q_emb_sparsity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n_small = F.size(
        F.filter("embedding", lambda x: F.abs(x) < 0.05)
    ).cast("long")
    return emb.select(
        "vec_id",
        n_small.alias("n_small"),
        F.size("embedding").cast("long").alias("dim"),
        F.round(n_small * 1.0 / F.size("embedding"), 6).alias("small_frac"),
    )


# ---------------------------------------------------------------------------
# Render pipeline chain (the serving path, end-to-end)
# ---------------------------------------------------------------------------

@register(
    "render_chain_pipeline",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    bounds AS (
      SELECT ((now - 21600 + 299) // 300) * 300 AS from_r,
             ((now + 299) // 300) * 300 AS until_r
      FROM now_t
    ),
    tier1 AS (
      SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
      FROM pts GROUP BY 1, 2
    ),
    grid AS (
      SELECT m.metric,
             unnest(generate_series(b.from_r, b.until_r - 300, 300)) AS ts
      FROM (SELECT DISTINCT metric FROM pts) m, bounds b
    ),
    g AS (
      SELECT g.metric, g.ts, t.value
      FROM grid g LEFT JOIN tier1 t ON g.metric = t.metric AND g.ts = t.ts
    ),
    filled AS (
      SELECT metric, ts,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY metric ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS value
      FROM g
    ),
    smoothed AS (
      SELECT metric, ts,
             avg(value) OVER (
               PARTITION BY metric ORDER BY ts
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
             ) AS value
      FROM filled
    )
    SELECT metric, ts, round(value * 2.0, 6) AS value FROM smoothed
    """,
    "a graphite-api target pipeline end-to-end through apply_chain: "
    "keepLastValue() | movingAverage(5) | scale(2) over a fetched grid "
    "— proves the registry composes the way the serving layer chains "
    "user requests; each stage reuses the oracled single-op shapes",
)
def q_render_chain_pipeline(spark, sf_dir):
    from kenshin_spark.functions.render import apply_chain

    pts = _points(spark, sf_dir)
    now = _now(pts)
    tier1 = downsample(pts, 300, "average").withColumn(
        "value", F.round("value", 6)
    )
    grid = grid_fill(tier1, pts.select("metric").distinct(), now - 21600,
                     now, 300)
    out = apply_chain(
        grid,
        [("keepLastValue",), ("movingAverage", 5), ("scale", 2.0)],
    )
    # one terminal 6dp round absorbs windowed-avg association noise
    # (segment tree vs running accumulation), same as the single-op
    # render queries
    return out.withColumn("value", F.round("value", 6))


# ---------------------------------------------------------------------------
# Rolling distinct users + flatline detection
# ---------------------------------------------------------------------------

@register(
    "q_rolling_weekly_users",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM act),
    contrib AS (
      SELECT user_id, day + k AS report_day
      FROM act, generate_series(0, 6) s(k)
    )
    SELECT d.day AS report_day,
           count(DISTINCT c.user_id) AS wau
    FROM days d JOIN contrib c ON c.report_day = d.day
    GROUP BY d.day
    """,
    "rolling 7-day active users (WAU) per observed day — the sliding "
    "COUNT DISTINCT that window functions can't express: each (user, "
    "day) activity row fans out to the 7 report days it supports "
    "(generate_series explode), then one distinct-agg per day. "
    "Contribution fan-out is 7x the per-day activity table (tiny), "
    "never 7x the event stream",
)
def q_rolling_weekly_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    act = ev.select("user_id", day.alias("day")).distinct()
    days = act.select("day").distinct()
    contrib = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("report_day"),
    )
    return (
        days.join(contrib, days["day"] == contrib["report_day"])
        .groupBy(days["day"].alias("report_day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "ts_flatline_detect",
    f"""
    WITH pts AS ({PTS}), now_t AS ({NOW_T}),
    bounds AS (
      SELECT ((now - 21600 + 299) // 300) * 300 AS from_r,
             ((now + 299) // 300) * 300 AS until_r
      FROM now_t
    ),
    tier1 AS (
      SELECT metric, ts - ts % 300 AS ts, round(avg(value), 6) AS value
      FROM pts GROUP BY 1, 2
    ),
    grid AS (
      SELECT m.metric,
             unnest(generate_series(b.from_r, b.until_r - 300, 300)) AS ts
      FROM (SELECT DISTINCT metric FROM pts) m, bounds b
    ),
    g AS (
      SELECT g.metric, g.ts, t.value
      FROM grid g LEFT JOIN tier1 t ON g.metric = t.metric AND g.ts = t.ts
    ),
    filled AS (
      SELECT metric, ts,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY metric ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS value
      FROM g
    ),
    marked AS (
      SELECT metric, ts, value,
             CASE WHEN value IS NOT NULL
                   AND value = lag(value) OVER w
                  THEN 0 ELSE 1 END AS brk
      FROM filled WINDOW w AS (PARTITION BY metric ORDER BY ts)
    ),
    runs AS (
      SELECT metric, ts, value,
             sum(brk) OVER (PARTITION BY metric ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    )
    SELECT metric,
           CAST(min(ts) AS BIGINT) AS run_start,
           CAST(count(*) AS BIGINT) AS run_len,
           min(value) AS value
    FROM runs WHERE value IS NOT NULL
    GROUP BY metric, run_id HAVING count(*) >= 3
    """,
    "stale/stuck-series detection over the keepLastValue-filled grid "
    "(a flat run of ≥ 3 slots = no fresh data for 15+ min — exactly how "
    "a stuck dashboard looks): value = lag(value) breaks + running-sum "
    "run ids (the island trick); exact double equality, integer run "
    "arithmetic",
)
def q_ts_flatline_detect(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.functions.render import keep_last_value

    pts = _points(spark, sf_dir)
    now = _now(pts)
    tier1 = downsample(pts, 300, "average").withColumn(
        "value", F.round("value", 6)
    )
    grid = grid_fill(tier1, pts.select("metric").distinct(), now - 21600,
                     now, 300)
    t0 = keep_last_value(grid)
    w = Window.partitionBy("metric").orderBy("ts")
    brk = F.when(
        F.col("value").isNotNull()
        & (F.col("value") == F.lag("value").over(w)),
        0,
    ).otherwise(1)
    runs = t0.select(
        "metric",
        "ts",
        "value",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("run_id"),
    )
    return (
        runs.where(F.col("value").isNotNull())
        .groupBy("metric", "run_id")
        .agg(
            F.min("ts").cast("long").alias("run_start"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("value").alias("value"),
        )
        .where(F.col("run_len") >= 3)
        .select("metric", "run_start", "run_len", "value")
    )


# ---------------------------------------------------------------------------
# Substring-dedup removal (the scrub step)
# ---------------------------------------------------------------------------

@register(
    "dedup_substring_scrub",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 8], ' ')),
                             1, 15))::BIGINT AS gh
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 8)) AS i
        FROM t WHERE len(toks) >= 8
      )
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT g.doc_id, g.pos + k AS i
      FROM g JOIN dup USING (gh), generate_series(0, 7) s(k)
    ),
    tokpos AS (
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS i
      FROM t
    ),
    keptagg AS (
      SELECT tp.doc_id,
             count(*) AS kept,
             string_agg(tp.tok, ' ' ORDER BY tp.i) AS clean
      FROM tokpos tp
      LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.i = tp.i
      WHERE cov.i IS NULL
      GROUP BY tp.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - coalesce(k.kept, 0) AS BIGINT)
             AS removed_tokens,
           CAST(coalesce(k.kept, 0) AS BIGINT) AS kept_tokens,
           md5(coalesce(k.clean, '')) AS clean_md5
    FROM t LEFT JOIN keptagg k USING (doc_id)
    """,
    "the REMOVAL step completing exact substring dedup (Lee et al. "
    "scrub duplicated spans, keep the rest): per doc, every token "
    "covered by a duplicated window is dropped and the survivors "
    "re-joined; the scrub itself is ONE row-local filter expression "
    "over the token array (span starts collected per doc — tiny), and "
    "clean_md5 verifies the edited text byte-exactly without shuffling "
    "text",
)
def q_dedup_substring_scrub(spark, sf_dir):
    from kenshin_spark.dedup.substring import remove_duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, w=8, min_count=2)


# ---------------------------------------------------------------------------
# Year-over-year growth
# ---------------------------------------------------------------------------

@register(
    "q_orders_yoy_growth",
    """
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS ym,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT cur.ym,
           round(CAST(cur.rev AS DOUBLE), 2) AS revenue,
           round(CAST(prev.rev AS DOUBLE), 2) AS prev_year_revenue,
           CASE WHEN prev.rev IS NOT NULL THEN
             round(CAST(cur.rev - prev.rev AS DOUBLE)
                   / CAST(prev.rev AS DOUBLE), 6)
           END AS yoy_growth
    FROM m cur LEFT JOIN m prev ON prev.ym = cur.ym - 100
    """,
    "year-over-year monthly revenue growth: monthly DECIMAL rollup "
    "self-joined on ym-100 (an equi-join on the month key — no window "
    "sort over raw orders); growth ratio divides exact decimals once; "
    "months without a prior year keep NULL growth",
)
def q_orders_yoy_growth(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    m = orders.groupBy(ym.alias("ym")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    cur = m.alias("cur")
    prev = m.select(
        (F.col("ym") + 100).alias("_ym"), F.col("rev").alias("_prev")
    )
    return (
        cur.join(prev, F.col("ym") == F.col("_ym"), "left")
        .select(
            "ym",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(F.col("_prev").cast("double"), 2).alias(
                "prev_year_revenue"
            ),
            F.when(
                F.col("_prev").isNotNull(),
                F.round(
                    (F.col("rev") - F.col("_prev")).cast("double")
                    / F.col("_prev").cast("double"),
                    6,
                ),
            ).alias("yoy_growth"),
        )
    )


# ---------------------------------------------------------------------------
# Promotions: pytest-only components -> driver-green rows
# ---------------------------------------------------------------------------


def _leakage_split_oracle() -> str:
    # Replays the full chain in SQL: MinHash-LSH pairs -> connected
    # components (recursive reachability, min label = the Spark
    # min-label-propagation fixpoint) -> md5 split bucket on the cluster
    # representative (the sampling module's SQL twin), unpaired docs
    # falling through to their own id.
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node AS doc_id, min(lbl) AS rep FROM reach GROUP BY node)
    SELECT d.doc_id,
           CASE WHEN ('0x' || substr(md5('split|' ||
                  CAST(coalesce(cc.rep, d.doc_id) AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 < 100000
                THEN 'eval' ELSE 'train' END AS split
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
    """


@register(
    "pipeline_leakage_split",
    _leakage_split_oracle(),
    "leakage-safe train/eval split: documents are bucketed by their "
    "duplicate-CLUSTER representative (connected components over the "
    "MinHash-LSH pair graph), so a near-dup can never straddle the "
    "boundary; unpaired docs hash on their own id. Only the label table "
    "(<= |paired docs|) shuffles — the corpus takes one AQE-sized left "
    "join. The oracle replays pairs, components, and the md5 bucket",
)
def q_pipeline_leakage_split(spark, sf_dir):
    from kenshin_spark.pipeline import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    return leakage_safe_split(docs, pairs, eval_rate=0.1, seed="split").select(
        "doc_id", "split"
    )


@register(
    "dedup_cross_neardup",
    """
    WITH bench AS (SELECT * FROM embeddings WHERE vec_id % 20 = 0),
    corpus AS (SELECT * FROM embeddings WHERE vec_id % 20 <> 0)
    SELECT c.vec_id AS left_id, b.vec_id AS right_id,
           round(
             list_dot_product(c.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) AS cosine
    FROM corpus c, bench b
    WHERE round(
             list_dot_product(c.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) >= 0.4
    """,
    "bipartite embedding decontamination: corpus x benchmark cosine "
    "pairs >= 0.4 — the semantic twin of shingle decontamination "
    "(catches paraphrases n-gram overlap misses). The benchmark side "
    "broadcasts, the threshold prefilters inside the join condition, "
    "and the corpus never shuffles — at 100 TB the only moving part is "
    "the small eval set",
)
def q_dedup_cross_neardup(spark, sf_dir):
    from kenshin_spark.dedup.embedding import cross_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 20 == 0)
    corpus = emb.where(F.col("vec_id") % 20 != 0)
    return cross_neardup_pairs(corpus, bench, threshold=0.4)


@register(
    "text_token_drift",
    r"""
    WITH old_c AS (
      SELECT tok AS token, count(*) AS old_count FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents WHERE CAST(substr(source, 4, 10) AS INT) < 10
      ) WHERE tok <> '' GROUP BY 1
    ),
    new_c AS (
      SELECT tok AS token, count(*) AS new_count FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents WHERE CAST(substr(source, 4, 10) AS INT) >= 10
      ) WHERE tok <> '' GROUP BY 1
    ),
    j AS (
      SELECT coalesce(o.token, n.token) AS token,
             coalesce(o.old_count, 0) AS old_count,
             coalesce(n.new_count, 0) AS new_count
      FROM old_c o FULL OUTER JOIN new_c n ON o.token = n.token
    ),
    tot AS (SELECT sum(old_count) AS t_o, sum(new_count) AS t_n FROM j)
    SELECT token, old_count, new_count,
           round(old_count * 1e6 / t_o, 3) AS old_ppm,
           round(new_count * 1e6 / t_n, 3) AS new_ppm,
           round(power(old_count - (old_count + new_count) / (t_o + t_n) * t_o, 2)
                   / ((old_count + new_count) / (t_o + t_n) * t_o)
                 + power(new_count - (old_count + new_count) / (t_o + t_n) * t_n, 2)
                   / ((old_count + new_count) / (t_o + t_n) * t_n),
                 6) AS chi2
    FROM j, tot
    ORDER BY chi2 DESC, token LIMIT 50
    """,
    "token-distribution drift between two corpus snapshots (sources "
    "src0-9 vs src10-19): per-token chi-square contribution against the "
    "pooled distribution, top-50 movers. One explode + vocab-sized "
    "count per side, a vocab x vocab full-outer join, totals broadcast "
    "— corpus bytes are read exactly once per side",
)
def q_text_token_drift(spark, sf_dir):
    from kenshin_spark.pipeline import token_drift

    docs = load_table(spark, sf_dir, "documents")
    snap = F.expr("CAST(substring(source, 4, 10) AS INT)")
    return token_drift(docs.where(snap < 10), docs.where(snap >= 10), top_k=50)


# ---------------------------------------------------------------------------
# Driver evaluation-window ordering
# ---------------------------------------------------------------------------

#: Names with green driver CORRECTNESS rows in BOTH round 1 and round 2
#: (= the 50 keys of CORRECTNESS_r02.json). The driver evaluates only the
#: FIRST 50 entries of ``__spark_entry__.queries()``, so these proven
#: queries yield their window slots to everything not yet driver-verified;
#: they stay regression-guarded by tests/test_queries_oracle.py which runs
#: the same oracle gate over the FULL registry at sf0.001.
DRIVER_VERIFIED = frozenset({
    "bpe_vocab_topk", "config_parse_storage_schemas",
    "config_retention_matrix", "dedup_banding_auto_plan",
    "dedup_bloom_fpr_audit", "dedup_bloom_prefilter", "dedup_cluster_stats",
    "dedup_clusters", "dedup_clusters_incremental",
    "dedup_clusters_label_distributed", "dedup_clusters_star_distributed",
    "dedup_containment", "dedup_cross_neardup",
    "dedup_embedding_incremental", "dedup_embedding_lsh",
    "dedup_embedding_neardup", "dedup_exact", "dedup_minhash_capped",
    "dedup_minhash_incremental", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_prefix_groups", "dedup_rate_by_source", "dedup_semantic",
    "dedup_shingle_df", "dedup_simhash", "dedup_simhash_hamming",
    "dedup_substring_incremental", "dedup_substring_ngram",
    "dedup_substring_scrub", "dedup_substring_spans", "dedup_substring_top",
    "emb_bottomk_per_label", "emb_centroid_outliers",
    "emb_centroid_pair_distance", "emb_centroids", "emb_dim_profile",
    "emb_dim_variance_topk", "emb_distance_histogram", "emb_ivf_cell_stats",
    "emb_knn_label_purity", "emb_label_confusion", "emb_nearest_centroid",
    "emb_norm_by_label", "emb_norm_profile", "emb_sign_agreement_matrix",
    "emb_sign_sketch_buckets", "emb_sparsity", "emb_sq_error_profile",
    "graph_token_degree_profile", "graph_triangle_count",
    "hs_export_import_roundtrip", "hs_header_inspect",
    "hs_import_corrupt_skip", "hs_null_sentinel_roundtrip",
    "ingest_admit_ratelimit", "ingest_age_routing_tiers",
    "ingest_batch_split_merge", "ingest_dead_letter_quality",
    "ingest_replay_idempotent", "ingest_salted_lww", "ingest_self_metrics",
    "lp_corrupt_dead_letter", "lp_parse_tagged_lines",
    "maintenance_keepalive_dormant", "mm_audio_features",
    "mm_bmp_container_dims", "mm_frame_sample", "mm_image_metadata",
    "mm_jpeg_container_dims", "mm_jpeg_subsample_dims", "mm_modality_mix",
    "mm_phash_bands", "mm_phash_neardup", "mm_png_pixel_sum",
    "mm_resize_pixel_sum", "mm_sniff_formats", "mm_wav_square_rms",
    "mm_wav_stereo_meta", "pipeline_corpus_curation",
    "pipeline_decontaminate", "pipeline_dedup_funnel",
    "pipeline_ingest_triage", "pipeline_jaccard_sweep",
    "pipeline_leakage_split", "pipeline_length_cut_impact",
    "pipeline_packing_waste", "pipeline_quality_report",
    "pipeline_quality_vs_length", "pipeline_sequence_packing",
    "pipeline_source_mixture", "pipeline_temperature_mixture",
    "pipeline_token_budget", "q10_returned_items", "q11_important_parts",
    "q12_priority_lines", "q13_order_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_quantity",
    "q18_large_orders", "q19_disjunctive", "q1_pricing_summary",
    "q20_promotion_suppliers", "q21_sole_return_supplier",
    "q22_dormant_customers", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_late_orders", "q5_local_supplier", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_nation_revenue",
    "q_abc_analysis", "q_basket_value_matrix", "q_brand_return_rate",
    "q_conversion_attribution", "q_cube_orders",
    "q_cumulative_new_customers", "q_cumulative_revenue",
    "q_customer_balance_deciles", "q_customer_order_range",
    "q_customer_pareto", "q_customer_recency_bands", "q_customer_rfm",
    "q_customer_top10_balance", "q_discount_distribution",
    "q_discount_tax_grid", "q_event_bounce_rate",
    "q_event_conversion_by_breadth", "q_event_cooccurrence",
    "q_event_dedup_watermark", "q_event_dwell_time", "q_event_error_streaks",
    "q_event_first_touch", "q_event_funnel", "q_event_funnel_daily",
    "q_event_holdout_lift", "q_event_hour_of_week",
    "q_event_interarrival_bands", "q_event_path_top", "q_event_peak_minutes",
    "q_event_session_depth", "q_event_sessions", "q_event_sessions_native",
    "q_event_transitions", "q_event_type_breadth", "q_event_type_entropy",
    "q_event_user_lifespan", "q_event_whale_curve", "q_events_burstiness",
    "q_events_daily", "q_events_error_budget_burn", "q_events_error_rate",
    "q_events_error_rate_by_hour", "q_events_hopping_window",
    "q_events_hourly_heatmap", "q_events_json_props",
    "q_events_late_watermark_audit", "q_events_props_histogram",
    "q_events_stickiness", "q_events_value_percentiles",
    "q_events_value_quartiles_by_type", "q_funnel_conversion_time",
    "q_interval_join", "q_lineitem_unpivot", "q_market_basket",
    "q_median_order_gap", "q_monthly_priority_mix",
    "q_nation_balance_profile", "q_nation_conversion_rate",
    "q_nation_coverage", "q_nation_type_affinity", "q_new_vs_returning",
    "q_order_dow_profile", "q_order_gap_bands", "q_order_linenumber_decay",
    "q_order_lines_histogram", "q_order_value_bands",
    "q_order_value_outliers", "q_order_weekday_value_profile",
    "q_orders_global_revenue", "q_orders_grouping_sets", "q_orders_pivot",
    "q_orders_seasonality", "q_orders_status_timeline",
    "q_orders_yoy_growth", "q_part_brand_size_coverage",
    "q_part_brand_type_matrix", "q_part_name_tokens", "q_part_size_profile",
    "q_part_type_share", "q_price_deciles", "q_price_percentiles",
    "q_quantity_price_corr", "q_region_trade_matrix",
    "q_repeat_customer_rate", "q_retention_cohorts",
    "q_revenue_region_quarter", "q_rolling_weekly_users", "q_rollup_orders",
    "q_segment_balance_profile", "q_session_length_histogram",
    "q_supplier_active_months", "q_supplier_hhi", "q_supplier_nation_share",
    "q_supplier_part_breadth", "q_supplier_regional_coverage",
    "q_table_profile", "q_top3_parts_per_brand", "q_top_parts_by_margin",
    "q_user_value_deciles", "q_window_topk_customers",
    "q_zero_discount_share", "quality_suite_orders",
    "ratelimit_bucket_replay", "render_abs_invert", "render_alias_by_node",
    "render_alias_chain", "render_alias_rewrite", "render_as_percent",
    "render_average_above", "render_average_below",
    "render_average_outside_percentile", "render_chain_over_store",
    "render_chain_pipeline", "render_changed", "render_count_series",
    "render_current_above", "render_current_selections", "render_delay",
    "render_derivative", "render_diff_series", "render_divide_series",
    "render_ewma", "render_grep_exclude", "render_group_by_node",
    "render_highest_lowest_current", "render_highest_max", "render_hitcount",
    "render_holt_forecast", "render_integral_top2", "render_interpolate",
    "render_keep_last_value", "render_limit_alias", "render_logarithm",
    "render_lowest_average", "render_max_datapoints", "render_maximum_below",
    "render_min_max_range", "render_minimum_above", "render_most_deviant",
    "render_moving_average", "render_moving_extrema", "render_moving_median",
    "render_moving_minmax", "render_moving_stdev", "render_moving_sum",
    "render_n_percentile", "render_nonneg_derivative", "render_offset_scale",
    "render_per_second", "render_percentile_of_series",
    "render_pow_roundtrip", "render_range_of_series",
    "render_remove_above_percentile", "render_remove_value_band",
    "render_scale_to_seconds", "render_series_envelope",
    "render_slice_scale", "render_sort_by_maxima", "render_sort_by_total",
    "render_square_root", "render_stddev_series", "render_summarize_avg",
    "render_summarize_max", "render_target_expression", "render_time_shift",
    "render_time_slice", "render_value_clamp", "render_value_gate",
    "sample_bottom_k", "sample_hash_rate_by_source", "sample_stratified",
    "schemachange_meta_verdicts", "schemachange_rebuild_layout",
    "serving_http_fetch", "serving_http_render", "serving_tcp_cache_query",
    "sim_ivf_recall_audit", "sim_knn_graph", "sim_lsh_recall_audit",
    "sim_range_search", "sim_topk_bruteforce", "sim_topk_ivf",
    "sim_topk_ivf_fullprobe", "sim_topk_lsh", "sim_topk_pq",
    "sim_topk_pq_rerank", "sim_topk_quantized", "sketch_bloom_sizing_curve",
    "sketch_cms_error_profile", "sketch_cms_event_counts",
    "sketch_cms_merge_days", "sketch_cms_user_counts",
    "sketch_histogram_quantiles", "sketch_histogram_sliding",
    "sketch_kmv_merge_daily", "sketch_kmv_users", "store_backup_restore",
    "store_bucketed_colocated_join", "store_catalog_routing",
    "store_changed_between_cdc", "store_compact_day_targeted",
    "store_cow_lww_overwrite", "store_cow_upsert_roundtrip",
    "store_delete_metrics", "store_delete_then_compact",
    "store_expire_retention", "store_fetch_after_compact",
    "store_fetch_clamp_window", "store_fetch_glob_catalog",
    "store_fetch_glob_no_catalog", "store_fetch_grid_nulls",
    "store_fetch_keep_last", "store_fetch_tier_selection",
    "store_gc_candidates", "store_glob_group_rollup",
    "store_hot_tier_hourly_units", "store_mor_append_resolve",
    "store_mor_compact_invariance", "store_mor_null_overwrite",
    "store_mor_seq_stamps", "store_overwrite_replaces",
    "store_propagate_cascade", "store_propagate_from_seq_cdc",
    "store_read_at_snapshot", "store_read_range_pruning",
    "store_recover_crash_swap", "store_upsert_bounded_rewrite",
    "text_ari_readability", "text_bigram_lm", "text_brevity_law",
    "text_char_class_profile", "text_chunking", "text_collocations",
    "text_digit_ratio", "text_extreme_docs_by_lang", "text_fingerprint",
    "text_first_token_profile", "text_fp_bucket_profile", "text_hapax_rate",
    "text_heaps_curve", "text_lang_margin", "text_language_id",
    "text_length_histogram", "text_ngram_novelty",
    "text_numeric_density_bands", "text_oov_rate", "text_part_fingerprint",
    "text_pii_scrub", "text_quality", "text_quality_filter",
    "text_quality_model", "text_quality_reason_mix",
    "text_repetition_filter", "text_rolling_fingerprint",
    "text_sentence_stats", "text_source_vocab_jaccard",
    "text_stopword_coverage", "text_tfidf_topk", "text_token_count",
    "text_token_count_bpe", "text_token_diversity", "text_token_drift",
    "text_token_pagerank", "text_token_position_profile",
    "text_top_bigrams_per_lang", "text_vocab_topk",
    "text_whitespace_anomalies", "text_word_length_profile",
    "text_zipf_slope", "ts_agg_divergence", "ts_agg_kernel", "ts_align_lww",
    "ts_anomaly_zscore", "ts_archive_estimate", "ts_asof_forward_tolerance",
    "ts_asof_join", "ts_autocorr_lag1", "ts_availability",
    "ts_cascade_associativity", "ts_corr_seeded",
    "ts_counter_gauge_classify", "ts_counter_rate", "ts_daily_points_median",
    "ts_daily_spread", "ts_debug_discontinuities", "ts_downsample_cascade",
    "ts_downsample_tier1", "ts_fetch_grid", "ts_flap_rate",
    "ts_flatline_detect", "ts_hashring_rebalance", "ts_hot_cold_union",
    "ts_index_rebuild", "ts_ingest_jitter", "ts_largest_gap",
    "ts_level_shift", "ts_line_protocol", "ts_lww_overwrite_pressure",
    "ts_mean_crossings", "ts_merge_series", "ts_metric_correlation",
    "ts_metric_delete", "ts_metric_search", "ts_monotonic_violations",
    "ts_occupancy", "ts_pickle_roundtrip", "ts_propagation_ready",
    "ts_retention_cost_model", "ts_retention_expiry",
    "ts_ring_slot_utilization", "ts_sample_rate_estimate", "ts_schema_match",
    "ts_seasonal_decompose", "ts_seasonal_profile", "ts_shard_routing",
    "ts_staleness", "ts_stream_envelope", "ts_tag_catalog", "ts_tag_filter",
    "ts_tag_roundtrip", "ts_tier_age_distribution", "ts_tier_selection",
    "ts_top_changepoint", "ts_trend_slope", "ts_value_histogram",
    "ts_value_profile", "ts_weekday_profile", "ts_weekend_weekday_profile",
    "ts_xff_sensitivity", "whisper_export_import_roundtrip",
    "whisper_headers_inspect", "whisper_rehash_to_store",
})


def driver_order() -> list[str]:
    """Registry names, never-driver-verified first (registration order
    within each group) so they occupy the driver's evaluation window."""
    names = list(QUERIES)
    front = [n for n in names if n not in DRIVER_VERIFIED]
    back = [n for n in names if n in DRIVER_VERIFIED]
    return front + back


def _register_bank(modname: str, attr: str) -> None:
    """Merge a promoted staged bank into QUERIES, tolerating the
    executor-side import cycle: a Python worker unpickling a kernel
    DEFINED in a bank module imports that bank first, whose top-level
    ``from kenshin_spark.queries import ...`` re-enters this module —
    and this function then sees the bank mid-initialization (module in
    sys.modules but the bank dict not yet bound). The worker doesn't
    need the registry rows, only the kernel, so skipping registration
    there is correct; on the driver, this module is always imported
    before any bank, so the skip can't occur and every genuine import
    error still propagates loudly."""
    import importlib
    import sys as _sys

    mod = _sys.modules.get(modname)
    if mod is not None and not hasattr(mod, attr):
        return  # bank mid-import (executor unpickle path)
    QUERIES.update(getattr(importlib.import_module(modname), attr))


# --- promoted staged bank: queries_staged (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged", "STAGED")


# --- promoted staged bank: queries_staged_r6 (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged_r6", "STAGED_R6")


# --- promoted staged bank: queries_staged_r7 (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged_r7", "STAGED_R7")


# --- promoted staged bank: queries_staged_r8 (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged_r8", "STAGED_R8")


# --- promoted staged bank: queries_staged_r9 (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged_r9", "STAGED_R9")


# --- promoted staged bank: queries_staged_r10 (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged_r10", "STAGED_R10")


# --- promoted staged bank: queries_staged_r11 (see HANDOFF.md) ---
_register_bank("kenshin_spark.queries_staged_r11", "STAGED_R11")
