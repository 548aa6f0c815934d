"""Fourth staged bank — ROUND 8: render-surface completion.

Seven rows that close out driver coverage of the LAST 15
``RENDER_REGISTRY`` functions without an oracled row (absolute, alias,
aliasByMetric, averageOutsidePercentile, averageSeries, currentBelow,
highestCurrent, invert, lowestCurrent, maxSeries, minSeries,
maximumBelow, removeAboveValue, removeBelowValue, sumSeries) — after
promotion every registry function's semantics are exercised by a
driver-oracled row (pow/squareRoot and movingMin/movingMax through
their op-identical explicit forms in render_pow_roundtrip /
render_moving_extrema; the library callables themselves are
unit-tested in tests/test_ops.py). Same staging mechanism and gate
(``tests/test_queries_staged_r8.py``) as the round-5/6/7 banks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.queries import (
    PTS,
    LWW60,
    QuerySpec,
    _clusters_oracle,
    _points,
)
from kenshin_spark.queries_staged_r6 import LWW3600
from kenshin_spark.operators.align import last_write_wins

STAGED_R8: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R8[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _grid60(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")


def _grid3600(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 3600, arrival_col="arrival")


@stage(
    "render_abs_invert",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           round(CASE WHEN abs(value - 50.0) <> 0
                      THEN 1.0 / abs(value - 50.0) END, 6) AS value
    FROM t0
    """,
    "graphite invert(absolute(offset(series, -50))): distance-from-"
    "setpoint reciprocal — the offset/absolute/invert chain through "
    "apply_chain; exact-zero distance goes NULL (the grid contract has "
    "no infinities), all three stages fold into one projection",
)
def q_render_abs_invert(spark, sf_dir):
    from kenshin_spark.functions.render import apply_chain

    out = apply_chain(
        _grid60(spark, sf_dir),
        [("offset", -50.0), "absolute", "invert"],
    )
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_series_envelope",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600})
    SELECT 'maxSeries' AS metric, ts, max(value) AS value
    FROM t0 GROUP BY ts
    UNION ALL
    SELECT 'minSeries' AS metric, ts, min(value) AS value
    FROM t0 GROUP BY ts
    UNION ALL
    SELECT 'averageSeries' AS metric, ts, round(avg(value), 6) AS value
    FROM t0 GROUP BY ts
    UNION ALL
    SELECT 'sumSeries' AS metric, ts, round(sum(value), 6) AS value
    FROM t0 GROUP BY ts
    """,
    "the four cross-series combiners (maxSeries / minSeries / "
    "averageSeries / sumSeries) as one envelope result — min/max are "
    "order-free exact doubles, the <=5-addend avg/sum are 6dp-rounded; "
    "Catalyst shares one aggregate shuffle across the four branches",
)
def q_render_series_envelope(spark, sf_dir):
    from kenshin_spark.functions.render import (
        avg_series,
        max_series,
        min_series,
        sum_series,
    )

    g = _grid3600(spark, sf_dir)
    rounded = lambda df: df.withColumn("value", F.round("value", 6))  # noqa: E731
    return (
        max_series(g)
        .unionByName(min_series(g))
        .unionByName(rounded(avg_series(g)))
        .unionByName(rounded(sum_series(g)))
    )


@stage(
    "render_remove_value_band",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           CASE WHEN value > 250.0 OR value < 10.0 THEN NULL
                ELSE value END AS value
    FROM t0
    """,
    "graphite removeBelowValue(removeAboveValue(series, 250), 10): "
    "slots outside the [10, 250] band become NULL while the grid shape "
    "survives (the NULLing counterpart to render_value_clamp's "
    "pinning) — raw-double comparisons, no arithmetic",
)
def q_render_remove_value_band(spark, sf_dir):
    from kenshin_spark.functions.render import apply_chain

    return apply_chain(
        _grid60(spark, sf_dir),
        [("removeAboveValue", 250.0), ("removeBelowValue", 10.0)],
    )


@stage(
    "render_current_selections",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    cur AS (
      SELECT metric, arg_max(value, ts) AS cur
      FROM t0 WHERE value IS NOT NULL GROUP BY metric
    ),
    hi AS (SELECT metric FROM cur ORDER BY cur DESC, metric LIMIT 2),
    lo AS (SELECT metric FROM cur ORDER BY cur ASC, metric LIMIT 2),
    below AS (SELECT metric FROM cur WHERE cur < 15.0)
    SELECT 'highest' AS arm, t0.metric, ts, value
    FROM t0 JOIN hi ON t0.metric = hi.metric
    UNION ALL
    SELECT 'lowest' AS arm, t0.metric, ts, value
    FROM t0 JOIN lo ON t0.metric = lo.metric
    UNION ALL
    SELECT 'below' AS arm, t0.metric, ts, value
    FROM t0 JOIN below ON t0.metric = below.metric
    """,
    "the freshest-reading selection family in one result: "
    "highestCurrent(2), lowestCurrent(2), and currentBelow(15) arms "
    "over the same grid — last values are unique raw doubles (the "
    "hourly slot key is unique per series), so every selection is "
    "exact; each tiny selection broadcasts back",
)
def q_render_current_selections(spark, sf_dir):
    from kenshin_spark.functions.render import (
        current_below,
        highest_current,
        lowest_current,
    )

    g = _grid3600(spark, sf_dir)
    tag = lambda df, a: df.select(  # noqa: E731
        F.lit(a).alias("arm"), "metric", "ts", "value"
    )
    return (
        tag(highest_current(g, 2), "highest")
        .unionByName(tag(lowest_current(g, 2), "lowest"))
        .unionByName(tag(current_below(g, 15.0), "below"))
    )


@stage(
    "render_alias_chain",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600})
    SELECT 'rate' AS metric, ts, value
    FROM t0 WHERE metric = 'click'
    """,
    "graphite aliasByMetric(alias(grep(series_list, '^click$'), "
    "'ui.click.rate')): the display-name surgery family chained — "
    "grep selects, alias renames to a dotted path, aliasByMetric keeps "
    "the last segment; values pass through untouched",
)
def q_render_alias_chain(spark, sf_dir):
    from kenshin_spark.functions.render import apply_chain

    return apply_chain(
        _grid3600(spark, sf_dir),
        [("grep", "^click$"), ("alias", "ui.click.rate"), "aliasByMetric"],
    )


@stage(
    "render_average_outside_percentile",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    means AS (
      SELECT metric, avg(value) AS m FROM t0 GROUP BY metric
    ),
    cuts AS (
      SELECT quantile_cont(m, 0.2) AS lo, quantile_cont(m, 0.8) AS hi
      FROM means
    ),
    keep AS (
      SELECT metric FROM means, cuts WHERE m < lo OR m > hi
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite averageOutsidePercentile(series_list, 80): keep the "
    "outlier series whose mean falls outside the [20th, 80th] "
    "percentile band of all series means — R-7 interpolated cuts sit "
    "strictly between sorted means, units away from summation noise, "
    "so the strict compare is engine-stable",
)
def q_render_average_outside_percentile(spark, sf_dir):
    from kenshin_spark.functions.render import average_outside_percentile

    return average_outside_percentile(_grid3600(spark, sf_dir), 80.0)


@stage(
    "render_maximum_below",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    ceil_t AS (SELECT max(value) AS fleet_ceiling FROM t0),
    keep AS (
      SELECT metric FROM t0, ceil_t
      GROUP BY metric, fleet_ceiling HAVING max(value) < fleet_ceiling
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite maximumBelow(series_list, n) with the fleet ceiling as "
    "the bar: keep every series whose own peak sits under the global "
    "maximum (drops exactly the argmax series — fixed bars go empty "
    "across SFs, the render_minimum_above lesson) — raw-double "
    "comparisons only",
)
def q_render_maximum_below(spark, sf_dir):
    from kenshin_spark.functions.render import maximum_below

    grid = _grid60(spark, sf_dir)
    ceiling = grid.agg(F.max("value")).first()[0]
    return maximum_below(grid, float(ceiling))


# --- engine-path rows (VERDICT r5 item 2): store / schema-change / hs /
# --- admission / maintenance surfaces, one bank with the render rows ---
from kenshin_spark.queries_staged_r8_engine import ENGINE_ROWS as _ENGINE_ROWS  # noqa: E402

STAGED_R8.update(_ENGINE_ROWS)


# --------------------------------------------------------------------------
# Round-6 continuation top-up (42 -> 50): eight light profiling rows so
# the round-8 window carries 50 FRESH verified rows instead of 8
# re-verifications.
# --------------------------------------------------------------------------

from kenshin_spark.io import load_table  # noqa: E402


@stage(
    "dedup_clusters_star_distributed",
    _clusters_oracle(),
    "DISTRIBUTED connected components (VERDICT r6 item 3): the same "
    "MinHash-LSH pair graph as dedup_clusters, but solved by the "
    "alternating large-star/small-star iteration (Kiveris et al. "
    "SoCC'14, dedup/cluster.py:_star_components) — algorithm='star' "
    "bypasses the DRIVER_CC_GATE union-find fallback entirely, so the "
    "hash-matched answer is produced by the O(log n)-round shuffle "
    "iteration that runs at 100 TB, not the driver path. Oracle: the "
    "same recursive reachability CTE as dedup_clusters.",
)
def q_dedup_clusters_star_distributed(spark, sf_dir):
    from kenshin_spark.dedup import minhash_lsh_pairs
    from kenshin_spark.dedup.cluster import connected_components

    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )
    cc = connected_components(pairs, algorithm="star")
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.select(F.col("node").alias("doc_id"), "cluster_id").join(
        sizes, "cluster_id"
    )


@stage(
    "ts_daily_points_median",
    f"""
    WITH pts AS ({PTS}),
    d AS (
      SELECT metric, ts // 86400 AS day, count(*) AS n
      FROM pts GROUP BY 1, 2
    )
    SELECT metric,
           round(quantile_cont(n, 0.5), 6) AS median_daily_points,
           count(*) AS n_days
    FROM d GROUP BY 1
    """,
    "typical daily ingest per metric: the median points-per-day — the "
    "robust load figure a schema advisor converts into a step size",
)
def q_ts_daily_points_median(spark, sf_dir):
    pts = _points(spark, sf_dir)
    d = pts.groupBy(
        "metric", (F.col("ts") / 86400).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return d.groupBy("metric").agg(
        F.round(F.expr("percentile(n, 0.5)"), 6).alias(
            "median_daily_points"
        ),
        F.count(F.lit(1)).alias("n_days"),
    )


@stage(
    "q_orders_global_revenue",
    """
    SELECT count(*) AS n_orders,
           CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100)
                AS BIGINT) AS total_cents
    FROM orders
    """,
    "the one-number revenue headline in integer cents: DECIMAL sum, "
    "floor to cents — the figure every other share row divides by, "
    "pinned on its own",
)
def q_q_orders_global_revenue(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
        ).cast("long").alias("total_cents"),
    )


@stage(
    "q_customer_top10_balance",
    """
    SELECT c_custkey, c_acctbal FROM (
      SELECT c_custkey, c_acctbal,
             row_number() OVER (
               ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) t WHERE rnk <= 10
    """,
    "the ten richest customers — exact-value ranking with a key "
    "tie-break, the credit-desk shortlist",
)
def q_q_customer_top10_balance(spark, sf_dir):
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("c_custkey", "c_acctbal")
    )


@stage(
    "text_extreme_docs_by_lang",
    """
    SELECT lang,
           arg_min(doc_id, n_chars * 1000000 + doc_id) AS shortest_doc,
           min(n_chars) AS min_chars,
           arg_max(doc_id, n_chars * 1000000 - doc_id) AS longest_doc,
           max(n_chars) AS max_chars
    FROM documents GROUP BY 1
    """,
    "extreme documents per language with deterministic attribution: "
    "shortest and longest docs via composite (length, key) arg_min/"
    "arg_max so length ties resolve identically on both engines",
)
def q_text_extreme_docs_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.expr("min_by(doc_id, n_chars * 1000000 + doc_id)").alias(
            "shortest_doc"
        ),
        F.min("n_chars").alias("min_chars"),
        F.expr("max_by(doc_id, n_chars * 1000000 - doc_id)").alias(
            "longest_doc"
        ),
        F.max("n_chars").alias("max_chars"),
    )


@stage(
    "dedup_clusters_label_distributed",
    _clusters_oracle(),
    "DISTRIBUTED connected components, min-label propagation path "
    "(dedup/cluster.py:_label_components): algorithm='label' forces "
    "the per-round join+groupBy-min fixpoint that the over-gate auto "
    "path falls through to — so BOTH distributed CC algorithms now "
    "have a driver-oracled row, not just the size-gated driver "
    "union-find. Oracle: the same recursive reachability CTE.",
)
def q_dedup_clusters_label_distributed(spark, sf_dir):
    from kenshin_spark.dedup import minhash_lsh_pairs
    from kenshin_spark.dedup.cluster import connected_components

    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )
    cc = connected_components(pairs, algorithm="label")
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.select(F.col("node").alias("doc_id"), "cluster_id").join(
        sizes, "cluster_id"
    )


@stage(
    "q_zero_discount_share",
    """
    SELECT count(*) AS n_lines,
           sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS n_zero,
           sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) * 1000000
             // count(*) AS zero_ppm
    FROM lineitem
    """,
    "undiscounted share of the fact table as floor-scaled ppm — the "
    "promo-penetration complement",
)
def q_q_zero_discount_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    z = (F.col("l_discount") == 0).cast("long")
    # integer `div`, not floor(double /): bit-exact vs the oracle's
    # BIGINT `//` at any scale (VERDICT r8 item 1)
    ppm = F.expr(
        "(sum(CAST(l_discount = 0 AS LONG)) * 1000000) div count(1)"
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(z).alias("n_zero"),
        ppm.alias("zero_ppm"),
    )


@stage(
    "ts_stream_envelope",
    f"""
    WITH pts AS ({PTS})
    SELECT count(*) AS n_points,
           count(DISTINCT metric) AS n_metrics,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST((max(ts) - min(ts)) // 86400 AS BIGINT) AS span_days
    FROM pts
    """,
    "the stream's one-row fingerprint: points, series, timestamp "
    "envelope and whole-day span — what a load manifest records "
    "before anything else runs",
)
def q_ts_stream_envelope(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("metric").alias("n_metrics"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        ((F.max("ts") - F.min("ts")) / 86400).cast("long").alias(
            "span_days"
        ),
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
    "q_zero_discount_share": ("n_zero", "zero_ppm",),
}
apply_bigint_casts(STAGED_R8, _BIGINT_CASTS)
