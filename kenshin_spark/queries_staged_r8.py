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

from kenshin_spark.queries import PTS, LWW60, QuerySpec, _points
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
