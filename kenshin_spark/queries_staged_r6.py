"""Second staged batch — oracle-verified now, registered in ROUND 6.

Same mechanism as ``queries_staged`` (the round-5 bank): the driver
evaluates a 50-slot window of never-verified queries per round, round 5's
window is exactly filled by ``queries_staged.STAGED``, so this batch is
held out until round 6 frees slots. Every entry runs the identical
Spark-vs-DuckDB gate (``tests/test_queries_staged_r6.py``).

Float discipline matches queries.py: exact DECIMAL/BIGINT arithmetic
wherever a threshold, rank, or bucket boundary could flip; 6dp rounding
on display-only float outputs; op-for-op identical scalar expressions
when a recurrence or formula must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import (
    PTS,
    LWW60,
    QuerySpec,
    _points,
    _sql_query,
)
from kenshin_spark.operators.align import last_write_wins

STAGED_R6: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R6[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


#: hourly last-write-wins tier, DuckDB side (render queries' coarse grid)
LWW3600 = """
  SELECT metric, ts - ts % 3600 AS ts, arg_max(value, arrival) AS value
  FROM pts GROUP BY 1, 2
"""


def _grid60(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")


def _grid3600(spark, sf_dir):
    return last_write_wins(_points(spark, sf_dir), 3600, arrival_col="arrival")


# ---------------------------------------------------------------------------
# Render library — driver rows for the not-yet-oracled Graphite functions
# ---------------------------------------------------------------------------


@stage(
    "render_nonneg_derivative",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    d AS (
      SELECT metric, ts,
             value - lag(value) OVER (PARTITION BY metric ORDER BY ts)
               AS delta
      FROM t0
    )
    SELECT metric, ts,
           round(CASE WHEN delta >= 0 THEN delta END, 6) AS value
    FROM d
    """,
    "graphite nonNegativeDerivative over the hourly tier: counter resets "
    "(negative deltas) become NULL — one lag window co-partitioned with "
    "the series key, no extra shuffle past the LWW align",
)
def q_render_nonneg_derivative(spark, sf_dir):
    from kenshin_spark.functions.render import non_negative_derivative

    out = non_negative_derivative(_grid3600(spark, sf_dir))
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_logarithm",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           round(CASE WHEN value > 0 THEN ln(value) / ln(10.0) END, 6)
             AS value
    FROM t0
    """,
    "graphite logarithm(series, 10): non-positive slots go NULL (graphite "
    "draws None there) — ln(x)/ln(10) written identically in both engines "
    "so the float division path matches op-for-op",
)
def q_render_logarithm(spark, sf_dir):
    from kenshin_spark.functions.render import logarithm

    return logarithm(_grid60(spark, sf_dir), 10.0).withColumn(
        "value", F.round("value", 6)
    )


@stage(
    "render_offset_scale",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts, round((value + 100.0) * 0.5, 6) AS value
    FROM t0
    """,
    "graphite scale(offset(series, 100), 0.5) — a two-stage scalar chain "
    "through apply_chain; Catalyst collapses both projections into the "
    "aligning aggregate (zero extra stages)",
)
def q_render_offset_scale(spark, sf_dir):
    from kenshin_spark.functions.render import apply_chain

    out = apply_chain(
        _grid60(spark, sf_dir), [("offset", 100.0), ("scale", 0.5)]
    )
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_value_clamp",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           CASE WHEN value IS NULL THEN NULL
                ELSE least(greatest(value, 10.0), 250.0) END AS value
    FROM t0
    """,
    "graphite clampMin(10)+clampMax(250): slot values pinned into a band "
    "— raw parquet doubles pass through greatest/least untouched, so no "
    "rounding is needed for the hash match",
)
def q_render_value_clamp(spark, sf_dir):
    from kenshin_spark.functions.render import clamp

    return clamp(_grid60(spark, sf_dir), lo=10.0, hi=250.0)


@stage(
    "render_highest_max",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    keep AS (
      SELECT metric FROM t0 GROUP BY metric
      ORDER BY max(value) DESC, metric LIMIT 3
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite highestMax(series_list, 3): series selection by peak value "
    "— per-series max is a tiny aggregate broadcast back against the "
    "grid; raw doubles compare exactly so the rank is engine-stable",
)
def q_render_highest_max(spark, sf_dir):
    from kenshin_spark.functions.render import highest_max

    return highest_max(_grid60(spark, sf_dir), 3)


@stage(
    "render_count_series",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT 'countSeries' AS metric, ts,
           CAST(count(value) AS DOUBLE) AS value
    FROM t0 GROUP BY ts
    """,
    "graphite countSeries: how many series report a non-NULL value per "
    "slot — integer count cast to the grid's DOUBLE contract, exact in "
    "both engines",
)
def q_render_count_series(spark, sf_dir):
    from kenshin_spark.functions.render import count_series

    return count_series(_grid60(spark, sf_dir))


@stage(
    "render_stddev_series",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    s AS (
      SELECT ts, sum(value) AS s1, sum(value * value) AS s2,
             CAST(count(value) AS DOUBLE) AS n
      FROM t0 GROUP BY ts
    )
    SELECT 'stddevSeries' AS metric, ts,
           round(CASE WHEN n >= 1 THEN
             sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)) END, 6) AS value
    FROM s
    """,
    "graphite stddevSeries over the hourly tier: cross-series population "
    "deviation per slot — explicit two-sum formula (native stddev "
    "aggregates stream differently across engines); <= 5 addends per "
    "slot so 6dp rounding clears the reorder noise",
)
def q_render_stddev_series(spark, sf_dir):
    from kenshin_spark.functions.render import stddev_series

    out = stddev_series(_grid3600(spark, sf_dir))
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_summarize_avg",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    b AS (
      SELECT metric, ts - ts % 1800 AS ts, avg(value) AS value
      FROM t0 GROUP BY 1, 2
    )
    SELECT metric, ts, round(value, 6) AS value FROM b
    """,
    "graphite summarize(series, '30min', 'avg'): re-bucket the minute "
    "grid onto 30-min boundaries with mean — the downsample cascade "
    "machinery under a render name; <= 30 addends/bucket, 6dp-rounded",
)
def q_render_summarize_avg(spark, sf_dir):
    from kenshin_spark.functions.render import summarize

    out = summarize(_grid60(spark, sf_dir), 1800, "average")
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_changed",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    d AS (
      SELECT metric, ts, value,
             lag(value) OVER (PARTITION BY metric ORDER BY ts) AS prev,
             row_number() OVER (PARTITION BY metric ORDER BY ts) AS rn
      FROM t0
    )
    SELECT metric, ts,
           CASE WHEN rn = 1 THEN 0.0
                WHEN value IS NOT DISTINCT FROM prev THEN 0.0
                ELSE 1.0 END AS value
    FROM d
    """,
    "graphite changed(series): 1 where the slot differs from its "
    "predecessor (NULL-safe compare), 0 elsewhere and on the first slot",
)
def q_render_changed(spark, sf_dir):
    from kenshin_spark.functions.render import changed

    return changed(_grid60(spark, sf_dir))


@stage(
    "render_most_deviant",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    v AS (
      SELECT metric, sum(value) AS s1, sum(value * value) AS s2,
             CAST(count(value) AS DOUBLE) AS n
      FROM t0 WHERE value IS NOT NULL GROUP BY metric
    ),
    keep AS (
      SELECT metric FROM v
      ORDER BY (s2 - s1 * s1 / n) / n DESC, metric LIMIT 2
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite mostDeviant(series_list, 2): selection by per-series "
    "population variance — two-sum formula on the hourly tier; variance "
    "gaps between the 5 synthetic series are orders of magnitude above "
    "fp noise, so the rank is engine- and partition-stable",
)
def q_render_most_deviant(spark, sf_dir):
    from kenshin_spark.functions.render import most_deviant

    return most_deviant(_grid3600(spark, sf_dir), 2)


@stage(
    "render_pow_roundtrip",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts, round(sqrt(value * value), 6) AS value
    FROM t0
    """,
    "graphite squareRoot(pow(series, 2)) semantics — written as the "
    "explicit sqrt(x*x) expression on BOTH engines rather than through "
    "libm pow() (pow is not correctly-rounded and differs per libm; "
    "x*x and sqrt are IEEE-exact ops), so the float path is op-for-op "
    "identical (and ≈|x| up to one ulp)",
)
def q_render_pow_roundtrip(spark, sf_dir):
    grid = _grid60(spark, sf_dir)
    v = F.col("value") * F.col("value")
    return grid.select(
        "metric", "ts", F.round(F.sqrt(v), 6).alias("value")
    )


@stage(
    "render_delay",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600})
    SELECT metric, ts,
           lag(value, 3) OVER (PARTITION BY metric ORDER BY ts) AS value
    FROM t0
    """,
    "graphite delay(series, 3): each slot shows the value 3 slots back "
    "(NULL before history) — unlike timeShift the time axis stays put; "
    "raw doubles pass through the lag untouched",
)
def q_render_delay(spark, sf_dir):
    from kenshin_spark.functions.render import delay

    return delay(_grid3600(spark, sf_dir), 3)


@stage(
    "render_moving_extrema",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600})
    SELECT metric, ts,
           min(value) OVER w AS value_min,
           max(value) OVER w AS value_max
    FROM t0
    WINDOW w AS (PARTITION BY metric ORDER BY ts
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    "graphite movingMin(series,5) + movingMax(series,5) as one envelope "
    "— two frames over the same window spec share a single sort/shuffle "
    "in Catalyst; min/max of doubles are exact (no rounding needed)",
)
def q_render_moving_extrema(spark, sf_dir):
    from pyspark.sql import Window

    grid = _grid3600(spark, sf_dir)
    w = (
        Window.partitionBy("metric")
        .orderBy("ts")
        .rowsBetween(-4, 0)
    )
    return grid.select(
        "metric",
        "ts",
        F.min("value").over(w).alias("value_min"),
        F.max("value").over(w).alias("value_max"),
    )


@stage(
    "render_slice_scale",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    bounds AS (
      SELECT min(ts) + 86400 AS lo, max(ts) - 86400 AS hi FROM t0
    )
    SELECT metric, ts,
           round(CASE WHEN ts >= lo AND ts < hi
                      THEN value * (300.0 / 60.0) END, 6) AS value
    FROM t0, bounds
    """,
    "graphite scaleToSeconds(timeSlice(series, +1d, -1d), 300): NULL out "
    "the first/last day (timeSlice keeps the grid shape) then "
    "renormalize the per-60s slots to a per-300s rate — both steps fold "
    "into one projection over the aligning aggregate",
)
def q_render_slice_scale(spark, sf_dir):
    from kenshin_spark.functions.render import scale_to_seconds, time_slice

    grid = _grid60(spark, sf_dir)
    lo, hi = grid.agg(
        (F.min("ts") + 86400).alias("lo"), (F.max("ts") - 86400).alias("hi")
    ).first()
    out = scale_to_seconds(time_slice(grid, int(lo), int(hi)), 300, 60)
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_average_above",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    keep AS (
      SELECT metric FROM t0 GROUP BY metric
      HAVING avg(value) > 50.0
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite averageAbove(series_list, 50): keep series whose mean "
    "exceeds the bar — per-series means sit far from 50.0 relative to "
    "summation noise (verified at both SFs), so the filter is stable; "
    "surviving rows are raw passthrough doubles",
)
def q_render_average_above(spark, sf_dir):
    from kenshin_spark.functions.render import average_above

    return average_above(_grid60(spark, sf_dir), 50.0)


@stage(
    "render_grep_exclude",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts, value FROM t0
    WHERE regexp_matches(metric, '^(click|view|error)')
      AND NOT regexp_matches(metric, 'error')
    """,
    "graphite exclude(grep(series_list, '^(click|view|error)'), 'error') "
    "— name-pattern selection composed; both predicates collapse into "
    "one scan filter (Spark rlike is re.search-style like graphite's)",
)
def q_render_grep_exclude(spark, sf_dir):
    from kenshin_spark.functions.render import exclude_series, grep_series

    return exclude_series(
        grep_series(_grid60(spark, sf_dir), "^(click|view|error)"), "error"
    )


@stage(
    "render_n_percentile",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    p AS (
      SELECT metric, quantile_cont(value, 0.95) AS pv
      FROM t0 WHERE value IS NOT NULL GROUP BY metric
    )
    SELECT t0.metric, ts, round(pv, 6) AS value
    FROM t0 JOIN p ON t0.metric = p.metric
    """,
    "graphite nPercentile(series, 95): each series becomes a flat line "
    "at its own p95 — Spark `percentile` and DuckDB `quantile_cont` use "
    "the same R-7 interpolation over identical parquet doubles, rounded "
    "6dp",
)
def q_render_n_percentile(spark, sf_dir):
    from kenshin_spark.functions.render import n_percentile

    out = n_percentile(_grid3600(spark, sf_dir), 95.0)
    return out.withColumn("value", F.round("value", 6))


@stage(
    "render_lowest_average",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW3600}),
    keep AS (
      SELECT metric FROM t0 GROUP BY metric
      ORDER BY avg(value) ASC, metric LIMIT 2
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite lowestAverage(series_list, 2): inverse selection of "
    "highestAverage — per-series means on the hourly tier are separated "
    "by >> fp noise (checked at both SFs), rank is stable; rows are raw "
    "passthrough doubles",
)
def q_render_lowest_average(spark, sf_dir):
    from kenshin_spark.functions.render import lowest_average

    return lowest_average(_grid3600(spark, sf_dir), 2)


# ---------------------------------------------------------------------------
# Warehouse analytics — shared-SQL rows widening the TPC-H-style surface
# ---------------------------------------------------------------------------

_DISC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
)

ABC_SQL = f"""
WITH pr AS (
  SELECT l_partkey, sum({_DISC}) AS rev
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, rev,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
         sum(rev) OVER () AS tot
  FROM pr
)
SELECT l_partkey AS partkey, CAST(round(rev, 2) AS DOUBLE) AS revenue,
       CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc_class
FROM ranked
"""


@stage(
    "q_abc_analysis",
    ABC_SQL,
    "ABC inventory classification: parts bucketed by cumulative revenue "
    "share (A <= 80%, B <= 95%, C rest) — the running total is an "
    "exact-DECIMAL prefix sum with a total (rev, partkey) tiebreak, and "
    "the class boundaries cross-multiply (cum*100 <= tot*80) so no "
    "float division ever decides a bucket",
)
def q_abc_analysis(spark, sf_dir):
    return _sql_query(ABC_SQL, ("lineitem",))(spark, sf_dir)


RETURN_RATE_SQL = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS return_rate
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@stage(
    "q_brand_return_rate",
    RETURN_RATE_SQL,
    "per-brand return rate: share of lineitems flagged 'R' — broadcast "
    "dimension join (part is small), integer-exact numerator, one "
    "float division rounded 6dp",
)
def q_brand_return_rate(spark, sf_dir):
    return _sql_query(RETURN_RATE_SQL, ("lineitem", "part"))(spark, sf_dir)


BREADTH_SQL = """
SELECT l_suppkey AS suppkey,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS gross
FROM lineitem GROUP BY l_suppkey
"""


@stage(
    "q_supplier_part_breadth",
    BREADTH_SQL,
    "supplier catalog breadth: distinct parts + distinct orders served "
    "per supplier with DECIMAL-exact gross — two distinct aggregates "
    "share one shuffle on the supplier key (Catalyst expand), no "
    "per-distinct re-scan",
)
def q_supplier_part_breadth(spark, sf_dir):
    return _sql_query(BREADTH_SQL, ("lineitem",))(spark, sf_dir)


SIZE_PROFILE_SQL = """
SELECT CAST(p_size AS BIGINT) AS p_size,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_price,
       min(p_retailprice) AS min_price,
       max(p_retailprice) AS max_price
FROM part GROUP BY p_size
"""


@stage(
    "q_part_size_profile",
    SIZE_PROFILE_SQL,
    "part-size pricing profile: count + DECIMAL-exact mean + raw "
    "passthrough extremes per size — single map-side-combinable "
    "aggregate over the dimension table",
)
def q_part_size_profile(spark, sf_dir):
    return _sql_query(SIZE_PROFILE_SQL, ("part",))(spark, sf_dir)


PRIORITY_MIX_SQL = """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mon,
         o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2, 3
)
SELECT yr, mon, o_orderpriority, CAST(n AS BIGINT) AS n_orders,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY yr, mon), 6) AS share
FROM m
"""


@stage(
    "q_monthly_priority_mix",
    PRIORITY_MIX_SQL,
    "order-priority mix by month: per-priority share of each month's "
    "orders — integer counts, one windowed total per month, a single "
    "rounded division; the window runs over the month-level aggregate "
    "(tiny), never raw orders",
)
def q_monthly_priority_mix(spark, sf_dir):
    return _sql_query(PRIORITY_MIX_SQL, ("orders",))(spark, sf_dir)


BALANCE_DECILES_SQL = """
WITH d AS (
  SELECT c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS dec
  FROM customer
)
SELECT CAST(dec AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       min(c_acctbal) AS min_bal,
       max(c_acctbal) AS max_bal
FROM d GROUP BY dec
"""


@stage(
    "q_customer_balance_deciles",
    BALANCE_DECILES_SQL,
    "customer account-balance deciles: ntile(10) with a (balance, "
    "custkey) total order so bucket edges are deterministic; min/max "
    "are raw passthrough doubles",
)
def q_customer_balance_deciles(spark, sf_dir):
    return _sql_query(BALANCE_DECILES_SQL, ("customer",))(spark, sf_dir)


NATION_BALANCE_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS nc,
         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS cb
  FROM customer GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nk, count(*) AS ns,
         sum(CAST(s_acctbal AS DECIMAL(18,2))) AS sb
  FROM supplier GROUP BY 1
)
SELECT n_name,
       CAST(coalesce(nc, 0) AS BIGINT) AS n_customers,
       round(coalesce(CAST(cb AS DOUBLE), CAST(0 AS DOUBLE)), 2)
         AS customer_balance,
       CAST(coalesce(ns, 0) AS BIGINT) AS n_suppliers,
       round(coalesce(CAST(sb AS DOUBLE), CAST(0 AS DOUBLE)), 2)
         AS supplier_balance
FROM nation
LEFT JOIN c ON n_nationkey = c.nk
LEFT JOIN s ON n_nationkey = s.nk
"""


@stage(
    "q_nation_balance_profile",
    NATION_BALANCE_SQL,
    "per-nation customer vs supplier footprint: two pre-aggregates "
    "LEFT-joined onto the nation dimension (both sides broadcast-sized) "
    "— empty nations surface with zeroed DECIMAL-exact balances instead "
    "of vanishing",
)
def q_nation_balance_profile(spark, sf_dir):
    return _sql_query(
        NATION_BALANCE_SQL, ("nation", "customer", "supplier")
    )(spark, sf_dir)


DISCOUNT_TAX_GRID_SQL = f"""
SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
       CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(round(sum({_DISC} *
             (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 2)
             AS DOUBLE) AS net_revenue
FROM lineitem GROUP BY 1, 2
"""


@stage(
    "q_discount_tax_grid",
    DISCOUNT_TAX_GRID_SQL,
    "discount x tax percentage grid: lineitems bucketed by integer "
    "percentage points (round() snaps the float percentages; both "
    "engines round the identical doubles) with DECIMAL-exact net "
    "revenue per cell — an 11x9 result from one scan",
)
def q_discount_tax_grid(spark, sf_dir):
    return _sql_query(DISCOUNT_TAX_GRID_SQL, ("lineitem",))(spark, sf_dir)


QP_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sq,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS DOUBLE) AS sqq,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
         CAST(sum(CAST(l_quantity AS BIGINT) *
                  CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       round((n * sqp - sq * sp) /
             sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6)
         AS qty_price_corr
FROM s
"""


@stage(
    "q_quantity_price_corr",
    QP_CORR_SQL,
    "Pearson correlation of quantity vs extended price per return flag "
    "— every sum is exact BIGINT/DECIMAL arithmetic (quantities are "
    "integral, prices 2dp), converted to DOUBLE only for the final "
    "closed-form expression, written op-for-op identically in both "
    "engines (native corr() streams differently) and rounded 6dp",
)
def q_quantity_price_corr(spark, sf_dir):
    return _sql_query(QP_CORR_SQL, ("lineitem",))(spark, sf_dir)


REGION_QUARTER_SQL = """
SELECT r_name,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3
"""


@stage(
    "q_revenue_region_quarter",
    REGION_QUARTER_SQL,
    "revenue by region x quarter: the orders fact joined up the "
    "customer->nation->region snowflake (all dimension sides broadcast) "
    "with DECIMAL-exact quarterly totals",
)
def q_revenue_region_quarter(spark, sf_dir):
    return _sql_query(
        REGION_QUARTER_SQL, ("orders", "customer", "nation", "region")
    )(spark, sf_dir)


TOP3_PARTS_SQL = """
WITH pr AS (
  SELECT p_brand, l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
rk AS (
  SELECT p_brand, l_partkey AS partkey, rev,
         row_number() OVER (
           PARTITION BY p_brand ORDER BY rev DESC, l_partkey
         ) AS rn
  FROM pr
)
SELECT p_brand, partkey, round(CAST(rev AS DOUBLE), 2) AS revenue,
       CAST(rn AS BIGINT) AS rank
FROM rk WHERE rn <= 3
"""


@stage(
    "q_top3_parts_per_brand",
    TOP3_PARTS_SQL,
    "top-3 revenue parts per brand: windowed row_number over the "
    "(brand, part) aggregate with DECIMAL-exact ordering and a partkey "
    "tiebreak — the window input is already reduced to one row per "
    "part, so the sort is over the aggregate, not the fact table",
)
def q_top3_parts_per_brand(spark, sf_dir):
    return _sql_query(TOP3_PARTS_SQL, ("lineitem", "part"))(spark, sf_dir)


SUPPLIER_SHARE_SQL = f"""
WITH sr AS (
  SELECT s_nationkey, sum({_DISC}) AS rev
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT n_name, CAST(round(rev, 2) AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE), 6)
         AS share
FROM sr JOIN nation ON s_nationkey = n_nationkey
"""


@stage(
    "q_supplier_nation_share",
    SUPPLIER_SHARE_SQL,
    "each nation's share of global supplier revenue: DECIMAL-exact "
    "numerator and denominator (one unpartitioned window over the "
    "25-row nation aggregate), single rounded division",
)
def q_supplier_nation_share(spark, sf_dir):
    return _sql_query(SUPPLIER_SHARE_SQL, ("lineitem", "supplier", "nation"))(
        spark, sf_dir
    )


# ---------------------------------------------------------------------------
# Event-stream analytics — shared SQL, each engine's epoch-seconds fn
# ---------------------------------------------------------------------------


def _events_sql(sql: str):
    """Shared text; swap the epoch fn for Spark (q_event_sessions idiom)."""
    return _sql_query(
        sql.replace("floor(epoch(ts))", "unix_timestamp(ts)"), ("events",)
    )


#: 30-min-gap sessionization (identical machinery to SESSIONS_SQL)
_SESSIONS_CTE = """
e AS (
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
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, min(ts) AS start_ts, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
"""

BOUNCE_SQL = f"""
WITH {_SESSIONS_CTE}
SELECT CAST(floor(start_ts / 86400) AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS bounce_rate
FROM per_session GROUP BY 1
"""


@stage(
    "q_event_bounce_rate",
    BOUNCE_SQL,
    "daily bounce rate: share of 30-min-gap sessions containing exactly "
    "one event — sessionization via lag + running-sum windows (the "
    "q_event_sessions machinery) then an integer-exact daily rollup",
)
def q_event_bounce_rate(spark, sf_dir):
    return _events_sql(BOUNCE_SQL)(spark, sf_dir)


DWELL_SQL = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts
  FROM events
),
gaps AS (
  SELECT event_type,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) - ts
           AS gap_s
  FROM e
)
SELECT event_type,
       CAST(count(gap_s) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s,
       round(CAST(sum(gap_s) AS DOUBLE) / count(gap_s), 6) AS avg_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY event_type
"""


@stage(
    "q_event_dwell_time",
    DWELL_SQL,
    "dwell time after each event type: seconds until the same user's "
    "next event — lead window keyed by (ts, event_id) so simultaneous "
    "events are deterministic; integer-exact sums, one rounded division",
)
def q_event_dwell_time(spark, sf_dir):
    return _events_sql(DWELL_SQL)(spark, sf_dir)


PATHS_SQL = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts
  FROM events
),
tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS path,
       CAST(count(*) AS BIGINT) AS n_paths
FROM tri WHERE e3 IS NOT NULL
GROUP BY 1 HAVING count(*) >= 5
"""


@stage(
    "q_event_path_top",
    PATHS_SQL,
    "frequent 3-step user journeys: event-type trigrams per user in "
    "(ts, event_id) order with support >= 5 — both lead offsets share "
    "one window sort; the support threshold replaces a top-k so no "
    "count-tie ordering can flip the result",
)
def q_event_path_top(spark, sf_dir):
    return _events_sql(PATHS_SQL)(spark, sf_dir)


ENTROPY_SQL = """
WITH t AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
),
tot AS (SELECT sum(n) AS total FROM t)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       round(CAST(n AS DOUBLE) / total, 6) AS share,
       round(-(CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total),
             6) AS entropy_term
FROM t, tot
"""


@stage(
    "q_event_type_entropy",
    ENTROPY_SQL,
    "event-type distribution entropy, reported per type: share and "
    "-p*ln(p) term from integer-exact counts — the terms stay per-row "
    "(no cross-term float sum) so 6dp rounding is engine-stable; the "
    "scalar total joins via a 1-row broadcast",
)
def q_event_type_entropy(spark, sf_dir):
    return _events_sql(ENTROPY_SQL)(spark, sf_dir)


HOUR_OF_WEEK_SQL = """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, value FROM events
)
SELECT (CAST(floor(ts / 86400) AS BIGINT) + 4) % 7 AS dow,
       CAST(floor(ts % 86400 / 3600) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100,
             2) AS total_value
FROM e GROUP BY 1, 2
"""


@stage(
    "q_event_hour_of_week",
    HOUR_OF_WEEK_SQL,
    "hour-of-week activity grid: day-of-week from pure epoch arithmetic "
    "((d+4)%7, Thursday-anchored) — sidesteps the engines' different "
    "dayofweek() conventions entirely; values snap to integer cents "
    "before summing so the totals are order-exact",
)
def q_event_hour_of_week(spark, sf_dir):
    return _events_sql(HOUR_OF_WEEK_SQL)(spark, sf_dir)


LIFESPAN_SQL = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events
),
u AS (
  SELECT user_id,
         CAST(floor(max(ts) / 86400) - floor(min(ts) / 86400) AS BIGINT)
           AS span_days,
         count(*) AS n
  FROM e GROUP BY user_id
)
SELECT span_days,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n) AS BIGINT) AS n_events
FROM u GROUP BY span_days
"""


@stage(
    "q_event_user_lifespan",
    LIFESPAN_SQL,
    "user lifespan histogram: whole days between a user's first and "
    "last event (calendar-day aligned) — two integer aggregates, no "
    "floats anywhere",
)
def q_event_user_lifespan(spark, sf_dir):
    return _events_sql(LIFESPAN_SQL)(spark, sf_dir)


PEAK_SQL = """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id FROM events
)
SELECT CAST(ts - ts % 600 AS BIGINT) AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1 HAVING count(*) >= 2
"""


@stage(
    "q_event_peak_minutes",
    PEAK_SQL,
    "peak-load windows: 10-min buckets receiving >= 2 events, with "
    "distinct-user concurrency — integer-only, the HAVING threshold "
    "replaces a top-k so count ties cannot reorder the result",
)
def q_event_peak_minutes(spark, sf_dir):
    return _events_sql(PEAK_SQL)(spark, sf_dir)


INTERARRIVAL_SQL = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts
  FROM events
),
gaps AS (
  SELECT event_type,
         ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS gap_s
  FROM e
)
SELECT event_type,
       CASE WHEN gap_s < 60 THEN 'a_under_1m'
            WHEN gap_s < 600 THEN 'b_1m_10m'
            WHEN gap_s < 3600 THEN 'c_10m_1h'
            WHEN gap_s < 86400 THEN 'd_1h_1d'
            ELSE 'e_over_1d' END AS band,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1, 2
"""


@stage(
    "q_event_interarrival_bands",
    INTERARRIVAL_SQL,
    "inter-arrival time distribution: per-user gaps bucketed into "
    "log-ish integer bands by preceding event type — band edges are "
    "integer comparisons on integer seconds, fully order-exact",
)
def q_event_interarrival_bands(spark, sf_dir):
    return _events_sql(INTERARRIVAL_SQL)(spark, sf_dir)


FIRST_TOUCH_SQL = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts
  FROM events
),
ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM e
)
SELECT event_type AS first_event_type,
       CAST(count(*) AS BIGINT) AS n_users
FROM ranked WHERE rn = 1
GROUP BY 1
"""


@stage(
    "q_event_first_touch",
    FIRST_TOUCH_SQL,
    "first-touch attribution: each user's earliest event type ((ts, "
    "event_id)-deterministic) counted by type — the acquisition-channel "
    "split every funnel report starts from",
)
def q_event_first_touch(spark, sf_dir):
    return _events_sql(FIRST_TOUCH_SQL)(spark, sf_dir)


# ---------------------------------------------------------------------------
# Text analysis — parallel dialect texts (regex fns differ per engine)
# ---------------------------------------------------------------------------

# DuckDB regexp_replace replaces the FIRST match unless the 'g' flag is
# passed; Spark replaces all matches. Both texts below are kept
# op-for-op identical everywhere else.

ARI_SQL = r"""
WITH m AS (
  SELECT doc_id, source,
         length(regexp_replace(text, '\s', '', 'g')) AS n_glyphs,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS n_words,
         len(list_filter(string_split_regex(text, '[.!?]+'),
                         x -> trim(x) <> '')) AS n_sentences
  FROM documents
)
SELECT doc_id,
       CAST(n_glyphs AS BIGINT) AS n_glyphs,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       round((CASE WHEN n_words > 0 AND n_sentences > 0 THEN
         CAST(4.71 AS DOUBLE) * n_glyphs / n_words
         + CAST(0.5 AS DOUBLE) * n_words / n_sentences
         - CAST(21.43 AS DOUBLE) END) * 1000000) / 1000000 AS ari
FROM m
"""

ARI_SPARK_SQL = r"""
WITH m AS (
  SELECT doc_id, source,
         length(regexp_replace(text, '\\s', '')) AS n_glyphs,
         size(filter(split(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS n_words,
         size(filter(split(text, '[.!?]+'),
                     x -> trim(x) <> '')) AS n_sentences
  FROM documents
)
SELECT doc_id,
       CAST(n_glyphs AS BIGINT) AS n_glyphs,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       round((CASE WHEN n_words > 0 AND n_sentences > 0 THEN
         CAST(4.71 AS DOUBLE) * n_glyphs / n_words
         + CAST(0.5 AS DOUBLE) * n_words / n_sentences
         - CAST(21.43 AS DOUBLE) END) * 1000000) / 1000000 AS ari
FROM m
"""


@stage(
    "text_ari_readability",
    ARI_SQL,
    "automated readability index per doc: glyphs/words + words/"
    "sentences from exact integer counts, the closed form evaluated "
    "op-for-op identically (explicit DOUBLE literals — Spark parses "
    "bare 4.71 as DECIMAL) and rounded 6dp — a quality-gate signal "
    "next to the Gopher-style ratios",
)
def q_text_ari_readability(spark, sf_dir):
    return _sql_query(ARI_SPARK_SQL, ("documents",))(spark, sf_dir)


SENTENCE_STATS_SQL = r"""
WITH m AS (
  SELECT source,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS n_words,
         len(list_filter(string_split_regex(text, '[.!?]+'),
                         x -> trim(x) <> '')) AS n_sentences
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_sentences) AS BIGINT) AS total_sentences,
       round(CAST(sum(n_sentences) AS DOUBLE) / count(*), 6)
         AS sentences_per_doc,
       round(CAST(sum(n_words) AS DOUBLE) / sum(n_sentences), 6)
         AS words_per_sentence
FROM m GROUP BY source
"""

SENTENCE_STATS_SPARK_SQL = r"""
WITH m AS (
  SELECT source,
         size(filter(split(trim(lower(text)), '\\s+'),
                     x -> x <> '')) AS n_words,
         size(filter(split(text, '[.!?]+'),
                     x -> trim(x) <> '')) AS n_sentences
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_sentences) AS BIGINT) AS total_sentences,
       round(CAST(sum(n_sentences) AS DOUBLE) / count(*), 6)
         AS sentences_per_doc,
       round(CAST(sum(n_words) AS DOUBLE) / sum(n_sentences), 6)
         AS words_per_sentence
FROM m GROUP BY source
"""


@stage(
    "text_sentence_stats",
    SENTENCE_STATS_SQL,
    "per-source sentence structure: sentences/doc and words/sentence "
    "from integer-exact sentence and token counts — corpus-profiling "
    "signal for source mixture decisions",
)
def q_text_sentence_stats(spark, sf_dir):
    return _sql_query(SENTENCE_STATS_SPARK_SQL, ("documents",))(spark, sf_dir)


CHAR_CLASS_SQL = r"""
WITH m AS (
  SELECT lang,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           AS n_alpha,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
           AS n_digit,
         length(text) - length(regexp_replace(text, '\s', '', 'g'))
           AS n_space
  FROM documents
)
SELECT lang,
       CAST(sum(n) AS BIGINT) AS total_chars,
       round(CAST(sum(n_alpha) AS DOUBLE) / sum(n), 6) AS alpha_ratio,
       round(CAST(sum(n_digit) AS DOUBLE) / sum(n), 6) AS digit_ratio,
       round(CAST(sum(n_space) AS DOUBLE) / sum(n), 6) AS space_ratio,
       round(CAST(sum(n - n_alpha - n_digit - n_space) AS DOUBLE) / sum(n),
             6) AS other_ratio
FROM m GROUP BY lang
"""

CHAR_CLASS_SPARK_SQL = r"""
WITH m AS (
  SELECT lang,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[A-Za-z]', ''))
           AS n_alpha,
         length(text) - length(regexp_replace(text, '[0-9]', ''))
           AS n_digit,
         length(text) - length(regexp_replace(text, '\\s', ''))
           AS n_space
  FROM documents
)
SELECT lang,
       CAST(sum(n) AS BIGINT) AS total_chars,
       round(CAST(sum(n_alpha) AS DOUBLE) / sum(n), 6) AS alpha_ratio,
       round(CAST(sum(n_digit) AS DOUBLE) / sum(n), 6) AS digit_ratio,
       round(CAST(sum(n_space) AS DOUBLE) / sum(n), 6) AS space_ratio,
       round(CAST(sum(n - n_alpha - n_digit - n_space) AS DOUBLE) / sum(n),
             6) AS other_ratio
FROM m GROUP BY lang
"""


@stage(
    "text_char_class_profile",
    CHAR_CLASS_SQL,
    "character-class composition per language: ASCII-letter / digit / "
    "whitespace / other shares from exact delete-and-diff counts "
    "(length minus length-after-removal, so no per-char explode) — "
    "non-Latin scripts legitimately show near-zero alpha_ratio",
)
def q_text_char_class_profile(spark, sf_dir):
    return _sql_query(CHAR_CLASS_SPARK_SQL, ("documents",))(spark, sf_dir)


BIGRAMS_SQL = r"""
WITH toks AS (
  SELECT lang,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT lang, unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1]))
           AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY 1, 2 HAVING count(*) >= 3
"""

BIGRAMS_SPARK_SQL = r"""
WITH toks AS (
  SELECT lang,
         filter(split(trim(lower(text)), '\\s+'), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT lang, explode(transform(sequence(1, size(t) - 1),
                 i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))
           AS bigram
  FROM toks WHERE size(t) >= 2
)
SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY 1, 2 HAVING count(*) >= 3
"""


@stage(
    "text_top_bigrams_per_lang",
    BIGRAMS_SQL,
    "frequent word bigrams per language (support >= 3): adjacent-token "
    "pairs built inside the token array (1-based element_at on both "
    "engines) so no positional self-join is needed — the n-gram "
    "collocation surface one step up from text_collocations' PMI",
)
def q_text_top_bigrams_per_lang(spark, sf_dir):
    return _sql_query(BIGRAMS_SPARK_SQL, ("documents",))(spark, sf_dir)


WHITESPACE_SQL = r"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN contains(text, '  ') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_double_space,
       CAST(sum(CASE WHEN regexp_matches(text, '[\t\n\r]') THEN 1 ELSE 0
                END) AS BIGINT) AS n_ctrl_ws,
       CAST(sum(CASE WHEN text <> trim(text) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_untrimmed
FROM documents GROUP BY source
"""

WHITESPACE_SPARK_SQL = r"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN contains(text, '  ') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_double_space,
       CAST(sum(CASE WHEN text RLIKE '[\t\n\r]' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ctrl_ws,
       CAST(sum(CASE WHEN text <> trim(text) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_untrimmed
FROM documents GROUP BY source
"""


@stage(
    "text_whitespace_anomalies",
    WHITESPACE_SQL,
    "whitespace hygiene per source: docs with doubled spaces, control "
    "whitespace, or untrimmed edges — integer-only flags feeding the "
    "cleaning stage of the corpus pipeline",
)
def q_text_whitespace_anomalies(spark, sf_dir):
    return _sql_query(WHITESPACE_SPARK_SQL, ("documents",))(spark, sf_dir)


FIRST_TOKEN_SQL = """
WITH f AS (
  SELECT lower(split_part(trim(text), ' ', 1)) AS first_tok
  FROM documents WHERE trim(text) <> ''
)
SELECT first_tok, CAST(count(*) AS BIGINT) AS n_docs
FROM f GROUP BY 1 HAVING count(*) >= 3
"""


@stage(
    "text_first_token_profile",
    FIRST_TOKEN_SQL,
    "document opener distribution: lowercased first token (split_part "
    "is 1-based in both engines) with support >= 3 — skewed openers "
    "flag templated/boilerplate sources",
)
def q_text_first_token_profile(spark, sf_dir):
    return _sql_query(FIRST_TOKEN_SQL, ("documents",))(spark, sf_dir)


NUMERIC_BANDS_SQL = r"""
WITH m AS (
  SELECT source,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
           AS d
  FROM documents WHERE length(text) > 0
)
SELECT source,
       CASE WHEN d = 0 THEN 'a_none'
            WHEN d * 100 < n * 2 THEN 'b_under_2pct'
            WHEN d * 100 < n * 10 THEN 'c_2_10pct'
            ELSE 'd_over_10pct' END AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d) AS BIGINT) AS total_digits
FROM m GROUP BY 1, 2
"""

NUMERIC_BANDS_SPARK_SQL = r"""
WITH m AS (
  SELECT source,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[0-9]', ''))
           AS d
  FROM documents WHERE length(text) > 0
)
SELECT source,
       CASE WHEN d = 0 THEN 'a_none'
            WHEN d * 100 < n * 2 THEN 'b_under_2pct'
            WHEN d * 100 < n * 10 THEN 'c_2_10pct'
            ELSE 'd_over_10pct' END AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d) AS BIGINT) AS total_digits
FROM m GROUP BY 1, 2
"""


@stage(
    "text_numeric_density_bands",
    NUMERIC_BANDS_SQL,
    "digit-density distribution per source: docs bucketed by digit "
    "share with cross-multiplied integer band edges (d*100 < n*2 — no "
    "float ratio ever decides a bucket), a table-heavy-content signal",
)
def q_text_numeric_density_bands(spark, sf_dir):
    return _sql_query(NUMERIC_BANDS_SPARK_SQL, ("documents",))(spark, sf_dir)


# ---------------------------------------------------------------------------
# Embeddings — duplicate vectors + per-label norm profile
# ---------------------------------------------------------------------------

EMB_SIGN_SQL = """
WITH b AS (
  SELECT vec_id, label,
         list_aggregate(list_transform(embedding[1:8],
           x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
           'string_agg', '') AS bucket
  FROM embeddings
)
SELECT bucket,
       CAST(min(vec_id) AS BIGINT) AS rep_vec_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(DISTINCT label) AS BIGINT) AS n_labels
FROM b GROUP BY bucket
"""


@stage(
    "emb_sign_sketch_buckets",
    EMB_SIGN_SQL,
    "axis-aligned sign-sketch bucket audit: each vector keyed by the "
    "sign pattern of its first 8 dims (256 buckets — the degenerate "
    "1-bit-per-axis LSH), reporting occupancy and label spread per "
    "bucket; sign of a raw parquet float is bit-exact in both engines, "
    "and skewed occupancy here predicts hot LSH buckets at scale",
)
def q_emb_sign_sketch_buckets(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.expr(
        "concat_ws('', transform(slice(embedding, 1, 8), "
        "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))"
    )
    return (
        emb.select(bucket.alias("bucket"), "vec_id", "label")
        .groupBy("bucket")
        .agg(
            F.min("vec_id").cast("bigint").alias("rep_vec_id"),
            F.count("*").cast("bigint").alias("n_vectors"),
            F.countDistinct("label").cast("bigint").alias("n_labels"),
        )
    )


EMB_NORM_LABEL_SQL = """
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
                                      x -> CAST(x AS DOUBLE) *
                                           CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       round(sum(nrm) / count(*), 6) AS mean_norm
FROM n GROUP BY label
"""


@stage(
    "emb_norm_by_label",
    EMB_NORM_LABEL_SQL,
    "L2-norm profile per class label: per-row norms fold the float "
    "array in index order on both engines (aggregate/list_sum), "
    "extremes and mean rounded 6dp — detects per-class normalization "
    "drift before cosine similarity assumes unit vectors",
)
def q_emb_norm_by_label(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.expr(
        "sqrt(aggregate(embedding, CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    return (
        emb.select(F.col("label").cast("bigint").alias("label"), sq.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.round(F.sum("nrm") / F.count("*"), 6).alias("mean_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Pipeline + multimodal — the last two rows of the round-6 window
# ---------------------------------------------------------------------------

TOKEN_BUDGET_SQL = r"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '')) AS n_tok
  FROM documents
),
s AS (
  SELECT source, count(*) AS n_docs, sum(n_tok) AS toks
  FROM t GROUP BY source
),
tot AS (SELECT sum(toks) AS total, count(*) AS n_sources FROM s)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(toks AS BIGINT) AS n_tokens,
       round(CAST(toks AS DOUBLE) / total, 6) AS token_share,
       round(CAST(toks * n_sources AS DOUBLE) / total, 6)
         AS vs_uniform_target
FROM s, tot
"""

TOKEN_BUDGET_SPARK_SQL = r"""
WITH t AS (
  SELECT source,
         size(filter(split(trim(text), '\\s+'), x -> x <> '')) AS n_tok
  FROM documents
),
s AS (
  SELECT source, count(*) AS n_docs, sum(n_tok) AS toks
  FROM t GROUP BY source
),
tot AS (SELECT sum(toks) AS total, count(*) AS n_sources FROM s)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(toks AS BIGINT) AS n_tokens,
       round(CAST(toks AS DOUBLE) / total, 6) AS token_share,
       round(CAST(toks * n_sources AS DOUBLE) / total, 6)
         AS vs_uniform_target
FROM s, tot
"""


@stage(
    "pipeline_token_budget",
    TOKEN_BUDGET_SQL,
    "token-budget allocation audit: whitespace-token counts per source, "
    "each source's share of the corpus, and its over/under-sampling "
    "factor against a uniform mixture target — integer-exact counts, "
    "the two ratios rounded 6dp; the report that drives source "
    "up/down-weighting before training",
)
def q_pipeline_token_budget(spark, sf_dir):
    return _sql_query(TOKEN_BUDGET_SPARK_SQL, ("documents",))(spark, sf_dir)


MODALITY_MIX_SQL = """
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image'
                         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT modality,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(min(n_bytes) AS BIGINT) AS min_bytes,
       CAST(max(n_bytes) AS BIGINT) AS max_bytes
FROM p GROUP BY modality
"""


@stage(
    "mm_modality_mix",
    MODALITY_MIX_SQL,
    "multimodal corpus composition: opaque binary payloads bucketed by "
    "modality (deterministic doc_id routing — the stand-in for a real "
    "MIME column) with byte-volume stats per modality; the Spark side "
    "runs through the real binary payload column (attach_fake_payload) "
    "so octet_length counts utf-8 bytes, not characters, on both "
    "engines",
)
def q_mm_modality_mix(spark, sf_dir):
    from kenshin_spark.multimodal import attach_fake_payload

    docs = attach_fake_payload(load_table(spark, sf_dir, "documents"))
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return (
        docs.select(modality.alias("modality"),
                    F.octet_length("payload").alias("n_bytes"))
        .groupBy("modality")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("n_bytes").cast("bigint").alias("min_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
    )
