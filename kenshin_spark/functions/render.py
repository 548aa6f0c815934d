"""Graphite render functions over fetched grids.

The reference serves raw series; sumSeries/movingAverage/… live in
graphite-web / graphite-kenshin, OUTSIDE the reference repo (SURVEY §2.7,
README.md:73-75). A user switching from the reference still calls them,
so the engine ships the core set — each a declarative transform over the
fetch grid ``(metric, ts, value)``, windows partitioned by metric and
ordered by ts (co-located with the storage layout, so no extra shuffle
beyond the window sort).

All functions preserve the grid contract: one row per (metric, slot),
NULL for missing — so they compose: ``moving_average(sum_series(...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _series_window(order: str = "ts") -> Window:
    return Window.partitionBy("metric").orderBy(order)


def sum_series(grid: DataFrame, name: str = "sumSeries") -> DataFrame:
    """Graphite sumSeries: collapse all input series into one, summing per
    slot; a slot where every series is NULL stays NULL (count check)."""
    return (
        grid.groupBy("ts")
        .agg(
            F.sum("value").alias("value"),  # NULL-ignoring; all-NULL → NULL
        )
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def avg_series(grid: DataFrame, name: str = "averageSeries") -> DataFrame:
    """Graphite averageSeries over the slot across series."""
    return (
        grid.groupBy("ts")
        .agg(F.avg("value").alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def moving_average(grid: DataFrame, n_points: int) -> DataFrame:
    """Graphite movingAverage(series, N): mean of the trailing N slots
    (including the current one), NULLs ignored; slots with no non-NULL
    history stay NULL."""
    w = _series_window().rowsBetween(-(n_points - 1), 0)
    return grid.select(
        "metric", "ts", F.avg("value").over(w).alias("value")
    )


def moving_median(grid: DataFrame, n_points: int) -> DataFrame:
    """Graphite movingMedian(series, N): EXACT median of the trailing N
    slots (``percentile``, not ``approx_percentile`` — the render layer
    feeds alerts, where approximation is a liability). NULLs ignored;
    even counts interpolate the middle pair, matching SQL
    ``quantile_cont``."""
    w = _series_window().rowsBetween(-(n_points - 1), 0)
    return grid.select(
        "metric",
        "ts",
        F.expr("percentile(value, 0.5)").over(w).alias("value"),
    )


def time_shift(grid: DataFrame, shift_seconds: int) -> DataFrame:
    """Graphite timeShift: the same series moved forward by ``shift``
    seconds (the day-over-day / week-over-week overlay primitive) —
    timestamps move, values don't."""
    return grid.select(
        "metric", (F.col("ts") + F.lit(shift_seconds)).alias("ts"), "value"
    )


def seasonal_profile(
    grid: DataFrame, period: int = 86400, bucket: int = 3600
) -> DataFrame:
    """Per-metric seasonal baseline: mean value per bucket-of-period
    (default: hour-of-day). The anomaly-detection companion — subtract
    the profile from the live series to de-season it. One doc-keyed
    aggregation; bucket count is period/bucket regardless of history
    length, so the result broadcasts."""
    b = F.floor((F.col("ts") % period) / bucket).cast("long")
    return grid.groupBy("metric", b.alias("bucket_of_period")).agg(
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.count("value").alias("n_slots"),
    )


def derivative(grid: DataFrame) -> DataFrame:
    """Graphite derivative: value - previous value (NULL at series start
    or across a NULL neighbor)."""
    w = _series_window()
    return grid.select(
        "metric", "ts", (F.col("value") - F.lag("value").over(w)).alias("value")
    )


def non_negative_derivative(grid: DataFrame) -> DataFrame:
    """Graphite nonNegativeDerivative: like derivative but counter resets
    (negative deltas) become NULL."""
    w = _series_window()
    delta = F.col("value") - F.lag("value").over(w)
    return grid.select(
        "metric", "ts", F.when(delta >= 0, delta).alias("value")
    )


def scale(grid: DataFrame, factor: float) -> DataFrame:
    """Graphite scale(series, factor)."""
    return grid.select(
        "metric", "ts", (F.col("value") * F.lit(factor)).alias("value")
    )


def alias_series(grid: DataFrame, new_name: str) -> DataFrame:
    """Graphite alias(series, name)."""
    return grid.select(F.lit(new_name).alias("metric"), "ts", "value")


def keep_last_value(grid: DataFrame, limit: int | None = None) -> DataFrame:
    """Graphite keepLastValue: forward-fill NULL slots with the most
    recent value, optionally only across gaps of ≤ limit slots."""
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    filled = F.last("value", ignorenulls=True).over(w)
    if limit is None:
        return grid.select("metric", "ts", filled.alias("value"))
    # count slots since the last non-NULL; refuse to fill past the limit
    marker = F.when(F.col("value").isNotNull(), F.col("ts"))
    last_seen = F.last(marker, ignorenulls=True).over(w)
    step = F.min(F.col("ts") - F.lag("ts").over(_series_window())).over(
        Window.partitionBy("metric")
    )
    gap_slots = (F.col("ts") - last_seen) / step
    return grid.select(
        "metric",
        "ts",
        F.when(gap_slots <= limit, filled).alias("value"),
    )


def interpolate(grid: DataFrame, limit: int | None = None) -> DataFrame:
    """Graphite interpolate(series): linearly fill interior NULL runs
    between the surrounding non-NULL points; leading/trailing NULLs stay
    NULL. ``limit`` caps the fillable run length in slots.

    The lerp is one expression — ``prev + (next - prev) * (ts - prev_ts)
    / (next_ts - prev_ts)`` — evaluated op-for-op identically by any
    engine (two int-difference doubles, one divide, one multiply, one
    add), so results are bit-replayable. Two windows per series (one
    backward, one forward scan), co-partitioned with the grid."""
    wb = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    wf = _series_window().rowsBetween(0, Window.unboundedFollowing)
    marker = F.when(F.col("value").isNotNull(), F.col("ts"))
    prev_v = F.last("value", ignorenulls=True).over(wb)
    prev_t = F.last(marker, ignorenulls=True).over(wb)
    next_v = F.first("value", ignorenulls=True).over(wf)
    next_t = F.first(marker, ignorenulls=True).over(wf)
    lerp = prev_v + (next_v - prev_v) * (F.col("ts") - prev_t) / (
        next_t - prev_t
    )
    fill = lerp
    if limit is not None:
        step = F.min(F.col("ts") - F.lag("ts").over(_series_window())).over(
            Window.partitionBy("metric")
        )
        fill = F.when((next_t - prev_t) / step <= limit + 1, lerp)
    return grid.select(
        "metric",
        "ts",
        F.when(F.col("value").isNotNull(), F.col("value"))
        .otherwise(
            F.when(prev_t.isNotNull() & next_t.isNotNull(), fill)
        )
        .alias("value"),
    )


def absolute(grid: DataFrame) -> DataFrame:
    """Graphite absolute(series)."""
    return grid.select("metric", "ts", F.abs("value").alias("value"))


def summarize(grid: DataFrame, bucket_seconds: int, agg: str = "sum") -> DataFrame:
    """Graphite summarize(series, interval, func): re-bucket the grid into
    coarser intervals — same machinery as the downsample cascade."""
    from kenshin_spark.operators.downsample import downsample

    return downsample(grid, bucket_seconds, agg)


def max_datapoints(
    grid: DataFrame,
    max_points: int,
    base_step: int,
    anchor: int,
    span_slots: int,
    agg: str = "average",
) -> DataFrame:
    """Graphite's maxDataPoints render-API consolidation: pick the
    smallest integer multiple of the tier step that brings the series
    under ``max_points``, then consolidate (avg by default) into buckets
    anchored at the window start. ``span_slots`` is the slot count of the
    full window ((until-from)/step + 1); callers compute it from the
    fetch bounds — a pure-integer derivation both engines reproduce."""
    factor = (span_slots + max_points - 1) // max_points
    step = base_step * factor
    from kenshin_spark.config import AGG_SQL

    agg_expr = AGG_SQL[agg].format(v="value", t="ts")
    return (
        grid.groupBy(
            "metric",
            (
                F.lit(anchor)
                + F.expr(f"(ts - {anchor}) div {step}") * step
            ).cast("long").alias("ts"),
        )
        .agg(F.expr(agg_expr).alias("value"))
    )


def per_second(grid: DataFrame) -> DataFrame:
    """Graphite perSecond: counter delta divided by the slot's time delta;
    counter resets (negative deltas) become NULL, like
    nonNegativeDerivative."""
    w = _series_window()
    dv = F.col("value") - F.lag("value").over(w)
    dt = F.col("ts") - F.lag("ts").over(w)
    return grid.select(
        "metric", "ts", F.when(dv >= 0, dv / dt).alias("value")
    )


def integral(grid: DataFrame) -> DataFrame:
    """Graphite integral: running sum from the series start (NULL-ignoring;
    slots before the first value stay NULL)."""
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    running = F.sum("value").over(w)
    return grid.select(
        "metric",
        "ts",
        F.when(F.col("value").isNotNull(), running).alias("value"),
    )


def offset(grid: DataFrame, amount: float) -> DataFrame:
    """Graphite offset(series, amount)."""
    return grid.select(
        "metric", "ts", (F.col("value") + F.lit(amount)).alias("value")
    )


def clamp(grid: DataFrame, lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Graphite clampMin/clampMax (both at once here)."""
    v = F.col("value")
    if lo is not None:
        v = F.greatest(v, F.lit(float(lo)))
    if hi is not None:
        v = F.least(v, F.lit(float(hi)))
    return grid.select("metric", "ts", v.alias("value"))


def percentile_of_series(
    grid: DataFrame, p: float, name: str = "percentileOfSeries"
) -> DataFrame:
    """Graphite percentileOfSeries(series_list, p): the pointwise exact
    p-th percentile across all series at each timestamp, emitted as one
    combined series. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share linear-interpolation semantics, so the
    render output oracles exactly. One shuffle keyed by ts (map-side
    partial collection per slot)."""
    return (
        grid.groupBy("ts")
        .agg(F.percentile("value", F.lit(p)).alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def level_shift(grid: DataFrame, window: int = 6) -> DataFrame:
    """Step-change score per point: difference between the means of the
    LEADING ``window`` points (current included) and the TRAILING
    ``window`` points (current excluded). A sustained level shift scores
    ≈ the step height at the change point, where a single-point spike
    (z-score territory) only moves it by height/window — the two
    detectors are complementary. NULL until both windows are full, so
    scores never compare half-windows."""
    trail = (
        Window.partitionBy("metric").orderBy("ts").rowsBetween(-window, -1)
    )
    lead = (
        Window.partitionBy("metric")
        .orderBy("ts")
        .rowsBetween(Window.currentRow, window - 1)
    )
    full = (F.count("value").over(trail) == window) & (
        F.count("value").over(lead) == window
    )
    return grid.select(
        "metric",
        "ts",
        "value",
        F.when(
            full, F.avg("value").over(lead) - F.avg("value").over(trail)
        ).alias("shift"),
    )


def zscore(grid: DataFrame, window: int = 12) -> DataFrame:
    """Trailing-window z-score per series: (value − mean) / stddev over
    the previous ``window`` points (current point EXCLUDED, so a spike
    scores against normal history, not against itself). NULL while the
    window has < 2 points or zero variance — anomaly detection's
    standard first pass."""
    w = (
        Window.partitionBy("metric")
        .orderBy("ts")
        .rowsBetween(-window, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return grid.select(
        "metric",
        "ts",
        "value",
        F.when(sd != 0, (F.col("value") - mu) / sd).alias("zscore"),
    )


def highest_average(grid: DataFrame, n: int) -> DataFrame:
    """Graphite highestAverage(series_list, n): keep the n series with the
    highest mean value — series SELECTION, the other half of the render
    API. One aggregate over the grid ranks the series; the (tiny) winner
    set broadcast-joins back to prune the stream."""
    ranked = (
        grid.groupBy("metric")
        .agg(F.avg("value").alias("_avg"))
        .orderBy(F.col("_avg").desc(), F.col("metric"))
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(ranked), "metric")


def ewma(grid: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Graphite exponentialMovingAverage(series, alpha):
    ``EWMA_t = α·v_t + (1-α)·EWMA_{t-1}`` (first non-NULL value seeds the
    state; a NULL slot emits NULL and carries state forward unchanged).

    Inherently recursive, so NOT a window expression — the kernel is a
    per-series Arrow ``applyInPandas`` scan. Render-layer inputs are
    bounded per series (maxDataPoints consolidation runs upstream), so a
    group's batch is small by construction and the scan parallelizes
    across series. Float discipline: ``α·v + (1-α)·s`` with ``(1-α)``
    COMPUTED (not a pre-simplified literal: 1-0.3 ≠ 0.7 in binary64), so
    an oracle writing the same expression is bit-equal."""
    import pandas as pd

    a = float(alpha)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        out, state = [], None
        for v in pdf["value"]:
            if pd.isna(v):
                out.append(None)
            else:
                state = v if state is None else a * v + (1 - a) * state
                out.append(state)
        pdf = pdf.assign(value=pd.array(out, dtype="float64"))
        return pdf[["metric", "ts", "value"]]

    return grid.select("metric", "ts", "value").groupBy("metric").applyInPandas(
        _scan, "metric string, ts long, value double"
    )


def group_by_node(grid: DataFrame, node: int, agg: str = "sum") -> DataFrame:
    """Graphite groupByNode(series_list, n, 'sum'): group series whose
    dotted path shares segment ``node`` (0-based) and combine aligned
    slots — the sumSeries/averageSeries family generalized. One keyed
    aggregation, entirely JVM expressions."""
    if agg not in ("sum", "avg", "min", "max"):
        raise ValueError(f"unsupported combine {agg!r}")
    seg = F.element_at(F.split(F.col("metric"), r"\."), node + 1)
    return (
        grid.groupBy(seg.alias("metric"), "ts")
        .agg(getattr(F, agg)("value").alias("value"))
    )


def holt_step(state, v, a, b, g):
    """One Holt recurrence step (the single source of truth shared by the
    batch ``holt_linear`` scan and the streaming
    ``with_holt_aberration`` operator — state layout ``(level, trend,
    dev)`` or None before seeding). Returns ``(new_state, forecast,
    deviation, aberrant)``; forecast/aberrant are None on the seeding
    step. Expression order matters: it must stay op-for-op identical to
    the RECURSIVE-CTE oracle in queries.py."""
    if state is None:
        return (v, 0.0, 0.0), None, 0.0, None
    level, trend, dev = state
    forecast = level + trend
    aberrant = abs(v - forecast) > 3 * dev
    new_level = a * v + (1 - a) * (level + trend)
    new_trend = b * (new_level - level) + (1 - b) * trend
    new_dev = g * abs(v - forecast) + (1 - g) * dev
    return (new_level, new_trend, new_dev), forecast, new_dev, aberrant


def holt_linear(
    grid: DataFrame,
    alpha: float = 0.1,
    beta: float = 0.0035,
    gamma: float = 0.1,
) -> DataFrame:
    """Holt double-exponential smoothing with an EWMA absolute-deviation
    band — the aberration-detection primitive behind Graphite's
    holtWinters* family (graphite-web's defaults for α/β; seasonality is
    provided separately by ``seasonal_profile``):

        forecast_t = level_{t-1} + trend_{t-1}            (one-step-ahead)
        level_t    = α·v_t + (1-α)·(level_{t-1} + trend_{t-1})
        trend_t    = β·(level_t - level_{t-1}) + (1-β)·trend_{t-1}
        dev_t      = γ·|v_t - forecast_t| + (1-γ)·dev_{t-1}
        aberrant_t = |v_t - forecast_t| > 3·dev_{t-1}

    Output: ``(metric, ts, value, forecast, deviation, aberrant)``;
    the first slot has no prior state (forecast/aberrant NULL). Same
    execution shape as ``ewma``: recursive, so a per-series Arrow
    ``applyInPandas`` scan; every coefficient expression is written
    op-for-op the way the recursive-CTE oracle writes it (computed
    ``1-α``, not pre-simplified literals), so results are bit-equal."""
    import pandas as pd

    a, b, g = float(alpha), float(beta), float(gamma)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        n = len(pdf)
        fc = [None] * n
        dv = [None] * n
        ab = [None] * n
        state = None
        for i, v in enumerate(pdf["value"]):
            if pd.isna(v):
                continue
            state, fc[i], dv[i], ab[i] = holt_step(state, float(v), a, b, g)
        return pd.DataFrame(
            {
                "metric": pdf["metric"].values,
                "ts": pdf["ts"].values,
                "value": pdf["value"].values,
                "forecast": pd.array(fc, dtype="float64"),
                "deviation": pd.array(dv, dtype="float64"),
                "aberrant": pd.array(ab, dtype="boolean"),
            }
        )

    return grid.select("metric", "ts", "value").groupBy("metric").applyInPandas(
        _scan,
        "metric string, ts long, value double, forecast double, "
        "deviation double, aberrant boolean",
    )


def moving_stdev(grid: DataFrame, n_points: int) -> DataFrame:
    """Graphite movingStdDev-style trailing sample deviation — written as
    the EXPLICIT two-sum formula ``sqrt((Σv² - (Σv)²/n) / (n-1))`` rather
    than the engine's stddev aggregate: Spark and DuckDB implement
    stddev with different streaming algorithms (different rounding
    paths), while two window sums + the same scalar expression are
    op-for-op identical across engines. Slots with <2 trailing values
    are NULL."""
    w = _series_window().rowsBetween(-(n_points - 1), 0)
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    n = F.count("value").over(w).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    return grid.select(
        "metric",
        "ts",
        F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("value"),
    )


def remove_above_percentile(grid: DataFrame, pct: float) -> DataFrame:
    """Graphite removeAbovePercentile(series, p): slots above the
    series' exact interpolated p-th percentile become NULL (outlier
    clipping before aggregation). The per-series percentile is a tiny
    aggregate broadcast back onto the stream."""
    cuts = grid.groupBy("metric").agg(
        F.expr(f"percentile(value, {pct / 100.0})").alias("_cut")
    )
    return (
        grid.join(F.broadcast(cuts), "metric")
        .select(
            "metric",
            "ts",
            F.when(F.col("value") <= F.col("_cut"), F.col("value")).alias(
                "value"
            ),
        )
    )


def invert(grid: DataFrame) -> DataFrame:
    """Graphite invert(series): 1/x; zero slots become NULL (no ±inf in
    the grid contract)."""
    return grid.select(
        "metric",
        "ts",
        F.when(F.col("value") != 0, F.lit(1.0) / F.col("value")).alias("value"),
    )


def logarithm(grid: DataFrame, base: float = 10.0) -> DataFrame:
    """Graphite logarithm(series, base); non-positive slots become NULL
    (Graphite draws them as None too)."""
    return grid.select(
        "metric",
        "ts",
        F.when(F.col("value") > 0, F.log(float(base), "value")).alias("value"),
    )


def alias_by_node(grid: DataFrame, node: int) -> DataFrame:
    """Graphite aliasByNode(series, n): rename each series to one dotted
    path segment (0-based) — display-name surgery, values untouched."""
    return grid.select(
        F.element_at(F.split(F.col("metric"), r"\."), node + 1).alias("metric"),
        "ts",
        "value",
    )


def divide_series(grid: DataFrame, divisor_grid: DataFrame) -> DataFrame:
    """Graphite divideSeries(dividend, divisor): slot-wise ratio of two
    grids joined on (metric, ts) — co-partitioned self-join shape, the
    same-key join Catalyst plans without an extra shuffle beyond
    alignment. Divisor 0 or a missing slot → NULL."""
    d = divisor_grid.select(
        "metric", "ts", F.col("value").alias("_div")
    )
    return (
        grid.join(d, ["metric", "ts"], "left")
        .select(
            "metric",
            "ts",
            F.when(F.col("_div") != 0, F.col("value") / F.col("_div")).alias(
                "value"
            ),
        )
    )


def as_percent(grid: DataFrame) -> DataFrame:
    """Graphite asPercent(series_list): each slot as a percentage of the
    slot's total across series — one window sum per ts, no join."""
    total = F.sum("value").over(Window.partitionBy("ts"))
    return grid.select(
        "metric",
        "ts",
        F.when(total != 0, F.col("value") * 100.0 / total).alias("value"),
    )


def n_percentile(grid: DataFrame, pct: float) -> DataFrame:
    """Graphite nPercentile(series, p): every slot of a series replaced
    by the series' exact p-th percentile (the flat-line reference)."""
    cuts = grid.groupBy("metric").agg(
        F.expr(f"percentile(value, {pct / 100.0})").alias("_cut")
    )
    return (
        grid.join(F.broadcast(cuts), "metric")
        .select("metric", "ts", F.col("_cut").alias("value"))
    )


def sort_by_maxima(grid: DataFrame, n: int) -> DataFrame:
    """Graphite sortByMaxima + limit: keep the n series with the highest
    peak — same selection shape as highest_average."""
    ranked = (
        grid.groupBy("metric")
        .agg(F.max("value").alias("_peak"))
        .orderBy(F.col("_peak").desc(), F.col("metric"))
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(ranked), "metric")


def delay(grid: DataFrame, steps: int) -> DataFrame:
    """Graphite delay(series, steps): each slot shows the value from
    ``steps`` slots earlier (NULL before history exists) — unlike
    time_shift, the time axis stays put."""
    w = _series_window()
    return grid.select(
        "metric", "ts", F.lag("value", steps).over(w).alias("value")
    )


def changed(grid: DataFrame) -> DataFrame:
    """Graphite changed(series): 1 where the value differs from the
    previous slot, else 0 (NULL-safe comparison; first slot is 0)."""
    w = _series_window()
    prev = F.lag("value").over(w)
    first = F.lag("ts").over(w).isNull()
    return grid.select(
        "metric",
        "ts",
        F.when(first | F.col("value").eqNullSafe(prev), 0.0)
        .otherwise(1.0)
        .alias("value"),
    )


def count_series(grid: DataFrame, name: str = "countSeries") -> DataFrame:
    """Graphite countSeries(series_list): how many series have a
    non-NULL value in each slot."""
    return (
        grid.groupBy("ts")
        .agg(F.count("value").cast("double").alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def minimum_above(grid: DataFrame, n: float) -> DataFrame:
    """Graphite minimumAbove(series_list, n): keep series whose minimum
    exceeds n — series selection, same shape as highest_average."""
    keep = (
        grid.groupBy("metric")
        .agg(F.min("value").alias("_m"))
        .where(F.col("_m") > n)
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


def maximum_below(grid: DataFrame, n: float) -> DataFrame:
    """Graphite maximumBelow(series_list, n): keep series whose maximum
    stays under n."""
    keep = (
        grid.groupBy("metric")
        .agg(F.max("value").alias("_m"))
        .where(F.col("_m") < n)
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


#: Graphite-API function names → grid transforms, for string-driven
#: render pipelines (the serving layer's `target=fn2(fn1(glob),arg)`
#: form). Only functions whose arguments are scalars appear — series-
#: combining forms (divideSeries) need structured calls.
def average_above(grid: DataFrame, n: float) -> DataFrame:
    """Graphite averageAbove(series_list, n): keep series whose mean is
    above n."""
    keep = (
        grid.groupBy("metric")
        .agg(F.avg("value").alias("_m"))
        .where(F.col("_m") > n)
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


def average_below(grid: DataFrame, n: float) -> DataFrame:
    """Graphite averageBelow(series_list, n)."""
    keep = (
        grid.groupBy("metric")
        .agg(F.avg("value").alias("_m"))
        .where(F.col("_m") < n)
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


def current_above(grid: DataFrame, n: float) -> DataFrame:
    """Graphite currentAbove(series_list, n): keep series whose LAST
    non-NULL value is above n — max_by over non-NULL slots."""
    keep = (
        grid.where(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(F.expr("max_by(value, ts)").alias("_last"))
        .where(F.col("_last") > n)
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


def current_below(grid: DataFrame, n: float) -> DataFrame:
    """Graphite currentBelow(series_list, n)."""
    keep = (
        grid.where(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(F.expr("max_by(value, ts)").alias("_last"))
        .where(F.col("_last") < n)
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


def limit_series(grid: DataFrame, n: int) -> DataFrame:
    """Graphite limit(series_list, n): keep the first n series in
    deterministic (metric-name) order."""
    keep = (
        grid.select("metric").distinct().orderBy("metric").limit(n)
    )
    return grid.join(F.broadcast(keep), "metric")


def most_deviant(grid: DataFrame, n: int) -> DataFrame:
    """Graphite mostDeviant(series_list, n): the n series with the
    largest variance — explicit two-sum population variance (engine
    stddev aggregates stream differently; see moving_stdev)."""
    ranked = (
        grid.where(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(
            F.sum("value").alias("_s1"),
            F.sum(F.col("value") * F.col("value")).alias("_s2"),
            F.count("value").cast("double").alias("_n"),
        )
        .select(
            "metric",
            ((F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n"))
             / F.col("_n")).alias("_var"),
        )
        .orderBy(F.col("_var").desc(), "metric")
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(ranked), "metric")


def alias_sub(grid: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """Graphite aliasSub(series_list, search, replace): regex-rewrite
    the series name."""
    return grid.select(
        F.regexp_replace("metric", pattern, replacement).alias("metric"),
        "ts",
        "value",
    )


def scale_to_seconds(grid: DataFrame, seconds: int, step: int) -> DataFrame:
    """Graphite scaleToSeconds(series, seconds): normalize each slot to
    a per-``seconds`` rate given the grid step."""
    factor = float(seconds) / float(step)
    return grid.select(
        "metric", "ts", (F.col("value") * factor).alias("value")
    )


def time_slice(grid: DataFrame, start_ts: int, end_ts: int) -> DataFrame:
    """Graphite timeSlice(series, start, end): NULL out slots outside
    [start, end) while keeping the grid shape."""
    inside = (F.col("ts") >= start_ts) & (F.col("ts") < end_ts)
    return grid.select(
        "metric", "ts", F.when(inside, F.col("value")).alias("value")
    )


def remove_above_value(grid: DataFrame, n: float) -> DataFrame:
    """Graphite removeAboveValue(series, n): slots above n become NULL."""
    return grid.select(
        "metric", "ts",
        F.when(F.col("value") <= n, F.col("value")).alias("value"),
    )


def remove_below_value(grid: DataFrame, n: float) -> DataFrame:
    """Graphite removeBelowValue(series, n): slots below n become NULL."""
    return grid.select(
        "metric", "ts",
        F.when(F.col("value") >= n, F.col("value")).alias("value"),
    )


def average_outside_percentile(grid: DataFrame, n: float) -> DataFrame:
    """Graphite averageOutsidePercentile(series_list, n): keep series
    whose mean lies OUTSIDE the [100-n, n] percentile band of all
    series means (n normalized to the upper half) — the outlier-series
    selector."""
    hi = n if n >= 50.0 else 100.0 - n
    lo = 100.0 - hi
    means = grid.groupBy("metric").agg(F.avg("value").alias("_m"))
    cuts = means.agg(
        F.expr(f"percentile(_m, {lo / 100.0})").alias("_lo"),
        F.expr(f"percentile(_m, {hi / 100.0})").alias("_hi"),
    )
    keep = (
        means.crossJoin(F.broadcast(cuts))
        .where((F.col("_m") < F.col("_lo")) | (F.col("_m") > F.col("_hi")))
        .select("metric")
    )
    return grid.join(F.broadcast(keep), "metric")


def max_series(grid: DataFrame, name: str = "maxSeries") -> DataFrame:
    """Graphite maxSeries(series_list): per-slot maximum across series
    (NULL-ignoring; all-NULL slots stay NULL)."""
    return (
        grid.groupBy("ts")
        .agg(F.max("value").alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def min_series(grid: DataFrame, name: str = "minSeries") -> DataFrame:
    """Graphite minSeries(series_list): per-slot minimum across series."""
    return (
        grid.groupBy("ts")
        .agg(F.min("value").alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def range_of_series(grid: DataFrame, name: str = "rangeOfSeries") -> DataFrame:
    """Graphite rangeOfSeries(series_list): per-slot max - min across
    series (the spread band)."""
    return (
        grid.groupBy("ts")
        .agg((F.max("value") - F.min("value")).alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def stddev_series(grid: DataFrame, name: str = "stddevSeries") -> DataFrame:
    """Graphite stddevSeries(series_list): per-slot population standard
    deviation across series (graphite divides by N, not N-1) — explicit
    two-sum formula so the float path is op-for-op identical to the SQL
    oracle (native stddev aggregates stream differently per engine; the
    same discipline as moving_stdev)."""
    return (
        grid.groupBy("ts")
        .agg(
            F.sum("value").alias("_s1"),
            F.sum(F.col("value") * F.col("value")).alias("_s2"),
            F.count("value").cast("double").alias("_n"),
        )
        .select(
            F.lit(name).alias("metric"),
            "ts",
            F.when(
                F.col("_n") >= 1,
                F.sqrt(
                    F.greatest(
                        (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n"))
                        / F.col("_n"),
                        F.lit(0.0),
                    )
                ),
            ).alias("value"),
        )
    )


def diff_series(grid: DataFrame, name: str = "diffSeries") -> DataFrame:
    """Graphite diffSeries(series_list): the FIRST series (lowest metric
    name — the grid is unordered, so lexicographic is the deterministic
    stand-in for argument order) minus the per-slot sum of the rest;
    slots where every series is NULL stay NULL."""
    first = grid.select(F.min("metric").alias("_first"))
    signed = grid.crossJoin(F.broadcast(first)).select(
        "ts",
        F.when(F.col("metric") == F.col("_first"), F.col("value"))
        .otherwise(-F.col("value"))
        .alias("_sv"),
    )
    return (
        signed.groupBy("ts")
        .agg(F.sum("_sv").alias("value"))
        .select(F.lit(name).alias("metric"), "ts", "value")
    )


def moving_sum(grid: DataFrame, n_points: int) -> DataFrame:
    """Graphite movingSum(series, N): sum of the trailing N slots."""
    w = _series_window().rowsBetween(-(n_points - 1), 0)
    return grid.select(
        "metric", "ts", F.sum("value").over(w).alias("value")
    )


def moving_min(grid: DataFrame, n_points: int) -> DataFrame:
    """Graphite movingMin(series, N): minimum of the trailing N slots."""
    w = _series_window().rowsBetween(-(n_points - 1), 0)
    return grid.select(
        "metric", "ts", F.min("value").over(w).alias("value")
    )


def moving_max(grid: DataFrame, n_points: int) -> DataFrame:
    """Graphite movingMax(series, N): maximum of the trailing N slots."""
    w = _series_window().rowsBetween(-(n_points - 1), 0)
    return grid.select(
        "metric", "ts", F.max("value").over(w).alias("value")
    )


def hitcount(
    grid: DataFrame, bucket_seconds: int, step_seconds: int = 60
) -> DataFrame:
    """Graphite hitcount(series, interval): convert a per-second RATE
    series into total hits per bucket — Σ value·step over each bucket
    (graphite multiplies each datapoint by its slot width; the grid's
    slot width is ``step_seconds``). Buckets with no data stay NULL."""
    bucket = (F.col("ts") - F.col("ts") % bucket_seconds).alias("ts")
    return (
        grid.groupBy("metric", bucket)
        .agg(F.sum(F.col("value") * step_seconds).alias("value"))
    )


def grep_series(grid: DataFrame, pattern: str) -> DataFrame:
    """Graphite grep(series_list, pattern): keep series whose name
    matches the regex (substring search, like graphite's re.search)."""
    return grid.where(F.col("metric").rlike(pattern))


def exclude_series(grid: DataFrame, pattern: str) -> DataFrame:
    """Graphite exclude(series_list, pattern): drop series whose name
    matches the regex."""
    return grid.where(~F.col("metric").rlike(pattern))


def highest_current(grid: DataFrame, n: int) -> DataFrame:
    """Graphite highestCurrent(series_list, n): the n series with the
    highest LAST non-NULL value — selection by the freshest reading."""
    last = (
        grid.where(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(F.max_by("value", "ts").alias("_cur"))
        .orderBy(F.col("_cur").desc(), F.col("metric"))
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(last), "metric")


def highest_max(grid: DataFrame, n: int) -> DataFrame:
    """Graphite highestMax(series_list, n): the n series with the
    highest peak (sortByMaxima without the reorder contract)."""
    return sort_by_maxima(grid, n)


def lowest_average(grid: DataFrame, n: int) -> DataFrame:
    """Graphite lowestAverage(series_list, n): the n series with the
    lowest mean — the inverse selection of highestAverage."""
    ranked = (
        grid.groupBy("metric")
        .agg(F.avg("value").alias("_avg"))
        .orderBy(F.col("_avg").asc(), F.col("metric"))
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(ranked), "metric")


def lowest_current(grid: DataFrame, n: int) -> DataFrame:
    """Graphite lowestCurrent(series_list, n): the n series with the
    lowest last non-NULL value."""
    last = (
        grid.where(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(F.max_by("value", "ts").alias("_cur"))
        .orderBy(F.col("_cur").asc(), F.col("metric"))
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(last), "metric")


def sort_by_total(grid: DataFrame, n: int) -> DataFrame:
    """Graphite sortByTotal + limit: the n series with the highest
    NULL-ignoring sum — same selection shape as highest_average."""
    ranked = (
        grid.groupBy("metric")
        .agg(F.sum("value").alias("_tot"))
        .orderBy(F.col("_tot").desc(), F.col("metric"))
        .limit(n)
        .select("metric")
    )
    return grid.join(F.broadcast(ranked), "metric")


def pow_series(grid: DataFrame, exponent: float) -> DataFrame:
    """Graphite pow(series, n): each value raised to the exponent."""
    return grid.select(
        "metric", "ts", F.pow("value", F.lit(exponent)).alias("value")
    )


def square_root(grid: DataFrame) -> DataFrame:
    """Graphite squareRoot(series): negative values go NULL (graphite
    emits None there too — sqrt of a negative is not a datapoint)."""
    return grid.select(
        "metric", "ts",
        F.when(F.col("value") >= 0, F.sqrt("value")).alias("value"),
    )


def alias_by_metric(grid: DataFrame) -> DataFrame:
    """Graphite aliasByMetric(series): keep only the last dotted path
    segment as the display name."""
    return grid.select(
        F.element_at(F.split("metric", r"\."), -1).alias("metric"),
        "ts", "value",
    )


RENDER_REGISTRY = {
    "aliasByMetric": alias_by_metric,
    "pow": pow_series,
    "squareRoot": square_root,
    "diffSeries": diff_series,
    "exclude": exclude_series,
    "grep": grep_series,
    "highestCurrent": highest_current,
    "highestMax": highest_max,
    "hitcount": hitcount,
    "lowestAverage": lowest_average,
    "lowestCurrent": lowest_current,
    "maxSeries": max_series,
    "minSeries": min_series,
    "movingMax": moving_max,
    "movingMin": moving_min,
    "movingSum": moving_sum,
    "rangeOfSeries": range_of_series,
    "sortByTotal": sort_by_total,
    "stddevSeries": stddev_series,
    "aliasSub": alias_sub,
    "averageOutsidePercentile": average_outside_percentile,
    "removeAboveValue": remove_above_value,
    "removeBelowValue": remove_below_value,
    "averageAbove": average_above,
    "averageBelow": average_below,
    "currentAbove": current_above,
    "currentBelow": current_below,
    "limit": limit_series,
    "mostDeviant": most_deviant,
    "scaleToSeconds": scale_to_seconds,
    "timeSlice": time_slice,
    "absolute": absolute,
    "alias": alias_series,
    "aliasByNode": alias_by_node,
    "asPercent": as_percent,
    "averageSeries": avg_series,
    "changed": changed,
    "countSeries": count_series,
    "delay": delay,
    "derivative": derivative,
    "exponentialMovingAverage": ewma,
    "groupByNode": group_by_node,
    "highestAverage": highest_average,
    "integral": integral,
    "interpolate": interpolate,
    "invert": invert,
    "keepLastValue": keep_last_value,
    "logarithm": logarithm,
    "maximumBelow": maximum_below,
    "minimumAbove": minimum_above,
    "movingAverage": moving_average,
    "movingMedian": moving_median,
    "movingStdDev": moving_stdev,
    "nPercentile": n_percentile,
    "nonNegativeDerivative": non_negative_derivative,
    "offset": offset,
    "perSecond": per_second,
    "removeAbovePercentile": remove_above_percentile,
    "scale": scale,
    "sortByMaxima": sort_by_maxima,
    "sumSeries": sum_series,
    "summarize": summarize,
    "timeShift": time_shift,
}


def apply_chain(grid: DataFrame, chain) -> DataFrame:
    """Apply a graphite-style function pipeline to a fetched grid:

        apply_chain(grid, [("movingAverage", 3), ("scale", 8.0), "absolute"])

    Each element is a registry name or ``(name, *args)``; functions
    compose left-to-right, each preserving the grid contract. The
    serving layer parses ``target=`` strings into exactly this form."""
    for step in chain:
        if isinstance(step, str):
            name, args = step, ()
        else:
            name, *args = step
        if name not in RENDER_REGISTRY:
            raise KeyError(f"unknown render function {name!r}")
        grid = RENDER_REGISTRY[name](grid, *args)
    return grid
