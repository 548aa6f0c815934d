"""Eighth staged bank — ROUND 12: weighted-rate sampling audit,
language-field validation, exact audience overlap (the ground truth
the KMV rows estimate), peak-hour report, two-store fetch union, SLA
availability, LSH threshold bands, IVF balance, winsorized means,
quality-weighted token budget, and shingle dup-mass.

Same staging mechanism and gate (``tests/test_queries_staged_r12.py``)
as the earlier banks. Promote with
``python tools/promote_staged.py queries_staged_r12`` once round 11's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QUERIES as _REG
from kenshin_spark.queries import PTS, QuerySpec, _points

STAGED_R12: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R12[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "sample_weighted_rate_audit",
    """
    WITH w AS (
      SELECT source, doc_id,
             least(n_chars, 2000) AS wgt
      FROM documents
    ),
    samp AS (
      SELECT source FROM w
      WHERE CAST(('0x' || substr(md5('ksp|' ||
              CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1000000 < wgt * 100
    )
    SELECT w.source,
           count(*) AS n_docs,
           sum(w.wgt) AS total_weight,
           coalesce(s.n_sampled, 0) AS n_sampled
    FROM w LEFT JOIN (
      SELECT source, count(*) AS n_sampled FROM samp GROUP BY 1
    ) s ON s.source = w.source
    GROUP BY 1, s.n_sampled
    """,
    "weight-proportional rate sampling with INTEGER thresholds (the "
    "oracle-safe sibling of the A-ES weighted reservoir): each doc's "
    "inclusion bar is its capped length x 100 ppm, so long docs "
    "sample proportionally more — the length-balanced corpus draw; "
    "membership keyed to the seeded doc_id hash, replayed exactly",
)
def q_sample_weighted_rate_audit(spark, sf_dir):
    from kenshin_spark.functions.sampling import sample_bucket

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", "doc_id",
        F.least("n_chars", F.lit(2000)).alias("wgt"),
    )
    samp = (
        w.where(sample_bucket("doc_id") < F.col("wgt") * 100)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    tot = w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("wgt").alias("total_weight"),
    )
    return tot.join(samp, "source", "left").select(
        "source", "n_docs", "total_weight",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


def _lang_pred_sql() -> str:
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
    return f"SELECT doc_id, lang, CASE {whens} ELSE 'und' END AS pred FROM documents"


@stage(
    "text_lang_confusion_pairs",
    f"""
    WITH p AS ({_lang_pred_sql()})
    SELECT lang AS labeled, pred AS predicted, count(*) AS n_docs
    FROM p GROUP BY 1, 2
    """,
    "language-field validation: the corpus's labeled lang column "
    "crossed with the n-gram language_id prediction — the confusion "
    "matrix that catches mislabeled providers before training; same "
    "marker arithmetic as text_language_id, integer counts",
)
def q_text_lang_confusion_pairs(spark, sf_dir):
    from kenshin_spark.functions.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled"),
            language_id("text").alias("predicted"),
        )
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@stage(
    "q_events_user_overlap_matrix",
    """
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_shared_users
    FROM u a JOIN u b
      ON b.user_id = a.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    "exact audience overlap matrix: distinct users doing BOTH event "
    "types for every type pair — the ground truth the KMV theta "
    "estimates approximate (r11 rows), one distinct + one self-join; "
    "at 100 TB this is the query the sketch replaces, kept as the "
    "calibration row",
)
def q_q_events_user_overlap_matrix(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("event_type", "user_id").distinct()
    a, b = u.alias("a"), u.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_users"))
    )


@stage(
    "q_events_peak_hour_per_type",
    """
    WITH h AS (
      SELECT event_type,
             CAST(CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24
                  AS BIGINT) AS hour,
             count(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour AS peak_hour, c AS n_events FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY c DESC, hour) AS rnk
      FROM h
    ) t WHERE rnk = 1
    """,
    "peak traffic hour per event type: hour-of-day histogram reduced "
    "to its argmax with an hour tie-break — the capacity-planning "
    "headline; integer epoch arithmetic, no timezone functions",
)
def q_q_events_peak_hour_per_type(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        ((F.unix_timestamp("ts").cast("long") / 3600).cast("long") % 24)
        .alias("hour"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("hour")
    )
    return (
        h.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("hour").alias("peak_hour"),
            F.col("c").alias("n_events"),
        )
    )


@stage(
    "ts_sla_availability_weekly",
    f"""
    WITH pts AS ({PTS}),
    slots AS (SELECT DISTINCT metric, ts - ts % 3600 AS slot FROM pts),
    weeks AS (
      SELECT metric, CAST(slot // 604800 AS BIGINT) AS week,
             count(*) AS hours_up
      FROM slots GROUP BY 1, 2
    )
    SELECT metric, week, hours_up,
           hours_up * 1000000 // 168 AS availability_ppm
    FROM weeks
    """,
    "weekly availability SLA: hours with at least one datapoint out "
    "of the week's 168, as floor-scaled ppm — the uptime number an "
    "SLO report publishes per series; pure integer slot arithmetic",
)
def q_ts_sla_availability_weekly(spark, sf_dir):
    pts = _points(spark, sf_dir)
    slots = pts.select(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("slot")
    ).distinct()
    weeks = slots.groupBy(
        "metric", (F.col("slot") / 604800).cast("long").alias("week")
    ).agg(F.count(F.lit(1)).alias("hours_up"))
    return weeks.select(
        "metric", "week", "hours_up",
        F.expr("hours_up * 1000000 DIV 168").alias("availability_ppm"),
    )


@stage(
    "dedup_lsh_threshold_bands",
    f"""
    SELECT CAST(floor(jaccard * 10) AS BIGINT) AS band,
           count(*) AS n_pairs
    FROM ({_REG["dedup_minhash_lsh"].oracle}) p
    GROUP BY 1
    """,
    "near-dup score distribution: the MinHash-LSH pair set banded by "
    "Jaccard decile — the curve that shows whether the 0.5 threshold "
    "sits in a valley (clean dup/non-dup separation) or a slope "
    "(threshold-sensitive corpus); derived from the registry's "
    "replayable path",
)
def q_dedup_lsh_threshold_bands(spark, sf_dir):
    p = _REG["dedup_minhash_lsh"].fn(spark, sf_dir)
    return (
        p.select(F.floor(F.col("jaccard") * 10).cast("long").alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@stage(
    "emb_ivf_cell_balance",
    f"""
    WITH c AS (
      SELECT cell, n_vectors FROM ({_REG["emb_ivf_cell_stats"].oracle}) x
    ),
    t AS (SELECT sum(n_vectors) AS tot, max(n_vectors) AS mx FROM c)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           t.mx AS largest_cell,
           t.mx * 1000000 // t.tot AS largest_share_ppm
    FROM c, t GROUP BY t.mx, t.tot
    """,
    "IVF skew headline: the largest cell's share of all vectors "
    "(floor-scaled ppm) — the single number that predicts probe-cost "
    "variance and triggers cell splitting; derived from the "
    "registry's replayable pinned-quantizer assignment",
)
def q_emb_ivf_cell_balance(spark, sf_dir):
    c = _REG["emb_ivf_cell_stats"].fn(spark, sf_dir).select(
        "cell", "n_vectors"
    )
    t = c.agg(
        F.sum("n_vectors").alias("tot"), F.max("n_vectors").alias("mx")
    )
    return c.crossJoin(F.broadcast(t)).groupBy("mx", "tot").agg(
        F.count(F.lit(1)).alias("n_cells")
    ).select(
        "n_cells",
        F.col("mx").alias("largest_cell"),
        F.expr("mx * 1000000 DIV tot").alias("largest_share_ppm"),
    )


@stage(
    "q_events_winsorized_mean",
    """
    WITH b AS (
      SELECT quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT event_type,
             CAST(CASE WHEN value < lo THEN lo
                       WHEN value > hi THEN hi
                       ELSE value END AS DECIMAL(18,6)) AS v
      FROM events, b WHERE value IS NOT NULL
    )
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(v) AS DOUBLE) / count(*) * 1000000) / 1000000
             AS winsorized_mean
    FROM c GROUP BY 1
    """,
    "winsorized mean per event type: values clamped to the global "
    "[p5, p95] band (exact interpolated bounds — identical doubles "
    "on both engines) then DECIMAL-accumulated so the robust mean "
    "carries no float-association drift; one clamp + one aggregate",
)
def q_q_events_winsorized_mean(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    b = ev.agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    c = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .cast("decimal(18,6)")
        .alias("v"),
    )
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)) * 1000000
            )
            / 1000000
        ).alias("winsorized_mean"),
    )


# --------------------------------------------------------------------------
# Batch 2: .hs size model, quality-weighted token budget, shingle dup
# mass, flatline runs, status share, daily new users.
# --------------------------------------------------------------------------

from kenshin_spark.queries import _SHINGLES, _STOP_RE  # noqa: E402
from kenshin_spark.queries_staged_r8_engine import (  # noqa: E402
    DAY1_END,
    _W,
    _export_day1,
    _fnv_shard_sql,
)


@stage(
    "hs_export_size_model",
    f"""
    WITH RECURSIVE {_W},
    {_fnv_shard_sql(4)},
    files AS (
      SELECT shard AS file_id,
             count(*) AS n_metrics,
             sum(length(metric)) AS name_bytes
      FROM sharded GROUP BY 1
    )
    SELECT file_id, n_metrics,
           24 + name_bytes + n_metrics + 12
              + 1440 * (4 + 8 * n_metrics) AS n_bytes
    FROM files
    """,
    "the .hs container's size closed form, verified against real "
    "bytes on disk: a preallocated ring file is metadata(24) + "
    "TAB-joined tags (name bytes + one tab per metric) + one "
    "archive-info(12) + 1440 ring slots x (4 + 8 x metrics-per-file) "
    "— the exporter's manifest n_bytes must equal the arithmetic for "
    "every fnv-sharded bucket (kenshin/storage.py:281-311 layout); "
    "the oracle replays the fnv grouping and the formula",
)
def q_hs_export_size_model(spark, sf_dir):
    import os

    from kenshin_spark.operators.align import last_write_wins
    from kenshin_spark.queries_staged_r8_engine import _week_slots, _workdir
    from kenshin_spark.sources.kenshin_hs import export_kenshin_hs

    out_dir = os.path.join(_workdir(sf_dir, "hs_size_model"), "hs")
    day1 = _week_slots(spark, sf_dir).where(F.col("ts") < DAY1_END)
    manifest = export_kenshin_hs(
        [day1], [(60, 1440)], out_dir, n_files=4,
        agg_method="max", xff=0.5,
    )
    return manifest.select("file_id", "n_metrics", "n_bytes")


@stage(
    "pipeline_quality_token_budget",
    rf"""
    WITH f AS (
      SELECT source,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
      FROM documents
    ),
    r AS (
      SELECT source, n_tokens,
             (n_tokens >= 25 AND n_tokens <= 100000
              AND n_chars >= 3 * n_tokens AND n_chars <= 10 * n_tokens
              AND n_stop >= 2
              AND n_alpha * 50 >= n_chars * 41) AS keep
      FROM f
    )
    SELECT source,
           sum(n_tokens) AS tokens_total,
           sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS tokens_kept,
           sum(CASE WHEN keep THEN n_tokens ELSE 0 END) * 1000000
             // sum(n_tokens) AS kept_ppm
    FROM r GROUP BY 1
    """,
    "the quality gate priced in TOKENS, not documents: per source, "
    "how much of the token budget survives the Gopher-style verdict "
    "(long docs failing quality cost disproportionately) — the number "
    "that reorders cleanup priorities; integer rules, floor-scaled "
    "ppm",
)
def q_pipeline_quality_token_budget(spark, sf_dir):
    from kenshin_spark.functions.text import quality_verdict, token_count

    docs = load_table(spark, sf_dir, "documents")
    v = quality_verdict("text")
    d = docs.select(
        "source",
        token_count("text").cast("long").alias("n_tokens"),
        v["keep"].alias("keep"),
    )
    kept = F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
    return d.groupBy("source").agg(
        F.sum("n_tokens").alias("tokens_total"),
        kept.alias("tokens_kept"),
        F.expr(
            "sum(CASE WHEN keep THEN n_tokens ELSE 0 END) * 1000000"
            " DIV sum(n_tokens)"
        ).alias("kept_ppm"),
    )


@stage(
    "text_shingle_dup_mass",
    f"""
    WITH sh AS ({_SHINGLES}),
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    j AS (
      SELECT s.doc_id, d.df FROM sh s JOIN df d ON d.shingle = s.shingle
    ),
    docs_src AS (SELECT doc_id, source FROM documents)
    SELECT ds.source,
           count(*) AS n_shingles,
           sum(CASE WHEN j.df > 1 THEN 1 ELSE 0 END) AS n_shared,
           sum(CASE WHEN j.df > 1 THEN 1 ELSE 0 END) * 1000000
             // count(*) AS shared_ppm
    FROM j JOIN docs_src ds ON ds.doc_id = j.doc_id
    GROUP BY 1
    """,
    "shingle duplication mass per source: the fraction of a source's "
    "3-gram shingles that appear in MORE than one document — the "
    "boilerplate indicator that predicts near-dup removal volume "
    "before running LSH; the same shingle definition every MinHash "
    "row replays, integer counts and floor-scaled ppm",
)
def q_text_shingle_dup_mass(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("toks"),
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.array_join(
                    F.slice("toks", i, 3), " "
                ),
            )
        ).alias("shingle"),
    ).distinct()
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    j = sh.join(df, "shingle").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("df") > 1).cast("long")).alias("n_shared"),
        F.expr(
            "sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*)"
        ).alias("shared_ppm"),
    )


@stage(
    "ts_flatline_run_histogram",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    marks AS (
      SELECT metric, ts, value,
             CASE WHEN lag(value) OVER w IS NULL
                  OR value <> lag(value) OVER w THEN 1 ELSE 0 END AS brk
      FROM t0 WINDOW w AS (PARTITION BY metric ORDER BY ts)
    ),
    runs AS (
      SELECT metric,
             sum(brk) OVER (PARTITION BY metric ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marks
    ),
    lens AS (
      SELECT metric, run_id, count(*) AS run_len
      FROM runs GROUP BY 1, 2
    )
    SELECT metric, CAST(run_len AS BIGINT) AS run_len,
           count(*) AS n_runs
    FROM lens GROUP BY 1, 2
    """,
    "flatline run-length histogram: consecutive equal-value slot runs "
    "per metric (the gaps-and-islands pass behind ts_flatline_detect) "
    "folded into a length distribution — separates normal quantized "
    "gauges from stuck sensors; integer window arithmetic",
)
def q_ts_flatline_run_histogram(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    w = Window.partitionBy("metric").orderBy("ts")
    marks = t0.withColumn(
        "brk",
        F.when(
            F.lag("value").over(w).isNull()
            | (F.col("value") != F.lag("value").over(w)),
            1,
        ).otherwise(0),
    )
    runs = marks.withColumn(
        "run_id",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    lens = runs.groupBy("metric", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return lens.groupBy(
        "metric", F.col("run_len").cast("long").alias("run_len")
    ).agg(F.count(F.lit(1)).alias("n_runs"))


@stage(
    "q_orders_status_share_monthly",
    """
    SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           count(*) AS n_orders,
           sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 1000000
             // count(*) AS f_share_ppm,
           sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) * 1000000
             // count(*) AS o_share_ppm
    FROM orders GROUP BY 1
    """,
    "monthly fulfilment mix: finished/open order shares as "
    "floor-scaled ppm — the operational trend line; integer "
    "conditional sums",
)
def q_q_orders_status_share_monthly(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
            " * 1000000 DIV count(*)"
        ).alias("f_share_ppm"),
        F.expr(
            "sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)"
            " * 1000000 DIV count(*)"
        ).alias("o_share_ppm"),
    )


@stage(
    "q_events_daily_new_users",
    """
    WITH f AS (
      SELECT user_id,
             min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS first_day
      FROM events GROUP BY 1
    )
    , d AS (
      SELECT CAST(first_day AS BIGINT) AS day, count(*) AS n_new_users
      FROM f GROUP BY 1
    )
    SELECT day, n_new_users,
           CAST(sum(n_new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM d
    """,
    "daily new-user curve with the cumulative total: first-touch day "
    "per user, grouped and running-summed — the growth chart's two "
    "lines in one pass; integer day arithmetic",
)
def q_q_events_daily_new_users(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(
            (F.unix_timestamp("ts").cast("long") / 86400).cast("long")
        ).alias("first_day")
    )
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.select(
        "day", "n_new_users",
        F.sum("n_new_users").over(w).cast("long").alias("cumulative_users"),
    )


# --------------------------------------------------------------------------
# Batch 3: idle users, brand price spread, MAD spikes, order size vs
# latency, word lengths by lang, multi-supplier orders, top spenders,
# tier1 kernel matrix.
# --------------------------------------------------------------------------


@stage(
    "q_events_idle_users",
    """
    WITH b AS (
      SELECT max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_day
      FROM events
    ),
    u AS (
      SELECT user_id,
             max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS user_last
      FROM events GROUP BY 1
    )
    SELECT CAST(b.last_day - u.user_last AS BIGINT) AS idle_days,
           count(*) AS n_users
    FROM u, b GROUP BY 1
    """,
    "churn-risk profile: users bucketed by days since their last "
    "event relative to the stream's high-water day — the idle-cohort "
    "histogram a reactivation campaign targets; integer day "
    "arithmetic",
)
def q_q_events_idle_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long").alias(
            "day"
        ),
    )
    b = ev.agg(F.max("day").alias("last_day"))
    u = ev.groupBy("user_id").agg(F.max("day").alias("user_last"))
    return (
        u.crossJoin(F.broadcast(b))
        .groupBy(
            (F.col("last_day") - F.col("user_last"))
            .cast("long")
            .alias("idle_days")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@stage(
    "q_part_brand_price_spread",
    """
    SELECT p_brand,
           count(*) AS n_parts,
           min(p_retailprice) AS min_price,
           max(p_retailprice) AS max_price,
           round(CAST(max(p_retailprice) - min(p_retailprice) AS DOUBLE),
                 2) AS spread
    FROM part GROUP BY 1
    """,
    "brand price envelope: min/max retail price and spread per brand "
    "— exact comparisons plus one subtraction of exact values, the "
    "assortment-width statistic",
)
def q_q_part_brand_price_spread(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.round(
            (F.max("p_retailprice") - F.min("p_retailprice")).cast(
                "double"
            ),
            2,
        ).alias("spread"),
    )


@stage(
    "ts_spike_detection_mad",
    f"""
    WITH pts AS ({PTS}),
    med AS (
      SELECT metric, quantile_cont(value, 0.5) AS med
      FROM pts WHERE value IS NOT NULL GROUP BY 1
    ),
    dev AS (
      SELECT p.metric, p.value, m.med,
             abs(p.value - m.med) AS adev
      FROM pts p JOIN med m ON m.metric = p.metric
      WHERE p.value IS NOT NULL
    ),
    mad AS (
      SELECT metric, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.metric,
           count(*) AS n_points,
           sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
             AS n_spikes
    FROM dev d JOIN mad m ON m.metric = d.metric
    GROUP BY 1
    """,
    "MAD spike detection — the robust alternative to the z-score "
    "rows: points more than 3 median-absolute-deviations from the "
    "per-metric median, counted; exact interpolated medians give "
    "identical doubles on both engines and the rest is comparisons",
)
def q_ts_spike_detection_mad(spark, sf_dir):
    pts = _points(spark, sf_dir).where(F.col("value").isNotNull())
    med = pts.groupBy("metric").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = pts.join(med, "metric").select(
        "metric", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("metric").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "metric")
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("long")).alias(
                "n_spikes"
            ),
        )
    )


@stage(
    "q_order_size_vs_latency",
    """
    WITH l AS (
      SELECT l_orderkey,
             count(*) AS n_lines,
             max(datediff('day', o_orderdate, l_shipdate)) AS last_ship_d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1
    )
    SELECT CASE WHEN n_lines <= 2 THEN '1-2'
                WHEN n_lines <= 4 THEN '3-4' ELSE '5+' END AS size_band,
           count(*) AS n_orders,
           round(quantile_cont(last_ship_d, 0.5), 6) AS median_last_ship_d
    FROM l GROUP BY 1
    """,
    "does order size delay fulfilment: orders banded by line count "
    "against the median time-to-LAST-shipment — the completion "
    "latency, not first-line latency; integer days with the exact "
    "interpolated median",
)
def q_q_order_size_vs_latency(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.max(F.datediff("l_shipdate", "o_orderdate")).alias(
                "last_ship_d"
            ),
        )
    )
    band = (
        F.when(F.col("n_lines") <= 2, "1-2")
        .when(F.col("n_lines") <= 4, "3-4")
        .otherwise("5+")
    )
    return l.groupBy(band.alias("size_band")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(last_ship_d, 0.5)"), 6).alias(
            "median_last_ship_d"
        ),
    )


@stage(
    "text_word_len_by_lang",
    r"""
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    )
    SELECT lang, CAST(length(tok) AS BIGINT) AS word_len,
           count(*) AS n_tokens
    FROM toks WHERE tok <> '' GROUP BY 1, 2
    """,
    "word-length histogram per language — the morphology fingerprint "
    "(agglutinative vs isolating) that sanity-checks the lang labels; "
    "integer lengths and counts",
)
def q_text_word_len_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    return toks.groupBy(
        "lang", F.length("tok").cast("long").alias("word_len")
    ).agg(F.count(F.lit(1)).alias("n_tokens"))


@stage(
    "q_multi_supplier_orders",
    """
    WITH o AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_suppliers
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
           count(*) AS n_orders
    FROM o GROUP BY 1
    """,
    "supplier fan-out per order: how many distinct suppliers each "
    "order's lines touch, as a histogram — the fulfilment-complexity "
    "profile; integer distinct counts",
)
def q_q_multi_supplier_orders(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    return o.groupBy(
        F.col("n_suppliers").cast("long").alias("n_suppliers")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@stage(
    "q_events_value_by_user_topk",
    """
    SELECT user_id, total_value, n_events FROM (
      SELECT user_id,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS total_value,
             count(*) AS n_events,
             row_number() OVER (
               ORDER BY sum(CAST(value AS DECIMAL(18,6))) DESC, user_id
             ) AS rnk
      FROM events WHERE value IS NOT NULL
      GROUP BY 1
    ) t WHERE rnk <= 5
    """,
    "top-5 spenders: DECIMAL-accumulated user totals ranked with a "
    "user_id tie-break — ordering happens on the EXACT decimal, not "
    "the display double, so both engines pick identical winners",
)
def q_q_events_value_by_user_topk(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_dec"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.col("_dec").desc(), F.col("user_id"))
    return (
        u.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "user_id",
            F.round(F.col("_dec").cast("double"), 6).alias("total_value"),
            "n_events",
        )
    )


@stage(
    "ts_agg_kernel_tier1",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    )
    SELECT metric, ts - ts % 600 AS ts,
           round(avg(value), 6) AS avg_value,
           round(sum(value), 6) AS sum_value,
           arg_max(value, ts) AS last_value,
           max(value) AS max_value,
           min(value) AS min_value,
           count(value) AS n_points
    FROM t0 GROUP BY 1, 2
    """,
    "A0-A4 at tier-1 over the LWW grid: all five aggregation kernels "
    "(average/sum/last/max/min) computed 60s->600s in one pass — the "
    "same kernel matrix as ts_agg_kernel but through the propagation "
    "path (downsampling the ALIGNED tier, not raw points), where "
    "`last` keys on the slot timestamp alone because LWW already "
    "resolved arrival order",
)
def q_ts_agg_kernel_tier1(spark, sf_dir):
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return t0.groupBy(
        "metric", (F.col("ts") - F.col("ts") % 600).alias("ts")
    ).agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.expr("max_by(value, CASE WHEN value IS NOT NULL THEN ts END)")
        .alias("last_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.count("value").alias("n_points"),
    )


# --------------------------------------------------------------------------
# Batch 4: LSH band-bucket health, centroid accuracy by label,
# reactivated users, tax impact, props value bands, whisper size model.
# --------------------------------------------------------------------------

from kenshin_spark.queries import _DH  # noqa: E402


def _bands_sql() -> str:
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
    sh AS ({_SHINGLES}),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({bands})"""


@stage(
    "dedup_band_collision_stats",
    f"""
    WITH {_bands_sql()},
    buckets AS (
      SELECT band, band_key, count(*) AS bucket_size
      FROM bands GROUP BY 1, 2
    )
    SELECT CAST(band AS BIGINT) AS band,
           CAST(bucket_size AS BIGINT) AS bucket_size,
           count(*) AS n_buckets
    FROM buckets GROUP BY 1, 2
    """,
    "LSH index health: the band-bucket size distribution of the "
    "persisted MinHash index (minhash_band_index) — candidate volume "
    "is Sigma bucket_size^2, so this histogram IS the cost model the "
    "max_bucket guard and density-scaled banding act on; seeded-md5 "
    "signatures and band keys replay bit-for-bit",
)
def q_dedup_band_collision_stats(spark, sf_dir):
    from kenshin_spark.dedup.minhash import minhash_band_index

    idx = minhash_band_index(load_table(spark, sf_dir, "documents"))
    buckets = idx.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    return buckets.groupBy(
        F.col("band").cast("long").alias("band"),
        F.col("bucket_size").cast("long").alias("bucket_size"),
    ).agg(F.count(F.lit(1)).alias("n_buckets"))


@stage(
    "emb_centroid_accuracy_by_label",
    f"""
    SELECT label,
           count(*) AS n_vecs,
           sum(CASE WHEN correct THEN 1 ELSE 0 END) AS n_correct
    FROM ({_REG["emb_nearest_centroid"].oracle}) x
    GROUP BY 1
    """,
    "nearest-centroid classifier accuracy per label: how separable "
    "each class is under the cosine-to-centroid rule — the per-class "
    "confusion headline; derived from the registry's replayable "
    "centroid assignment",
)
def q_emb_centroid_accuracy_by_label(spark, sf_dir):
    x = _REG["emb_nearest_centroid"].fn(spark, sf_dir)
    return x.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("correct").cast("long")).alias("n_correct"),
    )


@stage(
    "q_events_reactivated_users",
    """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events
    ),
    g AS (
      SELECT user_id,
             day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
               AS gap
      FROM d
    )
    SELECT user_id,
           count(*) AS n_active_days,
           sum(CASE WHEN gap >= 3 THEN 1 ELSE 0 END) AS n_reactivations
    FROM g GROUP BY 1
    """,
    "reactivation counting: per user, how many times they returned "
    "after 3+ silent days (the win-back metric) alongside their "
    "active-day count; integer lag arithmetic over distinct days",
)
def q_q_events_reactivated_users(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long").alias(
            "day"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("gap", F.col("day") - F.lag("day").over(w))
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_active_days"),
        F.sum((F.col("gap") >= 3).cast("long")).alias("n_reactivations"),
    )


@stage(
    "q_lineitem_tax_impact",
    """
    SELECT l_returnflag,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE), 2) AS net_revenue,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 * (1 + CAST(l_tax AS DECIMAL(18,2))))
                 AS DOUBLE), 2) AS charged_revenue,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1
    """,
    "tax incidence per return flag: net vs tax-charged revenue — the "
    "q1 money pipeline extended one more DECIMAL product deep "
    "(price x (1-disc) x (1+tax) stays exact at scale 6), one "
    "aggregate",
)
def q_q_lineitem_tax_impact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    tax = F.lit(1) + F.col("l_tax").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(price * disc).cast("double"), 2).alias(
            "net_revenue"
        ),
        F.round(F.sum(price * disc * tax).cast("double"), 2).alias(
            "charged_revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@stage(
    "q_events_props_k_bands",
    """
    SELECT event_type,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 25
                AS BIGINT) AS k_band,
           count(*) AS n_events
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    """,
    "semi-structured property banding: the JSON k property bucketed "
    "by 25s per event type (schema-on-read straight into an integer "
    "histogram) — get_json_object/json_extract_string parity like "
    "q_events_json_props, one aggregate",
)
def q_q_events_props_k_bands(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.where(k.isNotNull())
        .groupBy(
            "event_type",
            F.floor(k / 25).cast("long").alias("k_band"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@stage(
    "whisper_export_size_model",
    f"""
    WITH pts AS ({PTS}),
    t0 AS (SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival)
             AS value
           FROM pts WHERE ts < {1704672000} GROUP BY 1, 2)
    SELECT DISTINCT metric,
           CAST(16 + 12 + 1440 * 12 AS BIGINT) AS n_bytes
    FROM t0
    """,
    "the .wsp container's size closed form against real bytes: one "
    "metric per preallocated file — metadata(16) + one "
    "archive-info(12) + 1440 ring points x 12 bytes, independent of "
    "how many points exist (the whisper model the graphite ecosystem "
    "assumes); the exporter's manifest must hit the arithmetic for "
    "every metric",
)
def q_whisper_export_size_model(spark, sf_dir):
    import os

    from kenshin_spark.queries_staged_r8_engine import (
        CUT as _CUT,
        _week_slots,
        _workdir,
    )
    from kenshin_spark.sources.whisper import export_whisper

    out_dir = os.path.join(_workdir(sf_dir, "wsp_size_model"), "wsp")
    week = _week_slots(spark, sf_dir)
    manifest = export_whisper(
        [week], [(60, 1440)], out_dir, agg_method="max", xff=0.5
    )
    return manifest.select("metric", "n_bytes")


# --------------------------------------------------------------------------
# Batch 5: weekend share, negative balances, schema-field audits,
# referential integrity, jitter offsets, range-vs-topk consistency,
# delay-vs-shift comparison, session-count bands.
# --------------------------------------------------------------------------


@stage(
    "q_events_weekend_share",
    """
    SELECT event_type,
           count(*) AS n_events,
           sum(CASE WHEN (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4)
                         % 7 IN (5, 6) THEN 1 ELSE 0 END) AS n_weekend,
           sum(CASE WHEN (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4)
                         % 7 IN (5, 6) THEN 1 ELSE 0 END) * 1000000
             // count(*) AS weekend_ppm
    FROM events GROUP BY 1
    """,
    "weekend traffic share per event type (Thursday-anchored epoch "
    "days; 5/6 = Sat/Sun) as floor-scaled ppm — the staffing-model "
    "split; integer arithmetic only",
)
def q_q_events_weekend_share(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dow = (
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long") + 4
    ) % 7
    wk = dow.isin(5, 6).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(wk).alias("n_weekend"),
        F.floor(F.sum(wk) * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("weekend_ppm"),
    )


@stage(
    "q_customer_negbal_by_nation",
    """
    SELECT n.n_name,
           count(*) AS n_customers,
           sum(CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END) AS n_negative,
           sum(CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END) * 1000000
             // count(*) AS negative_ppm
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
    "credit-risk screen: negative-balance customer share per nation "
    "(floor-scaled ppm), nation dim broadcast — the collections "
    "prioritization table",
)
def q_q_customer_negbal_by_nation(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    neg = (F.col("c_acctbal") < 0).cast("long")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(neg).alias("n_negative"),
            F.floor(F.sum(neg) * 1000000 / F.count(F.lit(1)))
            .cast("long")
            .alias("negative_ppm"),
        )
    )


@stage(
    "text_chars_field_audit",
    """
    SELECT count(*) AS n_docs,
           sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END)
             AS n_matching,
           sum(CASE WHEN n_chars <> length(text)
                     OR n_chars IS NULL OR text IS NULL
                    THEN 1 ELSE 0 END) AS n_mismatch
    FROM documents
    """,
    "derived-column audit: does the stored n_chars field actually "
    "equal length(text) — the staleness check every ingest pipeline "
    "runs on denormalized columns; one fused scan, integer counts",
)
def q_text_chars_field_audit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ok = (F.col("n_chars") == F.length("text")).cast("long")
    bad = (
        (F.col("n_chars") != F.length("text"))
        | F.col("n_chars").isNull()
        | F.col("text").isNull()
    ).cast("long")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ok).alias("n_matching"),
        F.sum(bad).alias("n_mismatch"),
    )


@stage(
    "q_ref_integrity_audit",
    """
    SELECT
      (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        AS dup_orderkeys,
      (SELECT count(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lines,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders
    """,
    "referential-integrity audit across the star: duplicate order "
    "keys, lineitems without an order, orders without a customer — "
    "the three anti-join counts a warehouse load gates on; key-only "
    "aggregates and left-anti joins",
)
def q_q_ref_integrity_audit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    dup = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "dup_orderkeys"
        )
    )
    orphan_l = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lines"))
    )
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    return dup.crossJoin(orphan_l).crossJoin(orphan_o)


@stage(
    "ts_jitter_offset_histogram",
    f"""
    WITH pts AS ({PTS})
    SELECT metric, CAST(ts % 60 // 15 AS BIGINT) AS offset_band,
           count(*) AS n_points
    FROM pts GROUP BY 1, 2
    """,
    "collection jitter profile: raw timestamps' within-slot offsets "
    "banded into 15 s quarters per metric — distinguishes cron-styled "
    "collectors (all in one band) from event-driven feeds (uniform); "
    "integer modulo arithmetic",
)
def q_ts_jitter_offset_histogram(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        "metric",
        F.floor((F.col("ts") % 60) / 15).cast("long").alias("offset_band"),
    ).agg(F.count(F.lit(1)).alias("n_points"))


@stage(
    "sim_range_topk_consistency",
    f"""
    WITH r AS (
      SELECT query_id, neighbor_id, cosine
      FROM ({_REG["sim_range_search"].oracle}) x
    ),
    t AS (
      SELECT query_id, neighbor_id, cosine
      FROM ({_REG["sim_topk_bruteforce"].oracle}) y
    )
    SELECT t.query_id,
           count(*) AS topk_in_range,
           sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS found_in_range
    FROM t LEFT JOIN r
      ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
    WHERE t.cosine >= 0.2
    GROUP BY 1
    """,
    "range-search/top-k consistency: every brute-force top-10 "
    "neighbor at cosine >= 0.2 must appear in the 0.2 range search "
    "(found == total per query) — the cross-operator contract that "
    "catches threshold drift between the two ANN entry points; both "
    "sides replay",
)
def q_sim_range_topk_consistency(spark, sf_dir):
    r = _REG["sim_range_search"].fn(spark, sf_dir).select(
        F.col("query_id").alias("rq"), F.col("neighbor_id").alias("rn")
    )
    t = _REG["sim_topk_bruteforce"].fn(spark, sf_dir).where(
        F.col("cosine") >= 0.2
    )
    j = t.join(
        r,
        (F.col("rq") == F.col("query_id"))
        & (F.col("rn") == F.col("neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("topk_in_range"),
        F.sum(F.col("rn").isNotNull().cast("long")).alias(
            "found_in_range"
        ),
    )


@stage(
    "render_delay_shift_compare",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    d AS (
      SELECT metric, ts,
             lag(value, 3) OVER (PARTITION BY metric ORDER BY ts)
               AS v_delay
      FROM t0
    ),
    s AS (
      SELECT a.metric, a.ts, b.value AS v_shift
      FROM t0 a LEFT JOIN t0 b
        ON b.metric = a.metric AND b.ts = a.ts - 180
    )
    SELECT d.metric,
           count(*) AS n_slots,
           sum(CASE WHEN d.v_delay IS NOT DISTINCT FROM s.v_shift
                    THEN 1 ELSE 0 END) AS n_agree
    FROM d JOIN s ON s.metric = d.metric AND s.ts = d.ts
    GROUP BY 1
    """,
    "delay(3) vs timeShift(180s) semantics, quantified: on a complete "
    "grid the row-based lag and the time-based self-join agree; every "
    "disagreement is a GAP in the series (lag skips over holes, the "
    "time join honors them) — the subtle render-API distinction "
    "graphite users trip on, counted per metric",
)
def q_render_delay_shift_compare(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.functions.render import delay, time_shift
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    d = delay(t0, 3).withColumnRenamed("value", "v_delay")
    shifted = time_shift(t0, 180).select(
        "metric", "ts", F.col("value").alias("v_shift")
    )
    # keep the ORIGINAL slot set: shifted slots that fall in a gap
    # contribute NULL, exactly like the oracle's left join
    s = t0.select("metric", "ts").join(shifted, ["metric", "ts"], "left")
    j = d.join(s, ["metric", "ts"])
    return j.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum(
            F.col("v_delay").eqNullSafe(F.col("v_shift")).cast("long")
        ).alias("n_agree"),
    )


@stage(
    "q_user_session_count_bands",
    """
    WITH s AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    u AS (SELECT user_id, sum(new_s) AS n_sessions FROM s GROUP BY 1)
    SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
           count(*) AS n_users
    FROM u GROUP BY 1
    """,
    "sessions-per-user histogram: the 30-minute-gap session count per "
    "user folded into a distribution — the engagement-frequency "
    "companion to the session-length histogram; integer window "
    "arithmetic",
)
def q_q_user_session_count_bands(spark, sf_dir):
    from kenshin_spark.streaming.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, gap="30 minutes")
    u = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return u.groupBy(
        F.col("n_sessions").cast("long").alias("n_sessions")
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# Batch 6: priority value boxes, uptime streaks, qty/price bands,
# exact-dedup survivor stats, error-after-purchase, dim audit, KMV k
# sensitivity, first/last token match.
# --------------------------------------------------------------------------


@stage(
    "q_order_value_by_priority_box",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75
    FROM orders GROUP BY 1
    """,
    "order value box plot per priority: exact interpolated quartiles "
    "— does URGENT money look different; the same percentile "
    "discipline as the events quartile row",
)
def q_q_order_value_by_priority_box(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
    )


@stage(
    "ts_longest_uptime_streak",
    f"""
    WITH pts AS ({PTS}),
    h AS (SELECT DISTINCT metric, ts // 3600 AS hr FROM pts),
    g AS (
      SELECT metric, hr,
             hr - row_number() OVER (PARTITION BY metric ORDER BY hr)
               AS grp
      FROM h
    ),
    runs AS (
      SELECT metric, count(*) AS streak_h FROM g GROUP BY metric, grp
    )
    SELECT metric,
           CAST(max(streak_h) AS BIGINT) AS longest_streak_h,
           count(*) AS n_streaks
    FROM runs GROUP BY 1
    """,
    "longest consecutive-hour uptime streak per metric: the classic "
    "gaps-and-islands (hour index minus row_number groups consecutive "
    "hours) — the reliability headline an SLO narrative quotes; "
    "integer arithmetic",
)
def q_ts_longest_uptime_streak(spark, sf_dir):
    from pyspark.sql import Window

    pts = _points(spark, sf_dir)
    h = pts.select(
        "metric", (F.col("ts") / 3600).cast("long").alias("hr")
    ).distinct()
    w = Window.partitionBy("metric").orderBy("hr")
    g = h.withColumn("grp", F.col("hr") - F.row_number().over(w))
    runs = g.groupBy("metric", "grp").agg(
        F.count(F.lit(1)).alias("streak_h")
    )
    return runs.groupBy("metric").agg(
        F.max("streak_h").cast("long").alias("longest_streak_h"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@stage(
    "q_lineitem_qty_price_bands",
    """
    SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_band,
           CAST(floor(l_extendedprice / 10000) AS BIGINT) AS price_band,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1, 2
    """,
    "quantity x price 2-D histogram: floor-banded axes over the fact "
    "table — the density grid a pricing analysis heatmaps; identical "
    "floor arithmetic on both engines",
)
def q_q_lineitem_qty_price_bands(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_band"),
        F.floor(F.col("l_extendedprice") / 10000)
        .cast("long")
        .alias("price_band"),
    ).agg(F.count(F.lit(1)).alias("n_lines"))


@stage(
    "dedup_exact_survivor_stats",
    """
    WITH g AS (
      SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
             min(doc_id) AS survivor_id,
             count(*) AS n_dups
      FROM documents GROUP BY 1
    )
    SELECT count(*) AS n_groups,
           sum(n_dups) AS n_docs,
           sum(n_dups - 1) AS n_removed,
           CAST(max(n_dups) AS BIGINT) AS largest_group
    FROM g
    """,
    "exact-dedup ledger: fingerprint groups (normalized-md5, "
    "smallest-id survivor — exact_dedup's output), with the removal "
    "ledger a curation report publishes: groups, docs, removed, "
    "largest clone family; integer counts over the engine's own "
    "grouping",
)
def q_dedup_exact_survivor_stats(spark, sf_dir):
    from kenshin_spark.dedup.exact import exact_dedup

    g = exact_dedup(load_table(spark, sf_dir, "documents"))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_dups").alias("n_docs"),
        F.sum(F.col("n_dups") - 1).alias("n_removed"),
        F.max("n_dups").cast("long").alias("largest_group"),
    )


@stage(
    "q_events_error_after_purchase",
    """
    WITH p AS (
      SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, ts AS e_ts FROM events WHERE event_type = 'error'
    )
    SELECT p.user_id,
           count(*) AS n_purchases,
           sum(CASE WHEN x.hit THEN 1 ELSE 0 END) AS n_with_error_5m
    FROM p LEFT JOIN LATERAL (
      SELECT count(*) > 0 AS hit FROM e
      WHERE e.user_id = p.user_id
        AND e.e_ts > p.p_ts AND e.e_ts <= p.p_ts + INTERVAL 5 MINUTE
    ) x ON TRUE
    GROUP BY 1
    """,
    "post-purchase error rate: purchases followed by an error from "
    "the same user within 5 minutes — the checkout-reliability "
    "signal; a bounded interval semi-join per purchase, integer "
    "counts",
)
def q_q_events_error_after_purchase(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"),
        F.monotonically_increasing_id().alias("_pid"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("eu"), F.col("ts").alias("e_ts")
    )
    j = p.join(
        e,
        (F.col("eu") == F.col("user_id"))
        & (F.col("e_ts") > F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 5 MINUTE")),
        "left",
    )
    per_p = j.groupBy("user_id", "_pid").agg(
        (F.count("e_ts") > 0).alias("hit")
    )
    return per_p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("hit").cast("long")).alias("n_with_error_5m"),
    )


def _kmv_global_sql(k: int) -> str:
    h = "CAST(('0x' || substr(md5('ksp|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(floor(CASE WHEN count(*) < {k}
                 THEN CAST(count(*) AS DOUBLE)
                 ELSE {k - 1}.0 * 1152921504606846976.0 / max(h) END)
           AS BIGINT) AS approx_users
    FROM (SELECT DISTINCT {h} AS h FROM events ORDER BY h LIMIT {k}) s
    """


@stage(
    "sketch_kmv_k_sensitivity",
    " UNION ALL ".join(_kmv_global_sql(k) for k in (64, 128, 256)),
    "KMV accuracy-vs-state tradeoff: the distinct-user estimate at "
    "k = 64/128/256 side by side (relative error ~ 1/sqrt(k), state "
    "= k rows) — the sizing table that picks the sketch budget; each "
    "estimate replays bit-for-bit",
)
def q_sketch_kmv_k_sensitivity(spark, sf_dir):
    from kenshin_spark.functions.sketches import kmv_distinct

    ev = load_table(spark, sf_dir, "events")
    out = None
    for k in (64, 128, 256):
        e = kmv_distinct(ev, "user_id", k=k).select(
            F.lit(k).cast("long").alias("k"),
            F.floor("approx_distinct").cast("long").alias("approx_users"),
        )
        out = e if out is None else out.unionByName(e)
    return out


@stage(
    "text_first_last_token",
    r"""
    WITH t AS (
      SELECT lang,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           sum(CASE WHEN toks[1] = toks[len(toks)] THEN 1 ELSE 0 END)
             AS n_ring_docs
    FROM t GROUP BY 1
    """,
    "first-token == last-token incidence per language (the 'ring "
    "structure' text statistic that flags templated/generated "
    "content); array indexing and string equality only",
)
def q_text_first_last_token(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    t = docs.select(
        "lang",
        (F.element_at(toks, 1) == F.element_at(toks, -1))
        .cast("long")
        .alias("ring"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ring").alias("n_ring_docs"),
    )


# --------------------------------------------------------------------------
# Final bank rows: hour-of-day counts, priority breadth, size mode,
# NULL-value share, quarter coverage, customer name audit.
# --------------------------------------------------------------------------


@stage(
    "ts_hour_of_day_counts",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           CAST(ts // 3600 % 24 AS BIGINT) AS hour,
           count(*) AS n_points
    FROM pts GROUP BY 1, 2
    """,
    "collection cadence by hour of day per metric — the raw-count "
    "companion to the seasonal average profile, exposing collector "
    "outages that averaging hides; integer epoch arithmetic",
)
def q_ts_hour_of_day_counts(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        "metric",
        ((F.col("ts") / 3600).cast("long") % 24).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_points"))


@stage(
    "q_customer_priority_breadth",
    """
    WITH b AS (
      SELECT o_custkey,
             count(DISTINCT o_orderpriority) AS n_priorities
      FROM orders GROUP BY 1
    )
    SELECT CAST(n_priorities AS BIGINT) AS n_priorities,
           count(*) AS n_customers
    FROM b GROUP BY 1
    """,
    "priority breadth histogram: how many distinct order priorities "
    "each customer has used — behavioural diversity in one distinct "
    "aggregate",
)
def q_q_customer_priority_breadth(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_priorities")
    )
    return b.groupBy(
        F.col("n_priorities").cast("long").alias("n_priorities")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@stage(
    "mm_lossy_webp_rgba_sums",
    """
    SELECT * FROM (VALUES
      ('blobs_64x48_q75', CAST(64 AS BIGINT), CAST(48 AS BIGINT),
       CAST(401053 AS BIGINT), CAST(411591 AS BIGINT),
       CAST(386337 AS BIGINT), CAST(783360 AS BIGINT)),
      ('grad_16x16_q95', CAST(16 AS BIGINT), CAST(16 AS BIGINT),
       CAST(9624 AS BIGINT), CAST(9624 AS BIGINT),
       CAST(9624 AS BIGINT), CAST(65280 AS BIGINT)),
      ('noise_alpha_37x53_q60', CAST(37 AS BIGINT), CAST(53 AS BIGINT),
       CAST(253621 AS BIGINT), CAST(249392 AS BIGINT),
       CAST(250901 AS BIGINT), CAST(207866 AS BIGINT))
    ) AS t(fixture, width, height, r_sum, g_sum, b_sum, a_sum)
    """,
    "lossy-VP8 WebP decoded NATIVELY (r11 codec gap closure — the "
    "LAST format that routed to the PIL seam): three real-encoder "
    "fixtures (libwebp-authored: opaque photo-like, q95 gradient, and "
    "an ALPH-alpha noise image) ship embedded; the engine runs the "
    "full RFC 6386 intra decode + fancy 4:2:0 upsample + fixed-point "
    "BT.601 conversion + alpha-chunk decode on executors and reports "
    "per-channel pixel sums; the oracle pins the values produced by "
    "LIBWEBP ITSELF at row-authoring time — a golden cross-engine "
    "equality, not a replay (kenshin_spark/multimodal/vp8.py, "
    "webp.py:decode_webp; bit-exactness suite in tests/test_vp8.py)",
)
def q_mm_lossy_webp_rgba_sums(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.bank_common import LOSSY_WEBP_FIXTURES

    def kern(batches):
        import base64

        import numpy as np

        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for name in pdf["fixture"]:
                arr = webp.decode_webp(
                    base64.b64decode(LOSSY_WEBP_FIXTURES[name])
                ).astype(np.int64)
                rows.append(
                    (
                        name, arr.shape[1], arr.shape[0],
                        int(arr[:, :, 0].sum()), int(arr[:, :, 1].sum()),
                        int(arr[:, :, 2].sum()), int(arr[:, :, 3].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "fixture", "width", "height",
                    "r_sum", "g_sum", "b_sum", "a_sum",
                ],
            )

    names = spark.createDataFrame(
        [(n,) for n in sorted(LOSSY_WEBP_FIXTURES)], "fixture string"
    ).repartition(3)
    return names.mapInPandas(
        kern,
        "fixture string, width long, height long, "
        "r_sum long, g_sum long, b_sum long, a_sum long",
    ).orderBy("fixture")


@stage(
    "q_events_value_null_share",
    """
    SELECT event_type,
           count(*) AS n_events,
           sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
           sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 1000000
             // count(*) AS null_ppm
    FROM events GROUP BY 1
    """,
    "NULL-value incidence per event type as floor-scaled ppm — the "
    "instrumentation-health number that distinguishes 'metric "
    "carries no payload' from 'payload pipeline is broken'",
)
def q_q_events_value_null_share(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    isnull = F.col("value").isNull().cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(isnull).alias("n_null"),
        F.floor(F.sum(isnull) * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("null_ppm"),
    )


@stage(
    "store_version_travel_read",
    None,  # placeholder — real oracle set below (needs the r8 fragment)
)
def q_store_version_travel_read(spark, sf_dir):
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
            _workdir(sf_dir, "store_version_travel_read"), "store"
        ),
        mode="mor",
        commit_protocol="manifest",
    )
    slots = _week_slots(spark, sf_dir).localCheckpoint(eager=True)
    st.upsert(0, slots.where(F.col("ts") % 120 == 0))
    v1 = st.commit.epoch()  # pin: the even-minute snapshot
    st.upsert(0, slots.where(F.col("ts") % 120 == 60))
    st.compact(0, days=st._live_days(0))
    # the op-labelled ledger must lead with the fold and end at the
    # pinned snapshot's commit (DESCRIBE HISTORY semantics)
    ops = [r["op"] for r in st.history()]
    assert ops[0] == "compact" and ops[-1] == "upsert", ops
    # the version-pinned read plans from the file list committed at
    # v1: it must see ONLY the even-minute batch, reaching back across
    # both the later append and the log fold that retired v1's files
    return st.read(0, version=v1)


def _set_travel_oracle():
    from kenshin_spark.queries_staged_r8_engine import _W

    spec = STAGED_R12["store_version_travel_read"]
    STAGED_R12["store_version_travel_read"] = QuerySpec(
        fn=spec.fn,
        oracle=(
            f"WITH {_W} SELECT metric, ts, value FROM t0 "
            f"WHERE ts % 120 = 0"
        ),
        doc=(
            "manifest-log time travel as a driver row: two stamped "
            "upserts then a compaction that retires the first batch's "
            "files; a read pinned at the first commit's seq "
            "(versionAsOf) plans from THAT committed file list and "
            "must reproduce exactly the even-minute LWW grid — "
            "history() op labels asserted in-row (kenshin_spark/"
            "commit.py history/live_files(seq), store.py read(version))"
        ),
    )


_set_travel_oracle()


@stage(
    "q_customer_name_key_audit",
    """
    SELECT count(*) AS n_customers,
           sum(CASE WHEN c_name = 'Customer#' ||
                         lpad(CAST(c_custkey AS VARCHAR), 9, '0')
                    THEN 1 ELSE 0 END) AS n_canonical,
           sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS n_null_names
    FROM customer
    """,
    "name-key consistency audit: does c_name follow the canonical "
    "'Customer#<zero-padded key>' form — the referential naming "
    "invariant TPC-H data generators promise; string building and "
    "equality only",
)
def q_q_customer_name_key_audit(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    canonical = F.concat(
        F.lit("Customer#"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
    )
    return c.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum((F.col("c_name") == canonical).cast("long")).alias(
            "n_canonical"
        ),
        F.sum(F.col("c_name").isNull().cast("long")).alias("n_null_names"),
    )

@stage(
    "mm_paletted_png_pixel_sum",
    """
    WITH ij AS (
      SELECT a.i, b.j
      FROM (SELECT unnest(generate_series(0, 15)) AS i) a
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) b
    ),
    px AS (
      SELECT d.doc_id,
             (d.doc_id + 9 * ij.i + 7 * ij.j) % 48 AS c
      FROM (SELECT doc_id FROM documents WHERE doc_id % 50 = 0) d
      CROSS JOIN ij
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(16 AS BIGINT) AS width,
           CAST(3 AS BIGINT) AS n_channels,
           CAST(sum((3 * c) % 256 + (5 * c) % 256 + (7 * c) % 256)
                AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id
    """,
    "paletted PNG (color type 3) decoded NATIVELY to pixel values "
    "(r11 codec gap closure): per doc a 16x16 image over a 48-color "
    "deterministic palette (color c = ((3c)%256,(5c)%256,(7c)%256) at "
    "cell index (doc_id+9i+7j)%48) is engine-encoded by "
    "encode_png_paletted (PLTE + filter-0 index rows), decoded back "
    "through decode_png's PLTE expansion, and the RGB channels summed "
    "— the oracle replays palette and indexing with integer "
    "arithmetic alone; n_channels pins the png_info channel contract "
    "(multimodal/codecs.py; javax.imageio bit-exactness pinned in "
    "tests/test_codec_xcheck.py)",
)
def q_mm_paletted_png_pixel_sum(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.bank_common import _doc_ids

    def kern(batches):
        import numpy as np

        from kenshin_spark.multimodal import codecs

        ks = np.arange(48, dtype=np.int64)
        palette = np.stack(
            [(3 * ks) % 256, (5 * ks) % 256, (7 * ks) % 256], axis=1
        ).astype(np.uint8)
        ii = np.arange(16)[:, None]
        jj = np.arange(16)[None, :]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                idx = (did + 9 * ii + 7 * jj) % 48
                payload = codecs.encode_png_paletted(palette[idx])
                w, _h, nch = codecs.png_info(payload)
                dec = codecs.decode_png(payload)
                rows.append(
                    (did, w, nch, int(dec[:, :, :3].astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "n_channels", "pixel_sum"],
            )

    return _doc_ids(spark, sf_dir).mapInPandas(
        kern,
        "doc_id long, width long, n_channels long, pixel_sum long",
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
    "sample_weighted_rate_audit": ("total_weight",),
    "emb_ivf_cell_balance": ("largest_share_ppm",),
    "hs_export_size_model": ("n_bytes",),
    "pipeline_quality_token_budget": ("tokens_total", "tokens_kept", "kept_ppm",),
    "text_shingle_dup_mass": ("n_shared", "shared_ppm",),
    "q_orders_status_share_monthly": ("f_share_ppm", "o_share_ppm",),
    "ts_spike_detection_mad": ("n_spikes",),
    "emb_centroid_accuracy_by_label": ("n_correct",),
    "q_events_reactivated_users": ("n_reactivations",),
    "q_events_weekend_share": ("n_weekend", "weekend_ppm",),
    "q_customer_negbal_by_nation": ("n_negative", "negative_ppm",),
    "text_chars_field_audit": ("n_matching", "n_mismatch",),
    "sim_range_topk_consistency": ("found_in_range",),
    "render_delay_shift_compare": ("n_agree",),
    "dedup_exact_survivor_stats": ("n_docs", "n_removed",),
    "q_events_error_after_purchase": ("n_with_error_5m",),
    "text_first_last_token": ("n_ring_docs",),
    "q_events_value_null_share": ("n_null", "null_ppm",),
    "q_customer_name_key_audit": ("n_canonical", "n_null_names",),
}
apply_bigint_casts(STAGED_R12, _BIGINT_CASTS)
