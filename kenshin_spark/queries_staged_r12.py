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
