"""Seventh staged bank — ROUND 11: the KMV set-algebra family
(theta-sketch-style union/intersection/Jaccard over replayable
bottom-k hash states), cross-method dedup agreement, quantized-ANN
recall, Holt aberration counts, anomaly band counts, and the
nearest-neighbor resize loop verified to the pixel sum.

Same staging mechanism and gate (``tests/test_queries_staged_r11.py``)
as the earlier banks. Promote with
``python tools/promote_staged.py queries_staged_r11`` once round 10's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QUERIES as _REG
from kenshin_spark.queries import PTS, QuerySpec, _points

STAGED_R11: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R11[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


_H60 = (
    "CAST(('0x' || substr(md5('ksp|' || CAST({x} AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)

_KMV_EST = (
    "CASE WHEN {n} < {k} THEN CAST({n} AS DOUBLE) "
    "ELSE {km1}.0 * 1152921504606846976.0 / {hk} END"
)


def _kmv_pair_sql(a_where: str, b_where: str, k: int = 256) -> str:
    """The full two-set KMV algebra replay over events.user_id."""
    h = _H60.format(x="user_id")
    est = _KMV_EST.format(n="n", k=k, km1=k - 1, hk="hk")
    return f"""
    sa AS (SELECT DISTINCT {h} AS h FROM events WHERE {a_where}
           ORDER BY h LIMIT {k}),
    sb AS (SELECT DISTINCT {h} AS h FROM events WHERE {b_where}
           ORDER BY h LIMIT {k}),
    m AS (SELECT DISTINCT h FROM
            (SELECT h FROM sa UNION ALL SELECT h FROM sb)
          ORDER BY h LIMIT {k}),
    fl AS (
      SELECT m.h,
             (m.h IN (SELECT h FROM sa)
              AND m.h IN (SELECT h FROM sb)) AS bth
      FROM m
    ),
    agg AS (
      SELECT count(*) AS n, max(h) AS hk,
             sum(CASE WHEN bth THEN 1 ELSE 0 END) AS nb
      FROM fl
    ),
    est AS (
      SELECT CAST(floor({est}) AS BIGINT) AS union_est,
             CAST(floor({est} * nb / n) AS BIGINT) AS inter_est,
             CAST(floor(nb * 1000000 / n) AS BIGINT) AS jaccard_ppm,
             n AS n_sample, nb AS n_both
      FROM agg
    )"""


@stage(
    "sketch_kmv_overlap_types",
    f"""
    WITH {_kmv_pair_sql("event_type = 'click'", "event_type = 'view'")}
    SELECT union_est, inter_est, jaccard_ppm, n_sample, n_both FROM est
    """,
    "KMV set algebra over two audiences: distinct clickers vs viewers "
    "as bottom-256 hash states (kmv_bottom_set), their union state M "
    "a uniform hash-sample of the union, so the fraction of M present "
    "in BOTH states estimates Jaccard and intersection = jaccard x "
    "union_est (the public Theta-sketch construction) — audience "
    "overlap WITHOUT a distinct-join over raw events; floor-scaled "
    "integers, replayed bit-for-bit",
)
def q_sketch_kmv_overlap_types(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        kmv_bottom_set,
        kmv_set_estimates,
    )

    ev = load_table(spark, sf_dir, "events")
    a = kmv_bottom_set(
        ev.where(F.col("event_type") == "click"), "user_id", 256
    )
    b = kmv_bottom_set(
        ev.where(F.col("event_type") == "view"), "user_id", 256
    )
    return kmv_set_estimates(a, b, 256)


@stage(
    "sketch_kmv_overlap_days",
    f"""
    WITH {_kmv_pair_sql(
        "CAST(floor(epoch(ts)) AS BIGINT) // 86400 ="
        " (SELECT min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)"
        "  FROM events)",
        "CAST(floor(epoch(ts)) AS BIGINT) // 86400 ="
        " (SELECT min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 1"
        "  FROM events)")}
    SELECT union_est, inter_est, jaccard_ppm, n_sample, n_both FROM est
    """,
    "day-over-day user retention from persisted KMV states: day-1 vs "
    "day-2 distinct-user sketches intersected by the same theta "
    "construction — the retention overlap a growth dashboard reads "
    "from two 256-row states instead of a distinct-join over both "
    "days' raw events; replayed bit-for-bit",
)
def q_sketch_kmv_overlap_days(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        kmv_bottom_set,
        kmv_set_estimates,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", (F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    )
    d0 = ev.agg(F.min("day")).collect()[0][0]
    a = kmv_bottom_set(ev.where(F.col("day") == d0), "user_id", 256)
    b = kmv_bottom_set(ev.where(F.col("day") == d0 + 1), "user_id", 256)
    return kmv_set_estimates(a, b, 256)


@stage(
    "sketch_kmv_union_rollup",
    f"""
    WITH g AS (
      SELECT DISTINCT {_H60.format(x="user_id")} AS h FROM events
      ORDER BY h LIMIT 256
    ),
    agg AS (SELECT count(*) AS n, max(h) AS hk FROM g)
    SELECT CAST(floor({_KMV_EST.format(n="n", k=256, km1=255, hk="hk")})
                AS BIGINT) AS merged_est,
           CAST(floor({_KMV_EST.format(n="n", k=256, km1=255, hk="hk")})
                AS BIGINT) AS global_est
    FROM agg
    """,
    "KMV union EXACTNESS (not just approximation): the union of the "
    "five per-event-type bottom-256 user states re-bottomed to 256 is "
    "IDENTICAL to the global bottom-256 (bottom-k of a union == "
    "bottom-k of per-part bottom-ks), so the merged estimate equals "
    "the one-pass estimate to the bit — the identity that makes "
    "per-stream sketch state composable at any fan-in; the oracle "
    "computes the global form for both columns",
)
def q_sketch_kmv_union_rollup(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        kmv_bottom_set,
        kmv_union,
    )

    ev = load_table(spark, sf_dir, "events")
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    parts = [
        kmv_bottom_set(
            ev.where(F.col("event_type") == t), "user_id", 256
        )
        for t in sorted(types)
    ]
    merged = kmv_union(parts, 256)
    glob = kmv_bottom_set(ev, "user_id", 256)

    def est(s, name):
        agg = s.agg(
            F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk")
        )
        e = F.when(F.col("_n") < 256, F.col("_n").cast("double")).otherwise(
            F.lit(255.0) * F.lit(float(2**60)) / F.col("_hk")
        )
        return agg.select(F.floor(e).cast("long").alias(name))

    return est(merged, "merged_est").crossJoin(est(glob, "global_est"))


@stage(
    "dedup_method_agreement",
    f"""
    WITH mh AS (
      SELECT doc_a, doc_b FROM ({_REG["dedup_minhash_lsh"].oracle}) x
    ),
    ng AS (
      SELECT doc_a, doc_b FROM ({_REG["dedup_ngram_jaccard"].oracle}) y
    )
    SELECT
      CAST((SELECT count(*) FROM mh) AS BIGINT) AS n_minhash,
      CAST((SELECT count(*) FROM ng) AS BIGINT) AS n_ngram,
      CAST((SELECT count(*) FROM mh JOIN ng
            ON ng.doc_a = mh.doc_a AND ng.doc_b = mh.doc_b) AS BIGINT)
        AS n_both
    """,
    "cross-method dedup agreement: the MinHash-LSH near-dup pair set "
    "against the exact n-gram Jaccard pair set — pair counts and the "
    "overlap, the validation number that justifies shipping the "
    "banded approximation at 100 TB; both sides are the registry's "
    "own replayable paths so the agreement itself hash-checks",
)
def q_dedup_method_agreement(spark, sf_dir):
    # one FULL OUTER join on the pair key computes all three counts in a
    # single linear plan: the previous three-aggregate crossJoin embedded
    # the minhash subtree twice and the ngram subtree twice (50 parquet
    # scans / 150 exchanges in the physical plan — each detector pipeline
    # executed twice end-to-end). Both pair sets are key-unique (DISTINCT
    # candidates scored once per pair), so the outer join preserves row
    # multiplicity exactly: count(mh key) = |mh|, count(ng key) = |ng|,
    # count(matched) = |mh ∩ ng| — identical values, one evaluation per
    # detector (guide §2.4: remove duplicated subtrees before tuning).
    mh = _REG["dedup_minhash_lsh"].fn(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    ng = _REG["dedup_ngram_jaccard"].fn(spark, sf_dir).select(
        F.col("doc_a").alias("na"), F.col("doc_b").alias("nb")
    )
    j = mh.join(
        ng,
        (F.col("na") == F.col("doc_a")) & (F.col("nb") == F.col("doc_b")),
        "full_outer",
    )
    return j.agg(
        F.count("doc_a").alias("n_minhash"),
        F.count("na").alias("n_ngram"),
        F.count(
            F.when(F.col("doc_a").isNotNull() & F.col("na").isNotNull(), 1)
        ).alias("n_both"),
    )


@stage(
    "sim_quantized_recall_audit",
    f"""
    SELECT ex.query_id,
           CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(ap.neighbor_id) * 10 AS BIGINT) AS recall_pct
    FROM (SELECT query_id, neighbor_id FROM
            ({_REG["sim_topk_bruteforce"].oracle}) f) ex
    LEFT JOIN (SELECT query_id, neighbor_id FROM
            ({_REG["sim_topk_quantized"].oracle}) p) ap
      ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
    GROUP BY 1
    """,
    "int8-quantization recall audit: recall@10 of the quantized "
    "dot-product path against the exact cosine top-10 per query — "
    "completes the per-method audit family (LSH r9, IVF r10, "
    "quantized here) so every ANN variant ships with its measured "
    "recall; derived from the registry's own replayable paths",
)
def q_sim_quantized_recall_audit(spark, sf_dir):
    ex = _REG["sim_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ap = _REG["sim_topk_quantized"].fn(spark, sf_dir).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    joined = ex.join(
        ap,
        (F.col("aq") == F.col("query_id"))
        & (F.col("an") == F.col("neighbor_id")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("an").alias("n_hits"),
        (F.count("an") * 10).alias("recall_pct"),
    )


@stage(
    "render_holt_aberration_counts",
    f"""
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n_slots,
           CAST(sum(aberrant) AS BIGINT) AS n_aberrant
    FROM ({_REG["render_holt_forecast"].oracle}) h
    GROUP BY 1
    """,
    "holtWintersAberration rolled up: per metric, how many tier0 "
    "slots fall outside the Holt-linear confidence band — the alert "
    "volume a threshold-tuning pass reads; derived from the "
    "registry's replayable double-exponential recursion so the counts "
    "hash-check",
)
def q_render_holt_aberration_counts(spark, sf_dir):
    out = _REG["render_holt_forecast"].fn(spark, sf_dir)
    return out.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum(F.col("aberrant").cast("long")).alias("n_aberrant"),
    )


@stage(
    "ts_anomaly_band_counts",
    f"""
    SELECT metric,
           CAST(CAST(ts AS BIGINT) // 86400 AS BIGINT) AS day,
           CAST(sum(CASE WHEN abs(zscore) > 2.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           count(*) AS n_slots
    FROM ({_REG["ts_anomaly_zscore"].oracle}) z
    GROUP BY 1, 2
    """,
    "z-score anomaly volume per metric-day: |z| > 2 slot counts from "
    "the registry's rolling two-sum z-score (the float-discipline "
    "recursion already proven to replay) — the paging-rate forecast "
    "an alert-tuning pass runs before enabling a monitor",
)
def q_ts_anomaly_band_counts(spark, sf_dir):
    z = _REG["ts_anomaly_zscore"].fn(spark, sf_dir)
    return z.groupBy(
        "metric", (F.col("ts") / 86400).cast("long").alias("day")
    ).agg(
        F.sum((F.abs(F.col("zscore")) > 2.0).cast("long")).alias(
            "n_outliers"
        ),
        F.count(F.lit(1)).alias("n_slots"),
    )


@stage(
    "mm_resize_nearest_sum",
    """
    SELECT d.doc_id, d.width // 2 AS out_w, d.height // 2 AS out_h,
           sum((d.doc_id + 31 * ((y.v * d.height) // (d.height // 2))
                + 17 * ((x.v * d.width) // (d.width // 2))) % 256)
             AS pixel_sum
    FROM (
      SELECT doc_id, 8 + doc_id % 24 AS width,
             8 + (doc_id * 7) % 16 AS height
      FROM documents WHERE doc_id % 50 = 0
    ) d
    CROSS JOIN generate_series(0, 14) x(v)
    CROSS JOIN generate_series(0, 10) y(v)
    WHERE x.v < d.width // 2 AND y.v < d.height // 2
    GROUP BY 1, 2, 3
    """,
    "the nearest-neighbor resize kernel verified to the pixel: "
    "gradient images downscaled to half dims by resize_nearest (pure "
    "integer index arithmetic — src = (dst * src_len) // dst_len, no "
    "float interpolation), and the resampled pixel sum must equal the "
    "closed-form the oracle computes from the same index map",
)
def q_mm_resize_nearest_sum(spark, sf_dir):
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
                w, h = 8 + did % 24, 8 + (did * 7) % 16
                y = np.arange(h)[:, None]
                x = np.arange(w)[None, :]
                arr = ((did + 31 * y + 17 * x) % 256).astype(np.uint8)
                small = codecs.resize_nearest(arr, w // 2, h // 2)
                rows.append(
                    (did, small.shape[1], small.shape[0], int(small.sum()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "pixel_sum"]
            )

    return docs.mapInPandas(
        kern, "doc_id long, out_w long, out_h long, pixel_sum long"
    )


# --------------------------------------------------------------------------
# Batch 2: store fetch-splice + point-patch invariants, vocab coverage
# curve, length Gini, cohort retention triangle, daily integral,
# histogram p50 drift, bottom-k nesting.
# --------------------------------------------------------------------------

from kenshin_spark.queries_staged_r8_engine import (  # noqa: E402
    CUT,
    _W,
    _grid_sql,
    _store,
    _week_slots,
)


@stage(
    "store_fetch_splice_consistency",
    f"""
    WITH {_W}, now_t AS (SELECT {CUT} AS now),
    tier AS (SELECT metric, ts, value FROM t0),
    {_grid_sql("now - 172800", "now", 60)}
    """,
    "fetch splice invariance: two adjacent one-day fetches "
    "(now-2d..now-1d and now-1d..now) concatenated must equal the one "
    "two-day fetch — the grid roundup arithmetic leaves no overlap "
    "and no gap at the seam (the pagination contract a dashboard's "
    "panel-by-panel loading relies on); the oracle computes the "
    "single-request form",
)
def q_store_fetch_splice_consistency(spark, sf_dir):
    from kenshin_spark.queries_staged_r8_engine import _METRICS5

    st = _store(spark, sf_dir, "store_fetch_splice")
    st.upsert(0, _week_slots(spark, sf_dir))
    a = st.fetch(_METRICS5, CUT - 172800, CUT - 86400, CUT)
    b = st.fetch(_METRICS5, CUT - 86400, CUT, CUT)
    return a.unionByName(b)


@stage(
    "store_upsert_point_patch",
    f"""
    WITH {_W}
    SELECT metric, ts,
           CASE WHEN metric = 'click' AND ts = {CUT - 3600}
                THEN 999.5 ELSE value END AS value
    FROM t0
    UNION ALL
    SELECT 'click', {CUT - 3600}, 999.5
    WHERE NOT EXISTS (
      SELECT 1 FROM t0 WHERE metric = 'click' AND ts = {CUT - 3600}
    )
    """,
    "single-point correction: after the week's load, one (metric, "
    "slot) is patched by a one-row upsert — the GDPR-style/bad-sensor "
    "fix — and the read must show the patch whether the slot existed "
    "before or not, with every other slot untouched (the "
    "partition-bounded rewrite touches exactly one day); the oracle "
    "models both the overwrite and the insert case",
)
def q_store_upsert_point_patch(spark, sf_dir):
    st = _store(spark, sf_dir, "store_point_patch")
    st.upsert(0, _week_slots(spark, sf_dir))
    patch = st.spark.createDataFrame(
        [("click", CUT - 3600, 999.5)], "metric string, ts long, value double"
    )
    st.upsert(0, patch)
    return st.read(0)


@stage(
    "text_vocab_coverage_curve",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY 1),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk FROM freq
    ),
    tot AS (SELECT sum(c) AS total, count(*) AS n_vocab FROM freq)
    SELECT t.n_top,
           CAST((SELECT coalesce(sum(c), 0) FROM ranked
                 WHERE rnk <= t.n_top) * 1000000 // tot.total
                AS BIGINT) AS covered_ppm,
           tot.total AS n_occurrences, tot.n_vocab
    FROM (VALUES (100), (1000)) t(n_top), tot
    """,
    "tokenizer vocabulary sizing curve: what fraction of all token "
    "occurrences the top-100 / top-1000 vocabulary covers (ranked by "
    "count with a token tie-break so both engines pick identical "
    "cutoffs) — the number that decides BPE vocab size; floor-scaled "
    "ppm, integers throughout",
)
def q_text_vocab_coverage_curve(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("tok"))),
    )
    tot = freq.agg(
        F.sum("c").alias("n_occurrences"), F.count(F.lit(1)).alias("n_vocab")
    )
    cuts = (
        load_table(spark, sf_dir, "documents")
        .sparkSession.createDataFrame([(100,), (1000,)], "n_top int")
    )
    cov = (
        cuts.crossJoin(F.broadcast(ranked))
        .where(F.col("rnk") <= F.col("n_top"))
        .groupBy("n_top")
        .agg(F.sum("c").alias("_cov"))
    )
    return (
        cuts.join(cov, "n_top", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_top",
            F.floor(
                F.coalesce("_cov", F.lit(0)) * 1000000 / F.col("n_occurrences")
            ).cast("long").alias("covered_ppm"),
            "n_occurrences", "n_vocab",
        )
    )


@stage(
    "text_length_gini",
    """
    WITH r AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS i
      FROM documents
    ),
    s AS (
      SELECT count(*) AS n, sum(n_chars) AS sx,
             sum(i * n_chars) AS six
      FROM r
    )
    SELECT n, sx AS total_chars,
           CAST((2 * six - (n + 1) * sx) * 1000000 // (n * sx)
                AS BIGINT) AS gini_ppm
    FROM s
    """,
    "document-length inequality as a scaled-integer Gini coefficient: "
    "rank-weighted sums over (n_chars, doc_id)-ordered docs — the "
    "corpus-balance number a packing/curriculum planner reads; every "
    "operation integer until the final floor division, so the "
    "coefficient hash-matches exactly",
)
def q_text_length_gini(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    r = docs.select(
        "n_chars",
        F.row_number().over(Window.orderBy("n_chars", "doc_id")).alias("i"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("i") * F.col("n_chars")).alias("six"),
    )
    return s.select(
        "n",
        F.col("sx").alias("total_chars"),
        F.floor(
            (2 * F.col("six") - (F.col("n") + 1) * F.col("sx"))
            * 1000000
            / (F.col("n") * F.col("sx"))
        ).cast("long").alias("gini_ppm"),
    )


@stage(
    "q_events_cohort_triangle",
    """
    WITH e AS (
      SELECT user_id,
             CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS BIGINT)
               AS day
      FROM events
    ),
    first_d AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1)
    SELECT f.cohort, e.day - f.cohort AS offset_days,
           count(DISTINCT e.user_id) AS n_users
    FROM e JOIN first_d f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    "the cohort retention triangle over the event stream: users "
    "grouped by their FIRST active day, activity counted at each day "
    "offset — the classic growth-accounting matrix; first-touch "
    "derivation and distinct counts replay exactly",
)
def q_q_events_cohort_triangle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_timestamp("ts").cast("long") / 86400).cast("long").alias(
            "day"
        ),
    )
    first_d = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        ev.join(first_d, "user_id")
        .groupBy(
            "cohort", (F.col("day") - F.col("cohort")).alias("offset_days")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@stage(
    "ts_integral_daily",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    )
    SELECT metric, ts,
           round(sum(value) OVER (
             PARTITION BY metric, CAST(ts // 86400 AS BIGINT)
             ORDER BY ts ROWS UNBOUNDED PRECEDING
           ), 6) AS value
    FROM t0
    """,
    "graphite integral(series) with a daily reset: the running sum "
    "restarts at each midnight (the per-day odometer dashboards "
    "show); the window's sequential accumulation order is identical "
    "on both engines so the float path matches like the other "
    "running-sum rows",
)
def q_ts_integral_daily(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    w = (
        Window.partitionBy("metric", (F.col("ts") / 86400).cast("long"))
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t0.select(
        "metric", "ts", F.round(F.sum("value").over(w), 6).alias("value")
    )


@stage(
    "sketch_histogram_p50_drift",
    """
    WITH cells AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE WHEN value < 0.0 THEN 0
                  WHEN value >= 512.0 THEN 257
                  ELSE CAST(floor((value - 0.0) / 2.0) + 1 AS INT)
             END AS bucket,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT day, bucket,
             sum(c) OVER (PARTITION BY day ORDER BY bucket) AS _cum,
             sum(c) OVER (PARTITION BY day) AS _tot
      FROM cells
    ),
    p AS (
      SELECT day, min(bucket) AS p50_bucket FROM cum
      WHERE _cum >= 0.5 * _tot GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(p50_bucket AS BIGINT) AS p50_bucket,
           CAST(p50_bucket - lag(p50_bucket) OVER (ORDER BY day)
                AS BIGINT) AS drift
    FROM p
    """,
    "distribution drift from histogram-sketch state: the daily median "
    "BUCKET (an integer — no edge arithmetic at all) and its "
    "day-over-day drift, the cheap distribution-shift monitor a "
    "data-quality pipeline alerts on; cells, quantile walk and lag "
    "replay exactly",
)
def q_sketch_histogram_p50_drift(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.functions.sketches import histogram_sketches

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    cells = histogram_sketches(
        ev, "value", "day", lo=0.0, hi=512.0, bins=256
    )
    w = Window.partitionBy("day").orderBy("bucket")
    cum = cells.select(
        "day", "bucket",
        F.sum("c").over(w).alias("_cum"),
        F.sum("c").over(
            Window.partitionBy("day").orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_tot"),
    )
    p = (
        cum.where(F.col("_cum") >= 0.5 * F.col("_tot"))
        .groupBy("day")
        .agg(F.min("bucket").alias("p50_bucket"))
    )
    return p.select(
        F.col("day").cast("string").alias("day"),
        F.col("p50_bucket").cast("long").alias("p50_bucket"),
        (
            F.col("p50_bucket")
            - F.lag("p50_bucket").over(Window.orderBy("day"))
        ).cast("long").alias("drift"),
    )


@stage(
    "sample_bottomk_nesting",
    """
    SELECT CAST(64 AS BIGINT) AS k_small, CAST(128 AS BIGINT) AS k_big,
           CAST(0 AS BIGINT) AS n_missing
    """,
    "bottom-k sample NESTING — the property that makes hash samples "
    "reusable across budget changes: the bottom-64 doc sample is "
    "always a subset of the bottom-128 (same seed, same hash order), "
    "so shrinking an eval set never resamples; the engine computes "
    "the anti-join count and the oracle states the invariant (0 "
    "missing, by construction)",
)
def q_sample_bottomk_nesting(spark, sf_dir):
    from kenshin_spark.functions.sampling import bottom_k_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    small = bottom_k_sample(docs, 64, "doc_id")
    big = bottom_k_sample(docs, 128, "doc_id")
    missing = small.join(big, "doc_id", "left_anti")
    return missing.agg(
        F.lit(64).cast("long").alias("k_small"),
        F.lit(128).cast("long").alias("k_big"),
        F.count(F.lit(1)).alias("n_missing"),
    )


# --------------------------------------------------------------------------
# Batch 3: tier occupancy, quantity mode, priority latency, value
# cardinality, CMS heavy hitters, semantic-vs-cosine agreement,
# nation/quarter matrix, Benford audit.
# --------------------------------------------------------------------------


@stage(
    "ts_tier_occupancy",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    t1 AS (SELECT metric, ts - ts % 300 AS ts, max(value) AS value
           FROM t0 GROUP BY 1, 2),
    t2 AS (SELECT metric, ts - ts % 3600 AS ts, max(value) AS value
           FROM t1 GROUP BY 1, 2)
    SELECT CAST(0 AS BIGINT) AS tier, metric, count(*) AS n_slots
    FROM t0 GROUP BY 2
    UNION ALL
    SELECT 1, metric, count(*) FROM t1 GROUP BY 2
    UNION ALL
    SELECT 2, metric, count(*) FROM t2 GROUP BY 2
    """,
    "archive occupancy per tier: slot counts per metric down the "
    "60s/300s/3600s cascade (each tier downsampled from the previous "
    "— operators/downsample.cascade) — the fill-factor report a "
    "capacity planner compares against ring capacity; integer counts",
)
def q_ts_tier_occupancy(spark, sf_dir):
    from kenshin_spark.config import Archive
    from kenshin_spark.operators.align import last_write_wins
    from kenshin_spark.operators.downsample import cascade

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    tiers = cascade(
        t0,
        [
            Archive(sec_per_point=60, count=129600),
            Archive(sec_per_point=300, count=51840),
            Archive(sec_per_point=3600, count=8784),
        ],
        agg_method="max",
    )
    out = None
    for i, t in enumerate(tiers):
        c = t.groupBy("metric").agg(F.count(F.lit(1)).alias("n_slots"))
        c = c.select(F.lit(i).cast("long").alias("tier"), "metric", "n_slots")
        out = c if out is None else out.unionByName(c)
    return out


@stage(
    "q_lineitem_quantity_mode",
    """
    SELECT l_returnflag, quantity_mode, n_at_mode FROM (
      SELECT l_returnflag, l_quantity AS quantity_mode,
             count(*) AS n_at_mode,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY count(*) DESC, l_quantity) AS rnk
      FROM lineitem GROUP BY 1, 2
    ) t WHERE rnk = 1
    """,
    "modal order quantity per return flag: the most frequent quantity "
    "with a value tie-break — exact mode (not approx) via one "
    "grouped count + per-group rank",
)
def q_q_lineitem_quantity_mode(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n_at_mode")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n_at_mode").desc(), F.col("l_quantity")
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("quantity_mode"),
            "n_at_mode",
        )
    )


@stage(
    "ts_value_cardinality_ratio",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           count(*) AS n_points,
           count(DISTINCT value) AS n_distinct,
           CAST(count(DISTINCT value) * 1000000 // count(*) AS BIGINT)
             AS distinct_ppm
    FROM pts WHERE value IS NOT NULL GROUP BY 1
    """,
    "value-cardinality compression profile per metric: distinct "
    "values over total points (floor-scaled ppm) — the statistic that "
    "decides dictionary vs plain parquet encoding for a tier, and "
    "whether a metric is a low-cardinality state flag or a continuous "
    "gauge; integers throughout",
)
def q_ts_value_cardinality_ratio(spark, sf_dir):
    pts = _points(spark, sf_dir).where(F.col("value").isNotNull())
    return pts.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("value").alias("n_distinct"),
        F.floor(
            F.countDistinct("value") * 1000000 / F.count(F.lit(1))
        ).cast("long").alias("distinct_ppm"),
    )


@stage(
    "sketch_cms_heavy_hitters",
    """
    WITH cells AS (
      SELECT t.r AS row,
             CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' ||
                   CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024
               AS bucket,
             count(*) AS c
      FROM events CROSS JOIN generate_series(0, 3) t(r)
      GROUP BY 1, 2
    ),
    exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
    probe AS (
      SELECT e.user_id, t.r AS row,
             CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' ||
                   CAST(e.user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024
               AS bucket
      FROM exact e CROSS JOIN generate_series(0, 3) t(r)
    ),
    est AS (
      SELECT p.user_id, min(coalesce(cl.c, 0)) AS est
      FROM probe p
      LEFT JOIN cells cl ON cl.row = p.row AND cl.bucket = p.bucket
      GROUP BY 1
    ),
    thr AS (SELECT CAST(sum(exact) * 5 // 100 AS BIGINT) AS t FROM exact)
    SELECT
      CAST((SELECT count(*) FROM est, thr WHERE est >= t) AS BIGINT)
        AS n_est_hh,
      CAST((SELECT count(*) FROM exact, thr WHERE exact >= t) AS BIGINT)
        AS n_exact_hh,
      CAST((SELECT count(*) FROM est e
            JOIN exact x ON x.user_id = e.user_id, thr
            WHERE e.est >= t AND x.exact >= t) AS BIGINT) AS n_agree
    """,
    "heavy-hitter detection from CMS state: users whose estimated "
    "frequency clears 5%% of total traffic vs the exact heavy-hitter "
    "set — CMS one-sided error guarantees the estimate NEVER misses a "
    "true heavy hitter (n_agree == n_exact_hh), only over-reports; "
    "sketch, threshold and agreement all replay bit-for-bit",
)
def q_sketch_cms_heavy_hitters(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        cms_estimate,
        cms_merge,
        cms_sketches,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_id", F.col("user_id").cast("string")
    )
    merged = cms_merge(cms_sketches(ev, "user_id"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(merged, exact.select("user_id"), "user_id")
    thr = exact.agg(
        F.floor(F.sum("exact") * 5 / 100).cast("long").alias("t")
    )
    j = est.join(exact, "user_id").crossJoin(F.broadcast(thr))
    return j.agg(
        F.sum((F.col("est") >= F.col("t")).cast("long")).alias("n_est_hh"),
        F.sum((F.col("exact") >= F.col("t")).cast("long")).alias(
            "n_exact_hh"
        ),
        F.sum(
            ((F.col("est") >= F.col("t")) & (F.col("exact") >= F.col("t")))
            .cast("long")
        ).alias("n_agree"),
    )


@stage(
    "dedup_semantic_cosine_agreement",
    f"""
    WITH se AS (
      SELECT vec_a, vec_b FROM ({_REG["dedup_semantic"].oracle}) x
    ),
    co AS (
      SELECT vec_a, vec_b FROM ({_REG["dedup_embedding_neardup"].oracle}) y
    )
    SELECT
      CAST((SELECT count(*) FROM se) AS BIGINT) AS n_semantic,
      CAST((SELECT count(*) FROM co) AS BIGINT) AS n_cosine,
      CAST((SELECT count(*) FROM se JOIN co
            ON co.vec_a = se.vec_a AND co.vec_b = se.vec_b) AS BIGINT)
        AS n_both
    """,
    "SemDeDup-vs-global agreement: the centroid-bucketed semantic "
    "near-dup pair set against the all-pairs cosine set — how much "
    "of the exact answer the cluster-scoped scan keeps (the recall "
    "side of SemDeDup's quadratic-cost dodge); derived from two "
    "replayable registry paths",
)
def q_dedup_semantic_cosine_agreement(spark, sf_dir):
    # same restructure as dedup_method_agreement: one FULL OUTER join on
    # the (unique) pair key + a single aggregate evaluates each pair
    # pipeline ONCE — the three-aggregate crossJoin ran the SemDeDup and
    # the all-pairs cosine subtrees twice each (32 scans / 54 exchanges).
    se = _REG["dedup_semantic"].fn(spark, sf_dir).select("vec_a", "vec_b")
    co = _REG["dedup_embedding_neardup"].fn(spark, sf_dir).select(
        F.col("vec_a").alias("ca"), F.col("vec_b").alias("cb")
    )
    j = se.join(
        co,
        (F.col("ca") == F.col("vec_a")) & (F.col("cb") == F.col("vec_b")),
        "full_outer",
    )
    return j.agg(
        F.count("vec_a").alias("n_semantic"),
        F.count("ca").alias("n_cosine"),
        F.count(
            F.when(F.col("vec_a").isNotNull() & F.col("ca").isNotNull(), 1)
        ).alias("n_both"),
    )




@stage(
    "q_order_benford_audit",
    """
    SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                  1, 1) AS first_digit,
           count(*) AS n_orders
    FROM orders WHERE o_totalprice >= 1
    GROUP BY 1
    """,
    "Benford first-digit audit over order values: the "
    "fraud/synthetic-data screen — first digit of the floored total "
    "price counted per digit; string-of-integer extraction is "
    "identical on both engines (no float formatting in play)",
)
def q_q_order_benford_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            ).alias("first_digit")
        )
        .groupBy("first_digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Batch 4: dim sign profile, customer lifespan, balance outliers,
# containment bands, region revenue share, phash distance profile,
# alignment audit, tagged groupByNode.
# --------------------------------------------------------------------------


@stage(
    "emb_dim_sign_profile",
    """
    SELECT t.dim,
           sum(CASE WHEN embedding[t.dim + 1] > 0 THEN 1 ELSE 0 END)
             AS n_pos,
           sum(CASE WHEN embedding[t.dim + 1] < 0 THEN 1 ELSE 0 END)
             AS n_neg,
           sum(CASE WHEN embedding[t.dim + 1] = 0 THEN 1 ELSE 0 END)
             AS n_zero
    FROM embeddings, range(64) t(dim)
    GROUP BY 1
    """,
    "per-dimension sign balance across the corpus: positive/negative/"
    "zero counts per coordinate — the zero-centering check run before "
    "trusting sign-based sketches (simhash for vectors); pure integer "
    "comparisons, posexplode + one map-side-combined aggregate",
)
def q_emb_dim_sign_profile(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode("embedding").alias("dim", "v"))
    return e.groupBy("dim").agg(
        F.sum((F.col("v") > 0).cast("long")).alias("n_pos"),
        F.sum((F.col("v") < 0).cast("long")).alias("n_neg"),
        F.sum((F.col("v") == 0).cast("long")).alias("n_zero"),
    )




@stage(
    "q_supplier_balance_outliers",
    """
    WITH q AS (
      SELECT quantile_cont(s_acctbal, 0.25) AS q1,
             quantile_cont(s_acctbal, 0.75) AS q3
      FROM supplier
    )
    SELECT count(*) AS n_suppliers,
           sum(CASE WHEN s_acctbal < q1 - 1.5 * (q3 - q1)
                    THEN 1 ELSE 0 END) AS n_low_outliers,
           sum(CASE WHEN s_acctbal > q3 + 1.5 * (q3 - q1)
                    THEN 1 ELSE 0 END) AS n_high_outliers
    FROM supplier, q
    """,
    "IQR outlier screen over supplier balances: Tukey fences from "
    "exact interpolated quartiles (the same percentile arithmetic "
    "both engines share), integer outlier counts — the "
    "data-validation pass a dimension load runs",
)
def q_q_supplier_balance_outliers(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    q = s.agg(
        F.expr("percentile(s_acctbal, 0.25)").alias("q1"),
        F.expr("percentile(s_acctbal, 0.75)").alias("q3"),
    )
    j = s.crossJoin(F.broadcast(q))
    iqr = F.col("q3") - F.col("q1")
    return j.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(
            (F.col("s_acctbal") < F.col("q1") - 1.5 * iqr).cast("long")
        ).alias("n_low_outliers"),
        F.sum(
            (F.col("s_acctbal") > F.col("q3") + 1.5 * iqr).cast("long")
        ).alias("n_high_outliers"),
    )


@stage(
    "dedup_containment_bands",
    f"""
    SELECT CAST(floor(containment * 10) AS BIGINT) AS band,
           count(*) AS n_pairs
    FROM ({_REG["dedup_containment"].oracle}) c
    GROUP BY 1
    """,
    "containment-score distribution: the asymmetric-overlap pairs "
    "(subset detection — a short doc wholly inside a long one) banded "
    "by score decile — the threshold-tuning histogram; derived from "
    "the registry's replayable containment path so the bands "
    "hash-check",
)
def q_dedup_containment_bands(spark, sf_dir):
    c = _REG["dedup_containment"].fn(spark, sf_dir)
    return (
        c.select(
            F.floor(F.col("containment") * 10).cast("long").alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@stage(
    "q_region_revenue_share",
    """
    WITH r AS (
      SELECT rg.r_name,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region rg ON rg.r_regionkey = n.n_regionkey
      GROUP BY 1
    ),
    c2 AS (SELECT r_name, CAST(floor(rev * 100) AS BIGINT) AS cents FROM r),
    t AS (SELECT sum(cents) AS total_cents FROM c2)
    SELECT c2.r_name,
           round(CAST(c2.cents AS DOUBLE) / 100.0, 2) AS revenue,
           c2.cents * 1000000 // t.total_cents AS share_ppm
    FROM c2, t
    """,
    "regional revenue share in DECIMAL end to end: discounted revenue "
    "accumulated exactly, shares as floor-divided DECIMAL ppm — no "
    "double enters until the display column; the five-table star join "
    "with every dimension broadcastable",
)
def q_q_region_revenue_share(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rg = load_table(spark, sf_dir, "region")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
    )
    r = j.groupBy("r_name").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rev")
    )
    c2 = r.select(
        "r_name", F.floor(F.col("rev") * 100).cast("long").alias("cents")
    )
    t = c2.agg(F.sum("cents").alias("total_cents"))
    return c2.crossJoin(F.broadcast(t)).select(
        "r_name",
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("revenue"),
        F.expr("cents * 1000000 DIV total_cents").alias("share_ppm"),
    )


@stage(
    "mm_phash_distance_profile",
    f"""
    SELECT CAST(hamming AS BIGINT) AS hamming, count(*) AS n_pairs
    FROM ({_REG["mm_phash_neardup"].oracle}) p
    GROUP BY 1
    """,
    "perceptual-hash distance profile: the near-dup candidate pairs "
    "(hamming <= 6 over the 64-bit DCT phash) counted per distance — "
    "the threshold histogram an image-dedup pass reads; derived from "
    "the registry's replayable phash path",
)
def q_mm_phash_distance_profile(spark, sf_dir):
    p = _REG["mm_phash_neardup"].fn(spark, sf_dir)
    return p.groupBy(F.col("hamming").cast("long").alias("hamming")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@stage(
    "ts_slot_alignment_audit",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           count(*) AS n_points,
           sum(CASE WHEN ts % 60 = 0 THEN 1 ELSE 0 END) AS n_aligned,
           sum(CASE WHEN ts % 60 <> 0 THEN 1 ELSE 0 END) AS n_unaligned
    FROM pts GROUP BY 1
    """,
    "ingest alignment audit: how many raw points already sit on the "
    "60s grid vs need align-down — the W5 pre-step statistic that "
    "predicts LWW collision volume (an all-aligned feed makes the "
    "align a no-op; a jittery one concentrates collisions); integer "
    "modulo only",
)
def q_ts_slot_alignment_audit(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum((F.col("ts") % 60 == 0).cast("long")).alias("n_aligned"),
        F.sum((F.col("ts") % 60 != 0).cast("long")).alias("n_unaligned"),
    )


@stage(
    "render_group_node_max",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    tagged AS (
      SELECT 'dc' || CAST(ts % 2 AS VARCHAR) || '.' || metric AS metric,
             ts, value
      FROM t0
    )
    SELECT string_split(metric, '.')[1] AS metric, ts,
           max(value) AS value
    FROM tagged GROUP BY 1, 2
    """,
    "graphite groupByNode(0, 'max') over a dotted namespace: series "
    "re-keyed to their datacenter prefix and folded per slot by max "
    "(exact comparisons — the NULL-ignoring envelope, not the "
    "float-sum variant) — the fleet-rollup the render API serves",
)
def q_render_group_node_max(spark, sf_dir):
    from kenshin_spark.functions.render import group_by_node
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    tagged = t0.select(
        F.concat(
            F.lit("dc"), (F.col("ts") % 2).cast("string"),
            F.lit("."), F.col("metric"),
        ).alias("metric"),
        "ts", "value",
    )
    return group_by_node(tagged, 0, "max")


# --------------------------------------------------------------------------
# Batch 5: session value bands, active-day histogram, hapax by source,
# KMV affinity matrix, discount curve, type/dow heatmap, token ranges,
# day-partition profile, balance/activity matrix, gap histogram.
# --------------------------------------------------------------------------




@stage(
    "text_hapax_by_source",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY 1
    ),
    hapax AS (SELECT tok FROM freq WHERE c = 1)
    SELECT t.source,
           count(*) AS n_occurrences,
           sum(CASE WHEN h.tok IS NOT NULL THEN 1 ELSE 0 END) AS n_hapax
    FROM toks t LEFT JOIN hapax h ON h.tok = t.tok
    WHERE t.tok <> ''
    GROUP BY 1
    """,
    "corpus-hapax contribution per source: which sources carry the "
    "vocabulary's singleton tail (the OOV-risk profile a tokenizer "
    "trainer reads per provider); global hapax set broadcast back "
    "against the token stream, integer counts",
)
def q_text_hapax_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    hapax = freq.where(F.col("c") == 1).select("tok").withColumn(
        "_h", F.lit(True)
    )
    return (
        toks.join(F.broadcast(hapax), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum(F.col("_h").isNotNull().cast("long")).alias("n_hapax"),
        )
    )


@stage(
    "sketch_kmv_click_affinity",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{t}' AS other_type, union_est, inter_est, jaccard_ppm
    FROM (WITH {_kmv_pair_sql("event_type = 'click'",
                              f"event_type = '{t}'")}
          SELECT * FROM est) s{i}
    """
        for i, t in enumerate(("error", "purchase", "signup", "view"))
    ),
    "audience affinity matrix from KMV states: the click audience "
    "intersected with each other event type's audience — four theta "
    "intersections computed from five persisted 256-row states "
    "instead of four distinct-joins over raw events; every estimate "
    "floor-scaled and replayed bit-for-bit",
)
def q_sketch_kmv_click_affinity(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        kmv_bottom_set,
        kmv_set_estimates,
    )

    ev = load_table(spark, sf_dir, "events")
    click = kmv_bottom_set(
        ev.where(F.col("event_type") == "click"), "user_id", 256
    ).localCheckpoint(eager=True)
    out = None
    for t in ("error", "purchase", "signup", "view"):
        other = kmv_bottom_set(
            ev.where(F.col("event_type") == t), "user_id", 256
        )
        est = kmv_set_estimates(click, other, 256).select(
            F.lit(t).alias("other_type"),
            "union_est", "inter_est", "jaccard_ppm",
        )
        out = est if out is None else out.unionByName(est)
    return out




@stage(
    "text_token_range_by_lang",
    r"""
    WITH t AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS n_tok
      FROM documents
    )
    SELECT lang,
           min(n_tok) AS min_tokens,
           round(quantile_cont(n_tok, 0.5), 6) AS median_tokens,
           max(n_tok) AS max_tokens,
           count(*) AS n_docs
    FROM t GROUP BY 1
    """,
    "document length envelope per language: min/median/max whitespace "
    "token counts — the per-language sizing table a packing planner "
    "reads; integer counts with the exact interpolated median",
)
def q_text_token_range_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    return t.groupBy("lang").agg(
        F.min("n_tok").cast("long").alias("min_tokens"),
        F.round(F.expr("percentile(n_tok, 0.5)"), 6).alias(
            "median_tokens"
        ),
        F.max("n_tok").cast("long").alias("max_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@stage(
    "store_day_partition_profile",
    f"""
    WITH {_W}
    SELECT metric, CAST(ts // 86400 AS BIGINT) AS day,
           count(*) AS n_slots,
           min(ts) AS first_ts, max(ts) AS last_ts
    FROM t0 GROUP BY 1, 2
    """,
    "day-partition profile through the store read path: per "
    "(metric, day) slot counts and timestamp envelopes after the "
    "week's upsert — the physical-layout statistic (rows per day "
    "partition) that drives compaction and maxPartitionBytes choices, "
    "read back from the persisted tier",
)
def q_store_day_partition_profile(spark, sf_dir):
    st = _store(spark, sf_dir, "store_day_profile")
    st.upsert(0, _week_slots(spark, sf_dir))
    t = st.read(0)
    return t.groupBy(
        "metric", (F.col("ts") / 86400).cast("long").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@stage(
    "q_customer_balance_activity_matrix",
    """
    WITH b AS (
      SELECT c_custkey,
             ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey)
               AS balance_q
      FROM customer
    ),
    o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
    SELECT b.balance_q,
           CASE WHEN coalesce(o.n_orders, 0) = 0 THEN '0'
                WHEN o.n_orders <= 5 THEN '1-5'
                WHEN o.n_orders <= 15 THEN '6-15'
                ELSE '16+' END AS order_band,
           count(*) AS n_customers
    FROM b LEFT JOIN o ON o.o_custkey = b.c_custkey
    GROUP BY 1, 2
    """,
    "balance-quartile x activity-band customer matrix: ntile with a "
    "custkey tie-break (identical bucketing on both engines) crossed "
    "with order-count bands — the segmentation grid a CRM load "
    "produces; integers only",
)
def q_q_customer_balance_activity_matrix(spark, sf_dir):
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    b = c.select(
        "c_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
        .alias("balance_q"),
    )
    oc = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    j = b.join(oc, b.c_custkey == oc.o_custkey, "left")
    n = F.coalesce("n_orders", F.lit(0))
    band = (
        F.when(n == 0, "0")
        .when(n <= 5, "1-5")
        .when(n <= 15, "6-15")
        .otherwise("16+")
    )
    return j.groupBy("balance_q", band.alias("order_band")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@stage(
    "ts_gap_histogram",
    f"""
    WITH pts AS ({PTS}), t0 AS (
      SELECT metric, ts - ts % 60 AS ts, arg_max(value, arrival) AS value
      FROM pts GROUP BY 1, 2
    ),
    g AS (
      SELECT metric,
             (ts - lag(ts) OVER (PARTITION BY metric ORDER BY ts)) // 60
               - 1 AS missed
      FROM t0
    )
    SELECT metric, CAST(missed AS BIGINT) AS missed_slots,
           count(*) AS n_gaps
    FROM g WHERE missed IS NOT NULL AND missed > 0
    GROUP BY 1, 2
    """,
    "gap-length histogram per metric: how many tier0 slots each "
    "silence spans (the outage-size distribution that separates "
    "flaky collection from real downtime, and sizes keepLastValue "
    "limits); integer lag arithmetic on the aligned grid",
)
def q_ts_gap_histogram(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    w = Window.partitionBy("metric").orderBy("ts")
    g = t0.select(
        "metric",
        ((F.col("ts") - F.lag("ts").over(w)) / 60 - 1)
        .cast("long")
        .alias("missed_slots"),
    )
    return (
        g.where(F.col("missed_slots").isNotNull() & (F.col("missed_slots") > 0))
        .groupBy("metric", "missed_slots")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


# --------------------------------------------------------------------------
# Final bank rows: conversion lag bands, prefix diversity, MoM growth,
# label balance, series lifetime report, part-name words, histogram
# tail mass, top supplier per nation.
# --------------------------------------------------------------------------


@stage(
    "q_purchase_lag_bands",
    """
    WITH c AS (
      SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ),
    v AS (
      SELECT user_id, ts AS conv_ts FROM events
      WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT CAST(floor(epoch(v.conv_ts)) AS BIGINT)
               - CAST(floor(epoch(c.view_ts)) AS BIGINT) AS lag_s
      FROM v JOIN c ON c.user_id = v.user_id
       AND c.view_ts <= v.conv_ts
       AND c.view_ts >= v.conv_ts - INTERVAL 1 HOUR
    )
    SELECT CASE WHEN lag_s <= 300 THEN '0-5m'
                WHEN lag_s <= 900 THEN '5-15m'
                WHEN lag_s <= 1800 THEN '15-30m'
                ELSE '30-60m' END AS band,
           count(*) AS n_pairs
    FROM pairs GROUP BY 1
    """,
    "view-to-purchase latency bands: every (purchase, prior view "
    "within 1h) pair — the same bounded interval join the streaming "
    "attribution operator state-limits — banded into decision-time "
    "buckets; integer second arithmetic",
)
def q_q_purchase_lag_bands(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    v = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("ts").alias("conv_ts")
    )
    pairs = v.join(
        c,
        (F.col("uid") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("conv_ts"))
        & (F.col("view_ts") >= F.col("conv_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        (
            F.unix_timestamp("conv_ts").cast("long")
            - F.unix_timestamp("view_ts").cast("long")
        ).alias("lag_s")
    )
    band = (
        F.when(F.col("lag_s") <= 300, "0-5m")
        .when(F.col("lag_s") <= 900, "5-15m")
        .when(F.col("lag_s") <= 1800, "15-30m")
        .otherwise("30-60m")
    )
    return pairs.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@stage(
    "text_prefix_diversity",
    r"""
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    )
    SELECT lang,
           count(DISTINCT substr(tok, 1, 3)) AS n_prefixes,
           count(DISTINCT tok) AS n_vocab
    FROM toks WHERE tok <> '' GROUP BY 1
    """,
    "lexical prefix diversity per language: distinct 3-char token "
    "prefixes vs full vocabulary — the trie-width statistic that "
    "predicts prefix-compression wins in a token dictionary; integer "
    "distinct counts",
)
def q_text_prefix_diversity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    return toks.groupBy("lang").agg(
        F.countDistinct(F.substring("tok", 1, 3)).alias("n_prefixes"),
        F.countDistinct("tok").alias("n_vocab"),
    )




@stage(
    "emb_label_size_balance",
    """
    WITH c AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1),
    mm AS (SELECT min(n_vecs) AS mn, max(n_vecs) AS mx FROM c)
    SELECT c.label, c.n_vecs,
           c.n_vecs * 1000000 // mm.mx AS share_of_max_ppm
    FROM c, mm
    """,
    "label balance audit: per-label vector counts and each label's "
    "size relative to the largest (floor-scaled ppm) — the class-"
    "imbalance number that decides whether per-label IVF cells need "
    "rebalancing; integers only",
)
def q_emb_label_size_balance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    mm = c.agg(F.max("n_vecs").alias("mx"))
    return c.crossJoin(F.broadcast(mm)).select(
        "label", "n_vecs",
        F.expr("n_vecs * 1000000 DIV mx").alias("share_of_max_ppm"),
    )


@stage(
    "ts_series_lifetime_report",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           min(ts) AS first_ts, max(ts) AS last_ts,
           CAST((max(ts) - min(ts)) // 86400 AS BIGINT) AS lifetime_days,
           count(*) AS n_points
    FROM pts GROUP BY 1
    """,
    "series lifetime catalog: first/last raw timestamps, whole-day "
    "lifetime and point counts per metric — the header-inspect analog "
    "(R9) computed relationally instead of from ring headers; pure "
    "integer aggregates",
)
def q_ts_series_lifetime_report(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy("metric").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        ((F.max("ts") - F.min("ts")) / 86400).cast("long").alias(
            "lifetime_days"
        ),
        F.count(F.lit(1)).alias("n_points"),
    )


@stage(
    "sketch_histogram_tail_mass",
    """
    WITH cells AS (
      SELECT event_type,
             CASE WHEN value < 0.0 THEN 0
                  WHEN value >= 256.0 THEN 129
                  ELSE CAST(floor((value - 0.0) / 2.0) + 1 AS INT)
             END AS bucket,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type,
           sum(c) AS n_values,
           sum(CASE WHEN bucket = 129 THEN c ELSE 0 END) AS n_overflow,
           CAST(sum(CASE WHEN bucket = 129 THEN c ELSE 0 END) * 1000000
                // sum(c) AS BIGINT) AS overflow_ppm
    FROM cells GROUP BY 1
    """,
    "histogram-sketch tail mass: how much probability lands in the "
    "overflow bucket when the [0,256) bounds clip — the "
    "bounds-validation number that tells a schema advisor to widen "
    "the histogram range before trusting its quantiles; integer "
    "cell sums, floor-scaled ppm",
)
def q_sketch_histogram_tail_mass(spark, sf_dir):
    from kenshin_spark.functions.sketches import histogram_sketches

    ev = load_table(spark, sf_dir, "events")
    cells = histogram_sketches(
        ev, "value", "event_type", lo=0.0, hi=256.0, bins=128
    )
    over = F.when(F.col("bucket") == 129, F.col("c")).otherwise(0)
    return cells.groupBy("event_type").agg(
        F.sum("c").alias("n_values"),
        F.sum(over).alias("n_overflow"),
        F.expr(
            "sum(CASE WHEN bucket = 129 THEN c ELSE 0 END) * 1000000"
            " DIV sum(c)"
        ).alias("overflow_ppm"),
    )


@stage(
    "q_top_supplier_per_nation",
    """
    SELECT n_name, s_suppkey, s_acctbal FROM (
      SELECT n.n_name, s.s_suppkey, s.s_acctbal,
             row_number() OVER (
               PARTITION BY n.n_name
               ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk
      FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    ) t WHERE rnk = 1
    """,
    "highest-balance supplier per nation: per-group rank with a "
    "suppkey tie-break (identical winner on both engines), nation "
    "dim broadcast",
)
def q_q_top_supplier_per_nation(spark, sf_dir):
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("n_name", "s_suppkey", "s_acctbal")
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


# --------------------------------------------------------------------------
# Promoted EARLY from the r16 overflow bank (VERDICT r10 item 1): the
# round-10 engine rows — the manifest-commit lifecycle and real-pixel
# perceptual dedup — plus the r9-continuation codec rows, so the driver
# adjudicates them THIS round. Eight self-contained analytics rows moved
# the other way to keep both banks at a legal window size.
# --------------------------------------------------------------------------


@stage(
    "q_ship_latency_bands",
    """
    SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                  THEN '0-30'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 60
                  THEN '31-60'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90
                  THEN '61-90'
                ELSE '90+' END AS band,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
    "order-to-ship latency bands per order month: the lineitem-orders "
    "key join (co-partitioned on orderkey — the classic TPC-H join "
    "Catalyst plans as one shuffle pair) with integer day arithmetic "
    "banded into fulfilment SLas",
)
def q_q_ship_latency_bands(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lat = F.datediff("l_shipdate", "o_orderdate")
    band = (
        F.when(lat <= 30, "0-30")
        .when(lat <= 60, "31-60")
        .when(lat <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        j.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            band.alias("band"),
        )
        .groupBy("month", "band")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# r9-continuation surface: lossless-WebP / progressive-JPEG codecs,
# animated-frame sampling, and the hybrid CC escalation — each new
# engine component gets a driver-oracled row (topping this overflow
# bank up from 1 to 6; the window still fits with room to spare).
# --------------------------------------------------------------------------


# shared with the r10 bank via the leaf module (a bank->bank import
# here deadlocks on executors: unpickling an r10 kernel re-imports
# queries.py, which imports THIS bank before r10 finishes binding)
from kenshin_spark.bank_common import _doc_ids  # noqa: E402


def _rgb_gradient(doc_id: int, h: int, w: int):
    import numpy as np

    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return ((doc_id + 31 * y + 17 * x + 5 * c) % 256).astype(np.uint8)


@stage(
    "mm_webp_container_dims",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(5 + doc_id % 12 AS BIGINT) AS width,
           CAST(4 + (doc_id * 3) % 9 AS BIGINT) AS height,
           'webp' AS format
    FROM documents WHERE doc_id % 50 = 0
    """,
    "the lossless-WebP write/read loop as a driver row: per-doc RGB "
    "gradients encoded to REAL VP8L containers by the engine's "
    "encode_webp_lossless (canonical-Huffman bitstream, color cache on "
    "odd docs), then image_metadata parses the 14-bit VP8L dims "
    "natively — no PIL anywhere in the path (multimodal/webp.py)",
)
def q_mm_webp_container_dims(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal import image_metadata

    def kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 5 + did % 12, 4 + (did * 3) % 9
                payload = webp.encode_webp_lossless(
                    _rgb_gradient(did, h, w), use_cache=4 * (did % 2)
                )
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    return image_metadata(payloads).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "format",
    )


@stage(
    "mm_progressive_jpeg_dims",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(8 + doc_id % 24 AS BIGINT) AS width,
           CAST(8 + (doc_id * 7) % 16 AS BIGINT) AS height,
           'jpeg' AS format
    FROM documents WHERE doc_id % 50 = 0
    """,
    "progressive JPEG (SOF2) as a driver row: per-doc gradients "
    "encoded with encode_jpeg_progressive (spectral selection + "
    "successive approximation at doc-varying levels), then "
    "image_metadata reads the SOF2 frame header natively "
    "(multimodal/codecs.py T.81 Annex G path)",
)
def q_mm_progressive_jpeg_dims(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal import image_metadata

    def kern(batches):
        from kenshin_spark.multimodal import codecs

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 24, 8 + (did * 7) % 16
                payload = codecs.encode_jpeg_progressive(
                    _rgb_gradient(did, h, w), levels=did % 3
                )
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    return image_metadata(payloads).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "format",
    )


@stage(
    "mm_webp_resize_pixel_sum",
    """
    WITH ijc AS (
      SELECT a.i, b.j, c.c
      FROM (SELECT unnest(generate_series(0, 7)) AS i) a
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) b
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) c
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(sum((d.doc_id + 62 * ijc.i + 34 * ijc.j + 5 * ijc.c) % 256)
                AS BIGINT) AS pixel_sum
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 = 0) d
    CROSS JOIN ijc
    GROUP BY d.doc_id
    """,
    "the WebP resize loop down to PIXEL VALUES: 16x16 engine-built "
    "VP8L gradients through resize_images(out_format='webp') "
    "(nearest-neighbor -> 8x8 VP8L re-encode), decoded back and the "
    "RGB channels summed — nearest-neighbor is exact index math "
    "(ys = 2i, xs = 2j), so the oracle replays the selected pixels "
    "with integer arithmetic alone",
)
def q_mm_webp_resize_pixel_sum(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.transforms import resize_images

    def kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rows.append(
                    (did, webp.encode_webp_lossless(_rgb_gradient(did, 16, 16)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    resized = resize_images(payloads, width=8, height=8, out_format="webp")

    def sum_kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["resized"]):
                arr = webp.decode_webp(bytes(payload))
                rows.append((int(did), int(arr[:, :, :3].sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "pixel_sum"])

    return resized.select("doc_id", "resized").mapInPandas(
        sum_kern, "doc_id long, pixel_sum long"
    )


@stage(
    "mm_anim_frame_timeline",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST((2 + doc_id % 3) * (1 + doc_id % 2) AS BIGINT) AS n_sampled,
           CAST(((2 + doc_id % 3) * (1 + doc_id % 2) - 1) * 100 AS BIGINT)
             AS max_ts_ms
    FROM documents WHERE doc_id % 50 = 0
    """,
    "animated-WebP frame sampling as a driver row: per-doc VP8X+ANMF "
    "animations (2-4 frames, 100/200 ms durations) built by "
    "encode_webp_animation, sampled by transforms.sample_frames at "
    "100 ms ticks over the REAL container timeline (webp_frames + "
    "native VP8L frame decode); the oracle replays the timeline "
    "arithmetic: n_sampled = total_ms / 100 = n_frames * dur_units",
)
def q_mm_anim_frame_timeline(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.transforms import sample_frames

    def kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 2 + did % 3
                dur = 100 * (1 + did % 2)
                frames = [
                    (_rgb_gradient(did + 7 * k, 4, 4), dur) for k in range(n)
                ]
                rows.append((did, webp.encode_webp_animation(frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    return (
        sample_frames(payloads, every_ms=100, max_frames=8)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_ts_ms").alias("max_ts_ms"),
        )
    )


@stage(
    "dedup_clusters_hybrid_escalation",
    """
    SELECT CAST(doc_id AS BIGINT) AS node,
           CAST((SELECT min(doc_id) FROM documents
                 WHERE doc_id % 10 = 0 AND doc_id < 320)
                AS BIGINT) AS cluster_id
    FROM documents WHERE doc_id % 10 = 0 AND doc_id < 320
    UNION ALL
    SELECT CAST(10000000 + d.doc_id * 10 + u.k AS BIGINT) AS node,
           CAST(10000000 + d.doc_id * 10 AS BIGINT) AS cluster_id
    FROM (SELECT doc_id FROM documents WHERE doc_id % 70 = 0) d,
         unnest(generate_series(0, 3)) AS u(k)
    """,
    "the r9 hybrid CC escalation as a driver row: a mixed graph (a "
    "32-node chain — fixed size, so the adversarial diameter is "
    "SF-independent — plus 4-cliques on "
    "synthetic ids per 70th doc, scaling with the data) forced down "
    "the label path with patience=2 — label converges the cliques, "
    "the chain defeats it, escalation contracts to the quotient and "
    "solves it under the driver gate (dedup/cluster.py), and the composed "
    "labelling must equal the component minima the oracle derives "
    "from the construction (chain -> min chain id, clique -> its "
    "block min)",
)
def q_dedup_clusters_hybrid_escalation(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.dedup.cluster import connected_components

    chain_nodes = _doc_ids(spark, sf_dir, modulo=10).where(
        F.col("doc_id") < 320
    )
    w = Window.orderBy("doc_id")
    chain = (
        chain_nodes.select(
            F.col("doc_id").alias("doc_a"),
            F.lead("doc_id").over(w).alias("doc_b"),
        )
        .where(F.col("doc_b").isNotNull())
    )
    clique_base = _doc_ids(spark, sf_dir, modulo=70).select(
        (F.lit(10_000_000) + F.col("doc_id") * 10).alias("base")
    )
    ks = spark.range(4).select(F.col("id").alias("k"))
    members = clique_base.crossJoin(ks).select(
        "base", (F.col("base") + F.col("k")).alias("node")
    )
    cliques = (
        members.alias("x")
        .join(members.alias("y"), "base")
        .where(F.col("x.node") < F.col("y.node"))
        .select(
            F.col("x.node").alias("doc_a"), F.col("y.node").alias("doc_b")
        )
    )
    pairs = chain.unionByName(cliques)
    return connected_components(
        pairs, algorithm="label", max_iter=50, patience=2
    ).select(
        F.col("node").cast("long").alias("node"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


@stage(
    "mm_phash_real_pixels",
    """
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
    cells AS (SELECT unnest(generate_series(0, 63)) AS i),
    g AS (
      SELECT ids.doc_id, cells.i,
             ('0x' || substr(md5('apx|' || CAST(ids.doc_id AS VARCHAR)
                || '|' || CAST(cells.i AS VARCHAR)), 1, 2))::BIGINT AS b
      FROM ids CROSS JOIN cells
    ),
    gp AS (
      SELECT doc_id, i, b,
             CASE WHEN i IN (5, 17, 42) THEN (b + 37) % 256 ELSE b END AS p
      FROM g
    ),
    tot AS (SELECT doc_id, sum(b) AS tb, sum(p) AS tp
            FROM gp GROUP BY doc_id),
    h AS (
      SELECT gp.doc_id,
             sum(CASE WHEN (gp.b * 64 >= t.tb) <> (gp.p * 64 >= t.tp)
                 THEN 1 ELSE 0 END) AS hh
      FROM gp JOIN tot t ON gp.doc_id = t.doc_id
      GROUP BY gp.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(3 + CASE WHEN hh <= 6 THEN 3 ELSE 0 END AS BIGINT)
             AS n_pairs,
           CAST(3 + CASE WHEN hh = 0 THEN 3 ELSE 0 END AS BIGINT) AS n_h0,
           CAST(CASE WHEN hh <= 6 THEN hh ELSE 0 END AS BIGINT) AS pert_h
    FROM h
    """,
    "REAL pixels through perceptual-hash dedup (VERDICT r9 next-round "
    "#3): per doc, one md5-derived 8x8 grid rendered as a 64x64 block-"
    "constant image and engine-ENCODED into three lossless containers "
    "(BMP, VP8L WebP, RGB PNG) plus a BMP whose cells 5/17/42 are "
    "perturbed (+37 mod 256); real_pixels decodes each container "
    "natively and area-means back to the grid (multimodal/phash.py), "
    "and phash_neardup_pairs must find every re-encoded variant pair "
    "at hamming 0 — the thing the md5 stand-in can never do — plus the "
    "perturbed variant iff its aHash is within 6 bits. The oracle "
    "replays grid, threshold, and hamming in pure SQL (integer luma of "
    "an equal-RGB image is the identity; block area-mean of a block-"
    "constant image is exact)",
)
def q_mm_phash_real_pixels(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.phash import phash_neardup_pairs, real_pixels

    def kern(batches):
        import hashlib
        import struct
        import zlib

        import numpy as np

        from kenshin_spark.multimodal import codecs, webp

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def png_rgb(img):
            h, w, _ = img.shape
            raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
            )

        def block_image(grid):
            g = np.asarray(grid, dtype=np.uint8).reshape(8, 8)
            img = np.kron(g, np.ones((8, 8), dtype=np.uint8))
            return np.repeat(img[:, :, None], 3, axis=2)

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                grid = [
                    int(hashlib.md5(f"apx|{did}|{i}".encode())
                        .hexdigest()[:2], 16)
                    for i in range(64)
                ]
                pert = [
                    (v + 37) % 256 if i in (5, 17, 42) else v
                    for i, v in enumerate(grid)
                ]
                base = block_image(grid)
                rows += [
                    (did * 10 + 0, bytearray(codecs.encode_bmp(base))),
                    (did * 10 + 1,
                     bytearray(webp.encode_webp_lossless(base))),
                    (did * 10 + 2, bytearray(png_rgb(base))),
                    (did * 10 + 3,
                     bytearray(codecs.encode_bmp(block_image(pert)))),
                ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    images = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    pairs = phash_neardup_pairs(real_pixels(images), max_hamming=6)
    return (
        pairs.groupBy(F.floor(F.col("doc_a") / 10).alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("hamming") == 0).cast("long")).alias("n_h0"),
            F.max("hamming").alias("pert_h"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_h0").cast("long").alias("n_h0"),
            F.col("pert_h").cast("long").alias("pert_h"),
        )
    )


@stage(
    "store_manifest_snapshot_lifecycle",
    None,  # placeholder — real oracle set below (needs the r8 fragment)
)
def q_store_manifest_snapshot_lifecycle(spark, sf_dir):
    import os
    import time

    from kenshin_spark.queries_staged_r8_engine import (
        _BANK,
        _week_slots,
        _workdir,
        DAY1_END,
    )
    from kenshin_spark.store import ParquetTieredStore

    st = ParquetTieredStore(
        spark,
        _BANK,
        os.path.join(
            _workdir(sf_dir, "store_manifest_snapshot_lifecycle"), "store"
        ),
        mode="mor",
        commit_protocol="manifest",
    )
    slots = _week_slots(spark, sf_dir).localCheckpoint(eager=True)
    st.upsert(0, slots.where(F.col("ts") % 120 == 0))
    st.upsert(0, slots.where(F.col("ts") % 120 == 60))
    # fold the first two day partitions' append logs (logical replace —
    # the superseded files stay on disk until vacuum)
    st.compact(0, days=st._live_days(0)[:2])
    # logical expiry of day 0 (Jan 1): one manifest transaction, no
    # physical delete; then vacuum reclaims every retired file
    st.expire(now=DAY1_END + 90 * 86400)
    st.vacuum(grace_s=0.0, now=time.time() + 60)
    return st.read(0)


def _set_manifest_oracle():
    from kenshin_spark.queries_staged_r8_engine import _W, DAY1_END

    spec = STAGED_R11["store_manifest_snapshot_lifecycle"]
    STAGED_R11["store_manifest_snapshot_lifecycle"] = QuerySpec(
        fn=spec.fn,
        oracle=(
            f"WITH {_W} SELECT metric, ts, value FROM t0 "
            f"WHERE ts >= {DAY1_END}"
        ),
        doc=(
            "the manifest-log commit backend's full lifecycle as a "
            "driver row (VERDICT r9 next-round #2): mor upserts in two "
            "stamped appends, a two-day log fold committed as one "
            "manifest transaction, LOGICAL retention expiry of day 0 "
            "(a manifest drop — files persist for readers mid-scan), "
            "then vacuum physically reclaims every retired file; the "
            "read back — planned from the committed file list, never a "
            "directory listing — must equal the week's LWW grid minus "
            "the expired day (kenshin_spark/commit.py "
            "ManifestCommitProtocol, store.py manifest branches)"
        ),
    )


_set_manifest_oracle()


@stage(
    "mm_resize_jvm_pixel_sum",
    """
    WITH ijc AS (
      SELECT a.i, b.j, c.c
      FROM (SELECT unnest(generate_series(0, 7)) AS i) a
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) b
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) c
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(sum((d.doc_id + 62 * ijc.i + 34 * ijc.j + 5 * ijc.c) % 256)
                AS BIGINT) AS pixel_sum,
           CAST(1 AS BIGINT) AS same_as_native
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 = 0) d
    CROSS JOIN ijc
    GROUP BY d.doc_id
    """,
    "the JVM bulk-decode path oracle-pinned (VERDICT r10 item 5): "
    "16x16 engine-encoded BMP gradients through "
    "resize_images(decoder='jvm') — spill once, executor-side "
    "javax.imageio decode via Spark's image source, shared numpy "
    "nearest-neighbor kernel, native re-encode — decoded back and the "
    "RGB channels summed; nearest-neighbor is exact index math "
    "(ys = 2i, xs = 2j) so the oracle replays the selected pixels "
    "with integer arithmetic, and the row ALSO pins bit-exact "
    "equivalence to the native decoder (same_as_native = md5 match "
    "per doc — the tests/test_jvm_decode.py invariant as a driver "
    "row; multimodal/transforms.py _resize_images_jvm)",
)
def q_mm_resize_jvm_pixel_sum(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.transforms import resize_images

    def kern(batches):
        from kenshin_spark.multimodal import codecs

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rows.append(
                    (did, codecs.encode_bmp(_rgb_gradient(did, 16, 16)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    jvm = resize_images(
        payloads, width=8, height=8, out_format="bmp", decoder="jvm",
        observation="image_resize_jvm",
    )
    native = resize_images(
        payloads, width=8, height=8, out_format="bmp",
        observation="image_resize_native",
    )

    def sum_kern(batches):
        from kenshin_spark.multimodal import codecs

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["resized"]):
                arr = codecs.decode_bmp(bytes(payload))
                rows.append((int(did), int(arr[:, :, :3].sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "pixel_sum"])

    sums = jvm.select("doc_id", "resized").mapInPandas(
        sum_kern, "doc_id long, pixel_sum long"
    )
    equiv = (
        jvm.select("doc_id", F.col("resize_md5").alias("md5_jvm"))
        .join(
            native.select(
                "doc_id", F.col("resize_md5").alias("md5_native")
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            (F.col("md5_jvm") == F.col("md5_native"))
            .cast("long")
            .alias("same_as_native"),
        )
    )
    return sums.join(equiv, "doc_id").select(
        "doc_id", "pixel_sum", "same_as_native"
    )


_BIGINT_CASTS = {
    "sketch_kmv_overlap_types": ("n_both",),
    "sketch_kmv_overlap_days": ("n_both",),
    "mm_resize_nearest_sum": ("pixel_sum",),
    "text_vocab_coverage_curve": ("n_occurrences",),
    "text_length_gini": ("total_chars",),
    "emb_dim_sign_profile": ("n_pos", "n_neg", "n_zero",),
    "q_supplier_balance_outliers": ("n_low_outliers", "n_high_outliers",),
    "q_region_revenue_share": ("share_ppm",),
    "ts_slot_alignment_audit": ("n_aligned", "n_unaligned",),
    "text_hapax_by_source": ("n_hapax",),
    "sketch_histogram_tail_mass": ("n_values", "n_overflow",),
}
apply_bigint_casts(STAGED_R11, _BIGINT_CASTS)
