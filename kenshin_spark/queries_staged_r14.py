"""Tenth staged bank — ROUND 14: the PQ rerank recall audit completing
the ANN audit family, histogram width sensitivity, store propagate
edge cases, and profiling/conservation rows.

Same staging mechanism and gate (``tests/test_queries_staged_r14.py``)
as the earlier banks. Promote with
``python tools/promote_staged.py queries_staged_r14`` once round 13's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QUERIES as _REG
from kenshin_spark.queries import PTS, QuerySpec, _points

STAGED_R14: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R14[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "sim_pq_rerank_gain_audit",
    f"""
    WITH ex AS (SELECT query_id, neighbor_id FROM
                  ({_REG["sim_topk_bruteforce"].oracle}) a),
    pq AS (SELECT query_id, neighbor_id FROM
             ({_REG["sim_topk_pq"].oracle}) b),
    rr AS (SELECT query_id, neighbor_id FROM
             ({_REG["sim_topk_pq_rerank"].oracle}) c)
    SELECT ex.query_id,
           CAST(sum(CASE WHEN pq.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS pq_hits,
           CAST(sum(CASE WHEN rr.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS rerank_hits
    FROM ex
    LEFT JOIN pq ON pq.query_id = ex.query_id
                AND pq.neighbor_id = ex.neighbor_id
    LEFT JOIN rr ON rr.query_id = ex.query_id
                AND rr.neighbor_id = ex.neighbor_id
    GROUP BY 1
    """,
    "the PQ rerank gain, measured: recall@10 of raw product-"
    "quantized top-k vs the exact-rerank-over-PQ-candidates variant, "
    "against the brute-force truth per query — the number that "
    "justifies paying the rerank's exact-distance pass; completes the "
    "per-method ANN audit family (LSH r9, IVF r10, int8 r11)",
)
def q_sim_pq_rerank_gain_audit(spark, sf_dir):
    ex = _REG["sim_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    pq = _REG["sim_topk_pq"].fn(spark, sf_dir).select(
        F.col("query_id").alias("pq_q"), F.col("neighbor_id").alias("pq_n")
    )
    rr = _REG["sim_topk_pq_rerank"].fn(spark, sf_dir).select(
        F.col("query_id").alias("rr_q"), F.col("neighbor_id").alias("rr_n")
    )
    j = ex.join(
        pq,
        (F.col("pq_q") == F.col("query_id"))
        & (F.col("pq_n") == F.col("neighbor_id")),
        "left",
    ).join(
        rr,
        (F.col("rr_q") == F.col("query_id"))
        & (F.col("rr_n") == F.col("neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.sum(F.col("pq_n").isNotNull().cast("long")).alias("pq_hits"),
        F.sum(F.col("rr_n").isNotNull().cast("long")).alias(
            "rerank_hits"
        ),
    )


def _hist_p95_at(bins: int) -> str:
    width = 512.0 / bins
    return f"""
    SELECT CAST({bins} AS BIGINT) AS bins,
           round(CASE WHEN b <= 0 THEN 0.0 WHEN b >= {bins + 1} THEN 512.0
                      ELSE 0.0 + (b - 1) * {width} END, 6) AS p95
    FROM (
      WITH cells AS (
        SELECT CASE WHEN value < 0.0 THEN 0
                    WHEN value >= 512.0 THEN {bins + 1}
                    ELSE CAST(floor((value - 0.0) / {width}) + 1 AS INT)
               END AS bucket,
               count(*) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
      ),
      cum AS (
        SELECT bucket,
               sum(c) OVER (ORDER BY bucket) AS _cum,
               sum(c) OVER () AS _tot
        FROM cells
      )
      SELECT min(bucket) AS b FROM cum WHERE _cum >= 0.95 * _tot
    ) z
    """


@stage(
    "sketch_histogram_width_sensitivity",
    " UNION ALL ".join(_hist_p95_at(b) for b in (32, 128, 512)),
    "histogram resolution sizing: the global p95 estimate at 32/128/"
    "512 bins over the same [0,512) range — the estimate sharpens by "
    "bin width (left-edge error <= one bin), the measured curve that "
    "picks the cell budget; every width replays exactly (powers of "
    "two keep edges binary-exact)",
)
def q_sketch_histogram_width_sensitivity(spark, sf_dir):
    from kenshin_spark.functions.sketches import (
        histogram_quantile,
        histogram_sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    out = None
    for bins in (32, 128, 512):
        cells = histogram_sketches(
            ev, "value", lo=0.0, hi=512.0, bins=bins
        )
        p = histogram_quantile(
            cells, 0.95, lo=0.0, hi=512.0, bins=bins
        ).select(
            F.lit(bins).cast("long").alias("bins"),
            F.round(F.col("q0_95"), 6).alias("p95"),
        )
        out = p if out is None else out.unionByName(p)
    return out


@stage(
    "q_events_value_sum_conservation",
    """
    WITH per_type AS (
      SELECT event_type,
             sum(CAST(value AS DECIMAL(18,6))) AS s
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    whole AS (
      SELECT sum(CAST(value AS DECIMAL(18,6))) AS s FROM events
      WHERE value IS NOT NULL
    )
    SELECT round(CAST((SELECT sum(s) FROM per_type) AS DOUBLE), 6)
             AS sum_of_groups,
           round(CAST((SELECT s FROM whole) AS DOUBLE), 6)
             AS global_sum,
           (SELECT sum(s) FROM per_type) = (SELECT s FROM whole)
             AS conserved
    FROM (SELECT 1) one
    """,
    "aggregation conservation under DECIMAL accumulation: the sum of "
    "per-type sums equals the global sum EXACTLY (boolean-pinned, not "
    "just displayed) — the partition-invariance guarantee float sums "
    "cannot make, demonstrated as a driver row",
)
def q_q_events_value_sum_conservation(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    per_type = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s")
    )
    groups = per_type.agg(F.sum("s").alias("gsum"))
    whole = ev.agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("wsum")
    )
    return groups.crossJoin(whole).select(
        F.round(F.col("gsum").cast("double"), 6).alias("sum_of_groups"),
        F.round(F.col("wsum").cast("double"), 6).alias("global_sum"),
        (F.col("gsum") == F.col("wsum")).alias("conserved"),
    )


@stage(
    "ts_minute_of_hour_profile",
    f"""
    WITH pts AS ({PTS})
    SELECT metric,
           CAST(ts // 60 % 60 AS BIGINT) AS minute,
           count(*) AS n_points
    FROM pts GROUP BY 1, 2
    """,
    "minute-of-hour cadence per metric — cron fingerprinting one "
    "level below the hour profile (a :00/:30 spike means scheduled "
    "collection); integer modulo only",
)
def q_ts_minute_of_hour_profile(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        "metric",
        ((F.col("ts") / 60).cast("long") % 60).alias("minute"),
    ).agg(F.count(F.lit(1)).alias("n_points"))


@stage(
    "q_nation_avg_order_value",
    """
    SELECT n.n_name,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE) / count(*) * 100) / 100 AS avg_order_value
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
    "average order value per nation: DECIMAL-summed totals divided "
    "once with the cent-scale rounding guard — the AOV table, nation "
    "dim broadcast",
)
def q_q_nation_avg_order_value(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .cast("double")
                    / F.count(F.lit(1))
                    * 100
                )
                / 100
            ).alias("avg_order_value"),
        )
    )


@stage(
    "text_doc_vocab_bands",
    r"""
    WITH d AS (
      SELECT doc_id,
             len(list_distinct(
               string_split_regex(trim(lower(text)), '\s+'))) AS n_types
      FROM documents
    )
    SELECT CAST(n_types // 25 AS BIGINT) AS vocab_band,
           count(*) AS n_docs
    FROM d GROUP BY 1
    """,
    "per-document vocabulary size histogram (distinct tokens banded "
    "by 25) — the lexical-richness distribution behind type-token "
    "curves; integer distinct counts",
)
def q_text_doc_vocab_bands(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_types = F.size(
        F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
    )
    return docs.select(
        F.floor(n_types / 25).cast("long").alias("vocab_band")
    ).groupBy("vocab_band").agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# Batch 2: store propagate-after-delete, user first-week profile,
# token suffixes, peak minute, supplier balance rank percentile,
# shared-opener sources, event value round-number bias, order priority
# share of value.
# --------------------------------------------------------------------------

from kenshin_spark.queries_staged_r8_engine import (  # noqa: E402
    _W,
    _store,
    _week_slots,
)


@stage(
    "store_propagate_after_delete",
    f"""
    WITH {_W}
    SELECT metric, ts - ts % 300 AS ts, max(value) AS value
    FROM t0 WHERE metric <> 'click' GROUP BY 1, 2
    """,
    "maintenance ordering: delete a metric FIRST, then propagate the "
    "cascade — tier1 must build from the post-delete tier0 (no ghost "
    "rows resurrected from the deleted metric's slots); the oracle "
    "computes the cascade over the surviving metrics",
)
def q_store_propagate_after_delete(spark, sf_dir):
    st = _store(spark, sf_dir, "store_prop_after_del")
    slots = _week_slots(spark, sf_dir).localCheckpoint(eager=True)
    st.upsert(0, slots)
    st.delete_metrics(["click"])
    st.propagate(
        slots.where(F.col("metric") != "click").select("metric", "ts")
    )
    return st.read(1)


@stage(
    "q_user_first_week_profile",
    """
    WITH f AS (
      SELECT user_id,
             min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_ts
      FROM events GROUP BY 1
    )
    SELECT e.user_id,
           count(*) AS n_first_week_events,
           count(DISTINCT e.event_type) AS n_types_tried
    FROM events e JOIN f ON f.user_id = e.user_id
    WHERE CAST(floor(epoch(e.ts)) AS BIGINT) < f.first_ts + 604800
    GROUP BY 1
    """,
    "onboarding intensity: each user's activity volume and type "
    "breadth inside their FIRST week — the early-engagement features "
    "a churn model trains on; first-touch join, integer arithmetic",
)
def q_q_user_first_week_profile(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts"),
    )
    f = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = ev.join(f, "user_id").where(
        F.col("ts") < F.col("first_ts") + 604800
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_first_week_events"),
        F.countDistinct("event_type").alias("n_types_tried"),
    )


@stage(
    "text_token_suffix_profile",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    )
    SELECT substr(tok, length(tok), 1) AS last_letter,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct
    FROM toks WHERE tok <> '' GROUP BY 1
    """,
    "token suffix profile: last-letter distribution with per-letter "
    "vocabulary — the morphology tail (plural/verb endings) that "
    "complements the first-letter trie profile",
)
def q_text_token_suffix_profile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    return toks.groupBy(
        F.substring(F.col("tok"), -1, 1).alias("last_letter")
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )


@stage(
    "q_events_peak_minute",
    """
    SELECT minute, n_events FROM (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute,
             count(*) AS n_events,
             row_number() OVER (
               ORDER BY count(*) DESC,
                        CAST(floor(epoch(ts)) AS BIGINT) // 60) AS rnk
      FROM events GROUP BY 1
    ) t WHERE rnk <= 5
    """,
    "the five busiest minutes of the stream — the burst events a "
    "postmortem zooms into; epoch-minute bucketing with a minute "
    "tie-break",
)
def q_q_events_peak_minute(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        (F.unix_timestamp("ts").cast("long") / 60)
        .cast("long")
        .alias("minute")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.col("n_events").desc(), F.col("minute"))
    return (
        m.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("minute", "n_events")
    )


@stage(
    "q_supplier_balance_rank_pct",
    """
    WITH r AS (
      SELECT s_suppkey, s_acctbal,
             row_number() OVER (ORDER BY s_acctbal, s_suppkey) AS rnk,
             count(*) OVER () AS n
      FROM supplier
    )
    SELECT s_suppkey, s_acctbal,
           (rnk - 1) * 1000000 // (n - 1) AS rank_ppm
    FROM r WHERE rnk <= 3 OR rnk > n - 3
    """,
    "balance rank percentile for the three poorest and three richest "
    "suppliers: integer rank-ppm ((rank-1)/(n-1), floor-scaled) — the "
    "percentile arithmetic a scorecard shows without float division",
)
def q_q_supplier_balance_rank_pct(spark, sf_dir):
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    r = s.select(
        "s_suppkey", "s_acctbal",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    return (
        r.where((F.col("rnk") <= 3) | (F.col("rnk") > F.col("n") - 3))
        .select(
            "s_suppkey", "s_acctbal",
            F.expr("(rnk - 1) * 1000000 DIV (n - 1)").alias("rank_ppm"),
        )
    )


@stage(
    "text_shared_openers_by_source",
    r"""
    WITH f AS (
      SELECT source,
             string_split_regex(trim(lower(text)), '\s+')[1] AS opener
      FROM documents
    ),
    x AS (
      SELECT opener, count(DISTINCT source) AS n_sources
      FROM f GROUP BY 1
    )
    SELECT CAST(n_sources AS BIGINT) AS n_sources,
           count(*) AS n_openers
    FROM x GROUP BY 1
    """,
    "opener-sharing profile: how many sources each first-token "
    "appears in, histogrammed — cross-source boilerplate shows up as "
    "openers shared by every provider; integer distinct counts",
)
def q_text_shared_openers_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "source",
        F.element_at(F.split(F.trim(F.lower("text")), r"\s+"), 1).alias(
            "opener"
        ),
    )
    x = f.groupBy("opener").agg(
        F.countDistinct("source").alias("n_sources")
    )
    return x.groupBy(
        F.col("n_sources").cast("long").alias("n_sources")
    ).agg(F.count(F.lit(1)).alias("n_openers"))


@stage(
    "q_events_round_value_bias",
    """
    SELECT event_type,
           count(value) AS n_values,
           sum(CASE WHEN CAST(value AS BIGINT) % 10 = 0
                     AND value = floor(value) THEN 1 ELSE 0 END)
             AS n_round10,
           sum(CASE WHEN value = floor(value)
                     AND CAST(value AS BIGINT) % 10 = 0
                    THEN 1 ELSE 0 END) * 1000000 // count(value)
             AS round10_ppm
    FROM events WHERE value IS NOT NULL AND value >= 0
    GROUP BY 1
    """,
    "round-number bias: whole multiples of 10 among event values "
    "(human-entered or defaulted data clusters on round numbers; "
    "organic measurements don't) — the synthetic-data tell; exact "
    "float predicates folded to integers",
)
def q_q_events_round_value_bias(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    is_round = (
        (F.col("value") == F.floor("value"))
        & (F.col("value").cast("long") % 10 == 0)
    ).cast("long")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.sum(is_round).alias("n_round10"),
        F.floor(F.sum(is_round) * 1000000 / F.count("value"))
        .cast("long")
        .alias("round10_ppm"),
    )


@stage(
    "q_priority_value_share",
    """
    WITH p AS (
      SELECT o_orderpriority,
             CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    t AS (SELECT sum(cents) AS total FROM p)
    SELECT p.o_orderpriority,
           p.cents * 1000000 // t.total AS value_share_ppm
    FROM p, t
    """,
    "order value share by priority in integer cents (DECIMAL sum -> "
    "floor cents -> floor-divided ppm, the full money discipline) — "
    "does URGENT carry the revenue or just the noise",
)
def q_q_priority_value_share(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    p = orders.groupBy("o_orderpriority").agg(
        F.floor(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
        ).cast("long").alias("cents")
    )
    t = p.agg(F.sum("cents").alias("total"))
    return p.crossJoin(F.broadcast(t)).select(
        "o_orderpriority",
        F.expr("cents * 1000000 DIV total").alias("value_share_ppm"),
    )


# --------------------------------------------------------------------------
# Batch 3: store glob selective fetch, token-length x lang matrix,
# event value extremes report, customer region share, order-line
# revenue rank, hour-of-week heat.
# --------------------------------------------------------------------------

from kenshin_spark.queries_staged_r8_engine import (  # noqa: E402
    CUT,
    _grid_sql,
)


@stage(
    "store_fetch_brace_glob",
    f"""
    WITH {_W}, now_t AS (SELECT {CUT} AS now),
    tier AS (SELECT metric, ts, value FROM t0),
    {_grid_sql("now - 7200", "now", 60,
               "SELECT unnest(['click', 'view']) AS metric")}
    """,
    "M4 brace alternation against the persisted store: fetch_glob("
    "'{{click,view}}') resolves exactly those two series (the "
    "glob_to_regex alternation path) and grids the last two hours — "
    "the multi-select dashboards use constantly",
)
def q_store_fetch_brace_glob(spark, sf_dir):
    st = _store(spark, sf_dir, "store_brace_glob")
    st.upsert(0, _week_slots(spark, sf_dir))
    return st.fetch_glob("{click,view}", CUT - 7200, CUT, CUT)


@stage(
    "text_tok_len_lang_matrix",
    r"""
    WITH t AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS n_tok,
             length(text) AS n_chars
      FROM documents
    )
    SELECT lang,
           CAST(n_chars // n_tok AS BIGINT) AS chars_per_token_floor,
           count(*) AS n_docs
    FROM t GROUP BY 1, 2
    """,
    "mean-token-length bands per language via INTEGER floor division "
    "(chars // tokens — no float ratio) — the quality rule's "
    "mean_token_ok distribution made visible",
)
def q_text_tok_len_lang_matrix(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    t = docs.select(
        "lang",
        F.floor(F.length("text") / n_tok).cast("long").alias(
            "chars_per_token_floor"
        ),
    )
    return t.groupBy("lang", "chars_per_token_floor").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@stage(
    "q_events_extremes_report",
    """
    SELECT event_type,
           min(value) AS v_min,
           max(value) AS v_max,
           arg_min(user_id, value) AS min_user,
           arg_max(user_id, value) AS max_user
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
    "value extremes with attribution: the min/max values per type AND "
    "which user produced them (arg_min/arg_max — deterministic here "
    "because the extreme values are unique per type at these scales; "
    "min_by/arg_min parity is the point of the row)",
)
def q_q_events_extremes_report(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    return ev.groupBy("event_type").agg(
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.expr("min_by(user_id, value)").alias("min_user"),
        F.expr("max_by(user_id, value)").alias("max_user"),
    )


@stage(
    "q_customer_region_share",
    """
    WITH c AS (
      SELECT r.r_name, count(*) AS n_customers
      FROM customer cu
      JOIN nation n ON n.n_nationkey = cu.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1
    ),
    t AS (SELECT sum(n_customers) AS total FROM c)
    SELECT c.r_name, c.n_customers,
           c.n_customers * 1000000 // t.total AS share_ppm
    FROM c, t
    """,
    "customer base share per region as floor-scaled ppm — the "
    "market-footprint table, dims broadcast",
)
def q_q_customer_region_share(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    c = (
        cu.join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    t = c.agg(F.sum("n_customers").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "r_name", "n_customers",
        F.expr("n_customers * 1000000 DIV total").alias("share_ppm"),
    )


@stage(
    "q_order_line_revenue_rank",
    """
    SELECT l_orderkey, l_linenumber, cents FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))) * 100)
                  AS BIGINT) AS cents,
             row_number() OVER (
               ORDER BY CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))) DESC,
                        l_orderkey, l_linenumber) AS rnk
      FROM lineitem
    ) t WHERE rnk <= 10
    """,
    "the ten highest-revenue order lines: ranking on the EXACT "
    "decimal (display cents floored separately) with a composite key "
    "tie-break — top-N money queries without float ordering drift",
)
def q_q_order_line_revenue_rank(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    w = Window.orderBy(
        rev.desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.floor(rev * 100).cast("long").alias("cents"),
            F.row_number().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
        .drop("rnk")
    )


@stage(
    "q_events_hour_of_week_heat",
    """
    SELECT CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7
                AS BIGINT) AS dow,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24
                AS BIGINT) AS hour,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    "the 7x24 hour-of-week traffic heatmap on Thursday-anchored days "
    "— the staffing grid; one aggregate, integers",
)
def q_q_events_hour_of_week_heat(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("long")
    return ev.groupBy(
        (((epoch / 86400).cast("long") + 4) % 7).alias("dow"),
        ((epoch / 3600).cast("long") % 24).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))


# --------------------------------------------------------------------------
# Batch 4: two-sum stddev, availability by dow, whole-quantity audit,
# leap-day orders, token repeat bands, duplicate-ts audit, cent
# digits, vocab split jaccard, supplier part fan-out.
# --------------------------------------------------------------------------


@stage(
    "q_events_value_stddev_twosum",
    """
    SELECT event_type,
           count(value) AS n,
           round(sqrt(greatest(
             (sum(value * value) - sum(value) * sum(value) / count(value))
               / count(value), 0.0)) * 1000000) / 1000000 AS stddev_pop
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
    "population stddev per event type via the EXPLICIT two-sum "
    "formula (sum, sum-of-squares, one closing expression) — native "
    "stddev aggregates stream differently per engine, but writing the "
    "algebra out makes the float path op-for-op identical; the "
    "render layer's moving_stdev discipline at aggregate scope",
)
def q_q_events_value_stddev_twosum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    s1 = F.sum("value")
    s2 = F.sum(F.col("value") * F.col("value"))
    n = F.count("value")
    var = F.greatest((s2 - s1 * s1 / n) / n, F.lit(0.0))
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (F.round(F.sqrt(var) * 1000000) / 1000000).alias("stddev_pop"),
    )


@stage(
    "ts_availability_by_dow",
    f"""
    WITH pts AS ({PTS}),
    h AS (
      SELECT DISTINCT metric, ts // 3600 AS hr FROM pts
    )
    SELECT metric,
           CAST((hr // 24 + 4) % 7 AS BIGINT) AS dow,
           count(*) AS hours_up
    FROM h GROUP BY 1, 2
    """,
    "availability by day-of-week: distinct reporting hours per "
    "(metric, dow) on the Thursday-anchored grid — do weekend "
    "collectors sleep; integer slot arithmetic",
)
def q_ts_availability_by_dow(spark, sf_dir):
    pts = _points(spark, sf_dir)
    h = pts.select(
        "metric", (F.col("ts") / 3600).cast("long").alias("hr")
    ).distinct()
    return h.groupBy(
        "metric",
        (((F.col("hr") / 24).cast("long") + 4) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("hours_up"))


@stage(
    "q_lineitem_qty_whole_audit",
    """
    SELECT count(*) AS n_lines,
           sum(CASE WHEN l_quantity = floor(l_quantity)
                    THEN 1 ELSE 0 END) AS n_whole,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem
    """,
    "quantity typing audit: are all line quantities whole numbers "
    "(the TPC-H generator contract) plus the value envelope — the "
    "check that licenses casting the column to integer downstream",
)
def q_q_lineitem_qty_whole_audit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_quantity") == F.floor("l_quantity")).cast("long")
        ).alias("n_whole"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@stage(
    "q_orders_leap_day",
    """
    SELECT count(*) AS n_leap_day_orders,
           count(DISTINCT CAST(strftime(o_orderdate, '%Y') AS VARCHAR))
             AS n_leap_years
    FROM orders
    WHERE strftime(o_orderdate, '%m-%d') = '02-29'
    """,
    "calendar edge audit: orders dated February 29 and how many leap "
    "years carry them — the date-handling smoke every warehouse "
    "pipeline should pass (zero is a valid, verified answer)",
)
def q_q_orders_leap_day(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    leap = orders.where(
        F.date_format("o_orderdate", "MM-dd") == "02-29"
    )
    return leap.agg(
        F.count(F.lit(1)).alias("n_leap_day_orders"),
        F.countDistinct(F.date_format("o_orderdate", "yyyy")).alias(
            "n_leap_years"
        ),
    )


@stage(
    "text_max_token_repeat_bands",
    r"""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    m AS (
      SELECT doc_id, max(c) AS max_repeat FROM (
        SELECT doc_id, tok, count(*) AS c FROM t
        WHERE tok <> '' GROUP BY 1, 2
      ) x GROUP BY 1
    )
    SELECT CAST(max_repeat AS BIGINT) AS max_repeat,
           count(*) AS n_docs
    FROM m GROUP BY 1
    """,
    "intra-document repetition histogram: each doc's most-repeated "
    "token count — the repetition-filter threshold histogram "
    "(gibberish and keyword stuffing live in the tail); integer "
    "counts",
)
def q_text_max_token_repeat_bands(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    c = t.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    m = c.groupBy("doc_id").agg(F.max("c").alias("max_repeat"))
    return m.groupBy(
        F.col("max_repeat").cast("long").alias("max_repeat")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@stage(
    "ts_duplicate_ts_audit",
    f"""
    WITH pts AS ({PTS}),
    d AS (
      SELECT metric, ts, count(*) AS n FROM pts GROUP BY 1, 2
    )
    SELECT metric,
           count(*) AS n_timestamps,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS n_duplicated,
           CAST(max(n) AS BIGINT) AS max_depth
    FROM d GROUP BY 1
    """,
    "duplicate-timestamp audit on the RAW stream: how many exact "
    "(metric, ts) keys arrive more than once and the worst collision "
    "depth — the pre-LWW pressure gauge (every duplicate is an "
    "arrival-order resolution the align must make); integer counts",
)
def q_ts_duplicate_ts_audit(spark, sf_dir):
    pts = _points(spark, sf_dir)
    d = pts.groupBy("metric", "ts").agg(F.count(F.lit(1)).alias("n"))
    return d.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_timestamps"),
        F.sum((F.col("n") > 1).cast("long")).alias("n_duplicated"),
        F.max("n").cast("long").alias("max_depth"),
    )


@stage(
    "q_price_cent_digits",
    """
    SELECT CAST(CAST(floor(o_totalprice * 100) AS BIGINT) % 10
                AS BIGINT) AS cent_digit,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    "last-cent digit distribution of order totals — the pricing-"
    "artifact detector (a uniform spread means computed totals; "
    "spikes at 0/9 mean psychological pricing); integer cents "
    "arithmetic",
)
def q_q_price_cent_digits(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    digit = (
        F.floor(F.col("o_totalprice") * 100).cast("long") % 10
    ).cast("long")
    return orders.groupBy(digit.alias("cent_digit")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@stage(
    "text_vocab_split_jaccard",
    r"""
    WITH toks AS (
      SELECT doc_id % 2 AS half,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    v AS (SELECT DISTINCT half, tok FROM toks WHERE tok <> ''),
    a AS (SELECT tok FROM v WHERE half = 0),
    b AS (SELECT tok FROM v WHERE half = 1),
    i AS (SELECT count(*) AS n FROM a JOIN b ON b.tok = a.tok),
    u AS (
      SELECT count(DISTINCT tok) AS n FROM v
    )
    SELECT (SELECT count(*) FROM a) AS vocab_a,
           (SELECT count(*) FROM b) AS vocab_b,
           i.n AS vocab_shared,
           i.n * 1000000 // u.n AS jaccard_ppm
    FROM i, u
    """,
    "corpus self-consistency: vocabulary Jaccard between the even- "
    "and odd-doc halves — a homogeneous corpus splits with high "
    "overlap, a multi-domain mix doesn't; the split-half reliability "
    "check, floor-scaled ppm",
)
def q_text_vocab_split_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    v = toks.distinct()
    a = v.where(F.col("half") == 0).select("tok")
    b = v.where(F.col("half") == 1).select(F.col("tok").alias("tb"))
    shared = a.join(b, a.tok == b.tb).agg(
        F.count(F.lit(1)).alias("vocab_shared")
    )
    va = a.agg(F.count(F.lit(1)).alias("vocab_a"))
    vb = b.agg(F.count(F.lit(1)).alias("vocab_b"))
    un = v.select("tok").distinct().agg(F.count(F.lit(1)).alias("u"))
    return (
        va.crossJoin(vb).crossJoin(shared).crossJoin(un)
        .select(
            "vocab_a", "vocab_b", "vocab_shared",
            F.expr("vocab_shared * 1000000 DIV u").alias("jaccard_ppm"),
        )
    )


@stage(
    "q_supplier_part_fanout",
    """
    WITH s AS (
      SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_parts // 5 AS BIGINT) AS parts_band,
           count(*) AS n_suppliers
    FROM s GROUP BY 1
    """,
    "supplier catalog breadth: distinct parts shipped per supplier, "
    "banded by 5 — specialist vs generalist supplier mix; integer "
    "distinct counts",
)
def q_q_supplier_part_fanout(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )
    return s.groupBy(
        F.floor(F.col("n_parts") / 5).cast("long").alias("parts_band")
    ).agg(F.count(F.lit(1)).alias("n_suppliers"))


# --------------------------------------------------------------------------
# Final bank rows (to 50): first-vs-repeat value, daypart value,
# daily volume envelopes, brand size envelope, return rate by volume,
# same-minute depth, hourly global volume, year/priority share,
# opener-closer pairs, supplier-nation fan-out, shipdate envelopes,
# value-band priority matrix, bigram openers, stream share, nation
# ratios, error concentration, orderkey density, and friends.
# --------------------------------------------------------------------------


@stage(
    "q_first_vs_repeat_value",
    """
    WITH r AS (
      SELECT o_custkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rnk
      FROM orders
    )
    SELECT CASE WHEN rnk = 1 THEN 'first' ELSE 'repeat' END AS order_kind,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE) / count(*) * 100) / 100 AS avg_value
    FROM r GROUP BY 1
    """,
    "first-order vs repeat-order value: is the first basket bigger — "
    "per-customer (date, key)-ordered ranking, DECIMAL-summed "
    "averages with the cent rounding guard",
)
def q_q_first_vs_repeat_value(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    r = orders.withColumn("rnk", F.row_number().over(w))
    kind = F.when(F.col("rnk") == 1, "first").otherwise("repeat")
    return r.groupBy(kind.alias("order_kind")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1))
                * 100
            )
            / 100
        ).alias("avg_value"),
    )


@stage(
    "q_value_by_daypart",
    """
    SELECT CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24
                     BETWEEN 6 AND 11 THEN 'morning'
                WHEN CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24
                     BETWEEN 12 AND 17 THEN 'afternoon'
                WHEN CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24
                     BETWEEN 18 AND 23 THEN 'evening'
                ELSE 'night' END AS daypart,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_value
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
    "value flow by daypart: DECIMAL totals across the four trading "
    "windows — the intraday revenue cadence",
)
def q_q_value_by_daypart(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    hr = (F.unix_timestamp("ts").cast("long") / 3600).cast("long") % 24
    daypart = (
        F.when(hr.between(6, 11), "morning")
        .when(hr.between(12, 17), "afternoon")
        .when(hr.between(18, 23), "evening")
        .otherwise("night")
    )
    return ev.groupBy(daypart.alias("daypart")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value"),
    )


@stage(
    "ts_daily_volume_envelope",
    f"""
    WITH pts AS ({PTS}),
    d AS (
      SELECT metric, ts // 86400 AS day, count(*) AS n
      FROM pts GROUP BY 1, 2
    )
    SELECT metric,
           count(*) AS n_days,
           CAST(min(n) AS BIGINT) AS min_daily,
           CAST(max(n) AS BIGINT) AS max_daily,
           sum(n) AS total_points
    FROM d GROUP BY 1
    """,
    "daily ingest volume envelope per metric: min/max points per day "
    "and the active-day count — the flatness check a capacity "
    "forecast assumes; integer counts",
)
def q_ts_daily_volume_envelope(spark, sf_dir):
    pts = _points(spark, sf_dir)
    d = pts.groupBy(
        "metric", (F.col("ts") / 86400).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return d.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("n").cast("long").alias("min_daily"),
        F.max("n").cast("long").alias("max_daily"),
        F.sum("n").alias("total_points"),
    )


@stage(
    "q_brand_size_envelope",
    """
    SELECT p_brand,
           count(DISTINCT p_size) AS n_sizes,
           min(p_size) AS min_size,
           max(p_size) AS max_size
    FROM part GROUP BY 1
    """,
    "brand size range: distinct sizes and the envelope per brand — "
    "assortment depth in integers",
)
def q_q_brand_size_envelope(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_size").alias("n_sizes"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


@stage(
    "q_return_rate_by_qty_band",
    """
    SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_band,
           count(*) AS n_lines,
           sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             AS n_returned,
           sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
             // count(*) AS return_ppm
    FROM lineitem GROUP BY 1
    """,
    "return rate by order volume: do big lines come back more — "
    "floor-scaled ppm per quantity band",
)
def q_q_return_rate_by_qty_band(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ret = (F.col("l_returnflag") == "R").cast("long")
    return li.groupBy(
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_band")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(ret).alias("n_returned"),
        F.floor(F.sum(ret) * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("return_ppm"),
    )


@stage(
    "q_events_same_minute_depth",
    """
    WITH m AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(n AS BIGINT) AS events_in_minute,
           count(*) AS n_user_minutes
    FROM m GROUP BY 1
    """,
    "per-user-minute event depth histogram — the client-side batching "
    "fingerprint (depth >1 means bundled sends); integer counts",
)
def q_q_events_same_minute_depth(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "user_id",
        (F.unix_timestamp("ts").cast("long") / 60)
        .cast("long")
        .alias("minute"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return m.groupBy(
        F.col("n").cast("long").alias("events_in_minute")
    ).agg(F.count(F.lit(1)).alias("n_user_minutes"))


@stage(
    "ts_hourly_global_volume",
    f"""
    WITH pts AS ({PTS})
    SELECT CAST(ts // 3600 % 24 AS BIGINT) AS hour,
           count(*) AS n_points,
           count(DISTINCT metric) AS n_metrics
    FROM pts GROUP BY 1
    """,
    "global hour-of-day ingest profile: points and reporting metrics "
    "per hour — the fleet-wide load curve behind shard sizing",
)
def q_ts_hourly_global_volume(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        ((F.col("ts") / 3600).cast("long") % 24).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("metric").alias("n_metrics"),
    )


@stage(
    "q_year_priority_share",
    """
    WITH y AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS VARCHAR) AS year,
             o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    t AS (SELECT year, sum(n) AS total FROM y GROUP BY 1)
    SELECT y.year, y.o_orderpriority,
           y.n * 1000000 // t.total AS share_ppm
    FROM y JOIN t ON t.year = y.year
    """,
    "priority mix drift across years: floor-scaled share of each "
    "priority within its year — the policy-change detector",
)
def q_q_year_priority_share(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    y = orders.groupBy(
        F.date_format("o_orderdate", "yyyy").alias("year"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    t = y.groupBy("year").agg(F.sum("n").alias("total"))
    return y.join(t, "year").select(
        "year", "o_orderpriority",
        F.expr("n * 1000000 DIV total").alias("share_ppm"),
    )


@stage(
    "text_opener_closer_pairs",
    r"""
    WITH t AS (
      SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    p AS (
      SELECT toks[1] AS opener, toks[len(toks)] AS closer FROM t
    )
    SELECT opener, closer, n_docs FROM (
      SELECT opener, closer, count(*) AS n_docs,
             row_number() OVER (
               ORDER BY count(*) DESC, opener, closer) AS rnk
      FROM p GROUP BY 1, 2
    ) x WHERE rnk <= 10
    """,
    "top (first-token, last-token) pairs — template frames show up "
    "as repeated opener/closer combinations; deterministic "
    "(count, opener, closer) ranking",
)
def q_text_opener_closer_pairs(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    p = docs.select(
        F.element_at(toks, 1).alias("opener"),
        F.element_at(toks, -1).alias("closer"),
    )
    c = p.groupBy("opener", "closer").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.orderBy(
        F.col("n_docs").desc(), F.col("opener"), F.col("closer")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("opener", "closer", "n_docs")
    )


@stage(
    "q_supplier_nation_fanout",
    """
    WITH n AS (
      SELECT s_nationkey, count(*) AS n_suppliers
      FROM supplier GROUP BY 1
    )
    SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
           count(*) AS n_nations
    FROM n GROUP BY 1
    """,
    "suppliers-per-nation histogram — dimension balance in two "
    "grouped counts",
)
def q_q_supplier_nation_fanout(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return n.groupBy(
        F.col("n_suppliers").cast("long").alias("n_suppliers")
    ).agg(F.count(F.lit(1)).alias("n_nations"))


@stage(
    "q_shipdate_envelope_by_flag",
    """
    SELECT l_returnflag,
           CAST(min(l_shipdate) AS VARCHAR) AS first_ship,
           CAST(max(l_shipdate) AS VARCHAR) AS last_ship,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1
    """,
    "shipping-date envelope per return flag (stringified dates for "
    "cross-engine comparison) — the R-flag cutoff structure TPC-H "
    "bakes in, made visible",
)
def q_q_shipdate_envelope_by_flag(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_shipdate").cast("string").alias("first_ship"),
        F.max("l_shipdate").cast("string").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@stage(
    "q_value_band_priority_matrix",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS value_band,
           o_orderpriority,
           count(*) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
    "order value band x priority matrix: floor-banded totals crossed "
    "with priority — do expensive orders get expedited",
)
def q_q_value_band_priority_matrix(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.floor(F.col("o_totalprice") / 50000)
        .cast("long")
        .alias("value_band"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@stage(
    "text_bigram_openers",
    r"""
    WITH t AS (
      SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    p AS (
      SELECT toks[1] || ' ' || toks[2] AS opening_bigram FROM t
      WHERE len(toks) >= 2
    )
    SELECT opening_bigram, n_docs FROM (
      SELECT opening_bigram, count(*) AS n_docs,
             row_number() OVER (
               ORDER BY count(*) DESC, opening_bigram) AS rnk
      FROM p GROUP BY 1
    ) x WHERE rnk <= 10
    """,
    "top opening bigrams — the two-token template detector "
    "complementing the single-opener row",
)
def q_text_bigram_openers(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    p = docs.where(F.size(toks) >= 2).select(
        F.concat(
            F.element_at(toks, 1), F.lit(" "), F.element_at(toks, 2)
        ).alias("opening_bigram")
    )
    c = p.groupBy("opening_bigram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("opening_bigram"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("opening_bigram", "n_docs")
    )


@stage(
    "ts_stream_share_per_metric",
    f"""
    WITH pts AS ({PTS}),
    m AS (SELECT metric, count(*) AS n FROM pts GROUP BY 1),
    t AS (SELECT sum(n) AS total FROM m)
    SELECT m.metric, m.n AS n_points,
           m.n * 1000000 // t.total AS share_ppm
    FROM m, t
    """,
    "stream share per metric as floor-scaled ppm — the skew table "
    "the salted-LWW path consults before picking skew_salts",
)
def q_ts_stream_share_per_metric(spark, sf_dir):
    pts = _points(spark, sf_dir)
    m = pts.groupBy("metric").agg(F.count(F.lit(1)).alias("n_points"))
    t = m.agg(F.sum("n_points").alias("total"))
    return m.crossJoin(F.broadcast(t)).select(
        "metric", "n_points",
        F.expr("n_points * 1000000 DIV total").alias("share_ppm"),
    )


@stage(
    "q_nation_cust_supp_ratio",
    """
    WITH c AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT n.n_name,
           coalesce(c.n_cust, 0) AS n_customers,
           coalesce(s.n_supp, 0) AS n_suppliers,
           CASE WHEN coalesce(s.n_supp, 0) > 0
                THEN coalesce(c.n_cust, 0) * 1000 // s.n_supp
           END AS cust_per_supp_milli
    FROM nation n
    LEFT JOIN c ON c.nk = n.n_nationkey
    LEFT JOIN s ON s.nk = n.n_nationkey
    """,
    "customer-to-supplier ratio per nation in milli-units (integer "
    "floor division, NULL where a nation has no suppliers) — the "
    "demand/supply balance table off two dimension scans",
)
def q_q_nation_cust_supp_ratio(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cc = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    ss = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    j = (
        n.join(cc, n.n_nationkey == cc.nk, "left")
        .join(ss, n.n_nationkey == ss.nk, "left")
        .select(
            "n_name",
            F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
            F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
        )
    )
    return j.withColumn(
        "cust_per_supp_milli",
        F.when(
            F.col("n_suppliers") > 0,
            F.expr("n_customers * 1000 DIV n_suppliers"),
        ),
    )


@stage(
    "q_error_user_gini",
    """
    WITH u AS (
      SELECT user_id, count(*) AS n FROM events
      WHERE event_type = 'error' GROUP BY 1
    ),
    r AS (
      SELECT n, row_number() OVER (ORDER BY n, user_id) AS i FROM u
    ),
    s AS (SELECT count(*) AS k, sum(n) AS sx, sum(i * n) AS six FROM r)
    SELECT k AS n_users_with_errors, sx AS n_errors,
           CAST((2 * six - (k + 1) * sx) * 1000000 // (k * sx)
                AS BIGINT) AS gini_ppm
    FROM s
    """,
    "error concentration: is the error stream one broken client or "
    "everyone equally — the scaled-integer Gini over per-user error "
    "counts; the triage question, answered deterministically",
)
def q_q_error_user_gini(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    )
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    r = u.select(
        "n", F.row_number().over(Window.orderBy("n", "user_id")).alias("i")
    )
    s = r.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sx"),
        F.sum(F.col("i") * F.col("n")).alias("six"),
    )
    return s.select(
        F.col("k").alias("n_users_with_errors"),
        F.col("sx").alias("n_errors"),
        F.floor(
            (2 * F.col("six") - (F.col("k") + 1) * F.col("sx"))
            * 1000000
            / (F.col("k") * F.col("sx"))
        ).cast("long").alias("gini_ppm"),
    )


@stage(
    "q_orderkey_density_audit",
    """
    SELECT count(*) AS n_orders,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key,
           count(*) * 1000000 // (max(o_orderkey) - min(o_orderkey) + 1)
             AS density_ppm
    FROM orders
    """,
    "key-space density: orders vs the orderkey range they span "
    "(TPC-H deliberately leaves key gaps — the audit that catches a "
    "densely-reindexed copy masquerading as generator output); "
    "integer floor division",
)
def q_q_orderkey_density_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.expr(
            "count(*) * 1000000 DIV (max(o_orderkey) - min(o_orderkey)"
            " + 1)"
        ).alias("density_ppm"),
    )


@stage(
    "q_events_value_type_minmax_user",
    """
    WITH u AS (
      SELECT user_id, event_type,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS total_value
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type,
           min(total_value) AS min_user_total,
           max(total_value) AS max_user_total,
           count(*) AS n_users
    FROM u GROUP BY 1
    """,
    "per-type user-total envelope: the lightest and heaviest user "
    "totals per event type (DECIMAL-exact inner sums) — the spread "
    "behind the whale curve",
)
def q_q_events_value_type_minmax_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    u = ev.groupBy("user_id", "event_type").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value")
    )
    return u.groupBy("event_type").agg(
        F.min("total_value").alias("min_user_total"),
        F.max("total_value").alias("max_user_total"),
        F.count(F.lit(1)).alias("n_users"),
    )


@stage(
    "q_part_type_size_spread",
    """
    SELECT p_type,
           count(*) AS n_parts,
           CAST(max(p_size) - min(p_size) AS BIGINT) AS size_spread
    FROM part GROUP BY 1
    """,
    "size spread per part type — integer envelope widths over the "
    "catalog",
)
def q_q_part_type_size_spread(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.max("p_size") - F.min("p_size"))
        .cast("long")
        .alias("size_spread"),
    )


@stage(
    "q_events_multi_type_minutes",
    """
    WITH m AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute,
             count(DISTINCT event_type) AS n_types
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(n_types AS BIGINT) AS n_types,
           count(*) AS n_user_minutes
    FROM m GROUP BY 1
    """,
    "behavioural density: distinct event types inside a single "
    "user-minute, histogrammed — multi-type minutes are real "
    "engagement, single-type bursts are retries",
)
def q_q_events_multi_type_minutes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "user_id",
        (F.unix_timestamp("ts").cast("long") / 60)
        .cast("long")
        .alias("minute"),
    ).agg(F.countDistinct("event_type").alias("n_types"))
    return m.groupBy(
        F.col("n_types").cast("long").alias("n_types")
    ).agg(F.count(F.lit(1)).alias("n_user_minutes"))


@stage(
    "q_customer_name_number_gap",
    """
    SELECT count(*) AS n_customers,
           max(c_custkey) - count(*) AS key_gaps,
           min(c_custkey) AS min_key
    FROM customer
    """,
    "customer key continuity: gaps between the key range and the "
    "row count — the generator-vs-reindex audit for the customer "
    "dimension",
)
def q_q_customer_name_number_gap(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.max("c_custkey") - F.count(F.lit(1))).alias("key_gaps"),
        F.min("c_custkey").alias("min_key"),
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
    "q_events_round_value_bias": ("n_round10", "round10_ppm",),
    "q_priority_value_share": ("value_share_ppm",),
    "q_customer_region_share": ("share_ppm",),
    "q_lineitem_qty_whole_audit": ("n_whole",),
    "ts_duplicate_ts_audit": ("n_duplicated",),
    "ts_daily_volume_envelope": ("total_points",),
    "q_return_rate_by_qty_band": ("n_returned", "return_ppm",),
    "q_year_priority_share": ("share_ppm",),
    "ts_stream_share_per_metric": ("share_ppm",),
    "q_error_user_gini": ("n_errors",),
}
apply_bigint_casts(STAGED_R14, _BIGINT_CASTS)
