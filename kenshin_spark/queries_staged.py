"""Staged queries — oracle-verified now, registered NEXT round.

The driver evaluates a 50-slot window of never-verified queries per
round and this round's window is exactly full (see
``tests/test_contract.py``), so these entries are held OUT of
``queries.QUERIES`` until round 5 frees slots. They run through the same
``QuerySpec`` contract and the same Spark-vs-DuckDB gate
(``tests/test_queries_staged.py`` — the local replica of the driver
check), so promotion is a cut-and-paste of the registration block.

Float discipline is identical to queries.py: exact-integer/DECIMAL
arithmetic wherever a threshold or rank could flip, 6dp rounding on
display-only float outputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QuerySpec, _sql_query

STAGED: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# -- RFM segmentation -------------------------------------------------------

RFM_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(max(CAST(o_orderdate AS DATE)) AS STRING) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       last_order, frequency,
       round(CAST(monetary AS DOUBLE), 2) AS monetary,
       CAST(ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT)
         AS r_bucket,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT)
         AS f_bucket,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT)
         AS m_bucket
FROM cust
"""


@stage(
    "q_customer_rfm",
    RFM_SQL,
    "RFM segmentation: per-customer recency/frequency/monetary with "
    "ntile(5) buckets on each dimension — integer bucket boundaries with "
    "total (value, custkey) tie-break order so the quintiles are "
    "deterministic; windows run over the customer-level aggregate "
    "(small), never raw orders",
)
def q_customer_rfm(spark, sf_dir):
    return _sql_query(RFM_SQL, ("orders",))(spark, sf_dir)


# -- market basket ----------------------------------------------------------

BASKET_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, support FROM pairs WHERE support >= 3
"""


@stage(
    "q_market_basket",
    BASKET_SQL,
    "market-basket co-occurrence: part pairs appearing in >= 3 shared "
    "orders — the order-keyed self-join is bounded by per-order line "
    "counts (TPC-H max 7 lines/order => <= 21 pairs per order), so the "
    "pair fan-out is linear in orders, never all-pairs over parts; "
    "support threshold prunes before any wide output",
)
def q_market_basket(spark, sf_dir):
    return _sql_query(BASKET_SQL, ("lineitem",))(spark, sf_dir)


# -- event transition matrix ------------------------------------------------

TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@stage(
    "q_event_transitions",
    TRANSITIONS_SQL,
    "user-journey transition matrix: event-type bigrams per user in "
    "(ts, event_id) order — one lead window co-partitioned with the "
    "user key, then a matrix-sized count; the (ts, event_id) composite "
    "sort key makes simultaneous events deterministic",
)
def q_event_transitions(spark, sf_dir):
    return _sql_query(TRANSITIONS_SQL, ("events",))(spark, sf_dir)


# -- hapax/vocabulary concentration ----------------------------------------

HAPAX_SQL = r"""
WITH tok AS (
  SELECT tok FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
tf AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       CAST(sum(c) AS BIGINT) AS total_tokens,
       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS hapax_rate
FROM tf
"""

#: Spark variant: literal ``1.0`` is DECIMAL(2,1) in Spark (DOUBLE in
#: DuckDB), which would make the rate a decimal-typed column and break
#: the cross-engine dtype match — CAST the numerator explicitly.
HAPAX_SPARK_SQL = r"""
WITH tok AS (
  SELECT tok FROM (
    SELECT explode(split(trim(lower(text)), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
tf AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       CAST(sum(c) AS BIGINT) AS total_tokens,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_rate
FROM tf
"""


@stage(
    "text_hapax_rate",
    HAPAX_SQL,
    "vocabulary concentration: hapax-legomena fraction of the corpus "
    "vocabulary (the classic Zipf-tail health check before tokenizer "
    "training) — one explode + one vocab-sized count, then a scalar "
    "aggregate; the rate divides exact integers once",
)
def q_text_hapax_rate(spark, sf_dir):
    return _sql_query(HAPAX_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- event-type co-occurrence by user --------------------------------------

COOCCUR_SQL = """
WITH ue AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM ue a JOIN ue b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


@stage(
    "q_event_cooccurrence",
    COOCCUR_SQL,
    "event-type co-occurrence matrix: users performing both types, for "
    "every type pair — the user-keyed self-join fans out |types-per-"
    "user|^2 <= |types|^2 rows per user (types is a small fixed set), "
    "never users x users; output is matrix-sized",
)
def q_event_cooccurrence(spark, sf_dir):
    return _sql_query(COOCCUR_SQL, ("events",))(spark, sf_dir)


# -- largest inter-point gap per metric ------------------------------------

GAP_SQL = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts
  FROM events
),
d AS (
  SELECT metric, ts,
         ts - lag(ts) OVER (PARTITION BY metric ORDER BY ts) AS gap
  FROM (SELECT DISTINCT metric, ts FROM pts)
)
SELECT metric, CAST(gap AS BIGINT) AS max_gap_s,
       CAST(ts AS BIGINT) AS gap_end_ts
FROM (
  SELECT metric, ts, gap,
         row_number() OVER (
           PARTITION BY metric ORDER BY gap DESC, ts
         ) AS rn
  FROM d WHERE gap IS NOT NULL
) WHERE rn = 1
"""

GAP_SPARK_SQL = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(floor(unix_timestamp(ts)) AS BIGINT) AS ts
  FROM events
),
d AS (
  SELECT metric, ts,
         ts - lag(ts) OVER (PARTITION BY metric ORDER BY ts) AS gap
  FROM (SELECT DISTINCT metric, ts FROM pts)
)
SELECT metric, CAST(gap AS BIGINT) AS max_gap_s,
       CAST(ts AS BIGINT) AS gap_end_ts
FROM (
  SELECT metric, ts, gap,
         row_number() OVER (
           PARTITION BY metric ORDER BY gap DESC, ts
         ) AS rn
  FROM d WHERE gap IS NOT NULL
) WHERE rn = 1
"""


@stage(
    "ts_largest_gap",
    GAP_SQL,
    "largest ingest gap per metric (sensor-outage detection over RAW "
    "arrivals — the companion to grid-based flatline detection): one "
    "lag window co-partitioned with the metric; the winning gap is "
    "picked by an explicit (gap DESC, ts) row_number so equal-length "
    "gaps resolve identically in both engines",
)
def q_ts_largest_gap(spark, sf_dir):
    return _sql_query(GAP_SPARK_SQL, ("events",))(spark, sf_dir)


# -- price decile profile ---------------------------------------------------

DECILE_SQL = """
WITH d AS (
  SELECT CAST(ntile(10) OVER (
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
         ) AS BIGINT) AS decile,
         l_extendedprice, l_quantity
  FROM lineitem
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
         AS total_qty
FROM d GROUP BY decile
"""


@stage(
    "q_price_deciles",
    DECILE_SQL,
    "decile profile of line prices: global ntile(10) with a total "
    "(price, orderkey, linenumber) tie-break so bucket boundaries are "
    "deterministic, then per-decile stats — the single global sort is "
    "the documented cost (at 100 TB swap ntile for approx percentile "
    "cuts + a broadcast range join, same output contract)",
)
def q_price_deciles(spark, sf_dir):
    return _sql_query(DECILE_SQL, ("lineitem",))(spark, sf_dir)


# -- supplier/customer nation overlap --------------------------------------

OVERLAP_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name,
       CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers
FROM nation
LEFT JOIN supplier ON s_nationkey = n_nationkey
LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
HAVING count(DISTINCT s_suppkey) > 0 AND count(DISTINCT c_custkey) > 0
"""


@stage(
    "q_nation_coverage",
    OVERLAP_SQL,
    "nations with both supplier and customer presence — two broadcast "
    "dimension joins + multi-distinct aggregate (Catalyst expands to "
    "one Expand over the small joined set, not the fact tables)",
)
def q_nation_coverage(spark, sf_dir):
    return _sql_query(OVERLAP_SQL, ("nation", "supplier", "customer"))(
        spark, sf_dir
    )


# -- embedding dimension profile -------------------------------------------

DIM_PROFILE_SQL = """
SELECT t.dim,
       round(min(embedding[t.dim + 1]), 6) AS dim_min,
       round(max(embedding[t.dim + 1]), 6) AS dim_max,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings, range(64) t(dim)
GROUP BY t.dim
"""

DIM_PROFILE_SPARK_SQL = """
SELECT dim,
       round(min(v), 6) AS dim_min,
       round(max(v), 6) AS dim_max,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM (
  SELECT posexplode(embedding) AS (dim, v) FROM embeddings
)
GROUP BY dim
"""


@stage(
    "emb_dim_profile",
    DIM_PROFILE_SQL,
    "per-dimension embedding range profile (a collapsed or exploding "
    "dimension breaks quantizers before it breaks retrieval): "
    "posexplode + map-side-combined min/max — the exchange carries 64 "
    "rows per task regardless of corpus size",
)
def q_emb_dim_profile(spark, sf_dir):
    return _sql_query(DIM_PROFILE_SPARK_SQL, ("embeddings",))(spark, sf_dir)


# -- corpus novelty curve ---------------------------------------------------

NOVELTY_SQL = r"""
WITH g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(toks) - 2),
             i -> array_to_string(toks[i : i + 2], ' ')
           )) AS gram
    FROM (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    )
  )
),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty_rate
FROM g JOIN firsts f ON f.gram = g.gram
GROUP BY g.doc_id
"""

NOVELTY_SPARK_SQL = r"""
WITH g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           explode(transform(
             sequence(0, size(toks) - 3),
             i -> concat_ws(' ', slice(toks, i + 1, 3))
           )) AS gram
    FROM (
      SELECT doc_id, split(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ) WHERE size(toks) >= 3
  )
),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty_rate
FROM g JOIN firsts f ON f.gram = g.gram
GROUP BY g.doc_id
"""


@stage(
    "text_ngram_novelty",
    NOVELTY_SQL,
    "corpus novelty curve: per doc, the fraction of its distinct "
    "3-grams whose FIRST corpus occurrence (by doc_id) is this doc — "
    "the ingest-ordering diagnostic behind 'is the new crawl adding "
    "anything'. Grams reduce to a gram-keyed min + one join back; "
    "text shuffles as 3-token grams only",
)
def q_text_ngram_novelty(spark, sf_dir):
    return _sql_query(NOVELTY_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- supplier revenue concentration (HHI) ----------------------------------

#: Spark uses `DIV`, DuckDB uses `//` for integer floor division — the
#: only divergence between the two texts; every operand is an exact
#: BIGINT (cents), so the ppm shares and the HHI sum are bit-identical.
HHI_CORE = """
WITH rev AS (
  SELECT s_nationkey,
         l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey, l_suppkey
),
tot AS (
  SELECT s_nationkey, sum(cents) AS total_cents FROM rev GROUP BY s_nationkey
)
SELECT CAST(r.s_nationkey AS BIGINT) AS nation_key,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(ppm * ppm) AS BIGINT) AS hhi_e12
FROM (
  SELECT r.s_nationkey, r.l_suppkey,
         r.cents * 1000000 {DIV} t.total_cents AS ppm
  FROM rev r JOIN tot t ON r.s_nationkey = t.s_nationkey
) r
GROUP BY r.s_nationkey
"""


@stage(
    "q_supplier_hhi",
    HHI_CORE.format(DIV="//"),
    "supplier revenue concentration per nation: Herfindahl index over "
    "exact-integer ppm shares (cents * 1e6 floor-div total) so the sum "
    "of squares is order-free and bit-identical across engines — a "
    "single-supplier nation scores 1e12; broadcast totals, two "
    "partial-agg shuffles",
)
def q_supplier_hhi(spark, sf_dir):
    return _sql_query(HHI_CORE.format(DIV="DIV"),
                      ("lineitem", "supplier"))(spark, sf_dir)


# -- k-NN graph over a query subset ----------------------------------------

KNN_GRAPH_SQL = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
scored AS (
  SELECT q.vec_id AS src, c.vec_id AS dst,
         round(
           list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
           (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
            sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
           6) AS cosine
  FROM embeddings c, q WHERE q.vec_id <> c.vec_id
)
SELECT src, dst, CAST(rnk AS BIGINT) AS rank, cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY src ORDER BY cosine DESC, dst
  ) AS rnk FROM scored
) t WHERE rnk <= 3
"""


@stage(
    "sim_knn_graph",
    KNN_GRAPH_SQL,
    "k-NN graph construction (the HNSW/NN-descent building block): "
    "top-3 neighbors for each of the first 50 vectors — same "
    "broadcast-queries/partitioned-corpus shape as sim_topk_bruteforce; "
    "at scale the seed set is the graph frontier, not a prefix",
)
def q_sim_knn_graph(spark, sf_dir):
    from kenshin_spark.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 50")
    out = brute_force_topk(emb, q, k=3)
    return out.selectExpr(
        "query_id AS src", "neighbor_id AS dst", "rank", "cosine"
    )


# -- centroid-distance outliers --------------------------------------------

#: both engines ROUND the centroid to 6dp before the distance arithmetic:
#: a float mean is summation-order-dependent at the last ulp, and rounding
#: first makes every downstream op run on identical operands.
CENTROID_OUT_SQL = """
WITH c AS (
  SELECT label, t.dim, round(avg(embedding[t.dim + 1]), 6) AS cv
  FROM embeddings, range(64) t(dim) GROUP BY 1, 2
),
dots AS (
  SELECT e.vec_id, e.label,
         sum(e.embedding[c.dim + 1] * c.cv) AS dot,
         sum(e.embedding[c.dim + 1] * e.embedding[c.dim + 1]) AS n2v,
         sum(c.cv * c.cv) AS n2c
  FROM embeddings e JOIN c ON c.label = e.label
  GROUP BY e.vec_id, e.label
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       round(dot / (sqrt(n2v) * sqrt(n2c)), 6) AS centroid_cosine
FROM dots
WHERE round(dot / (sqrt(n2v) * sqrt(n2c)), 6) < 0.2
"""

CENTROID_OUT_SPARK_SQL = """
WITH c AS (
  SELECT label, dim, round(avg(v), 6) AS cv
  FROM (SELECT label, posexplode(embedding) AS (dim, v) FROM embeddings)
  GROUP BY 1, 2
),
e AS (SELECT vec_id, label, posexplode(embedding) AS (dim, v)
      FROM embeddings),
dots AS (
  SELECT e.vec_id, e.label,
         sum(e.v * c.cv) AS dot,
         sum(e.v * e.v) AS n2v,
         sum(c.cv * c.cv) AS n2c
  FROM e JOIN c ON c.label = e.label AND c.dim = e.dim
  GROUP BY e.vec_id, e.label
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       round(dot / (sqrt(n2v) * sqrt(n2c)), 6) AS centroid_cosine
FROM dots
WHERE round(dot / (sqrt(n2v) * sqrt(n2c)), 6) < 0.2
"""


@stage(
    "emb_centroid_outliers",
    CENTROID_OUT_SQL,
    "label-coherence outliers: vectors whose cosine to their OWN label "
    "centroid falls under 0.2 (mislabeled / noise candidates — the "
    "embedding-space analog of the quality filter). Centroids are "
    "rounded to 6dp BEFORE the distance so float mean ulp-noise cannot "
    "flip the threshold; label-sized centroid table broadcasts",
)
def q_emb_centroid_outliers(spark, sf_dir):
    return _sql_query(CENTROID_OUT_SPARK_SQL, ("embeddings",))(spark, sf_dir)


# -- cross-region trade balance --------------------------------------------

TRADE_SQL = """
SELECT sr.r_name AS supplier_region, cr.r_name AS customer_region,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
GROUP BY sr.r_name, cr.r_name
"""


@stage(
    "q_region_trade_matrix",
    TRADE_SQL,
    "cross-region trade matrix: revenue by (supplier region x customer "
    "region) — an 8-way star join where every dimension broadcasts "
    "(nation/region twice under different roles), one partial-agg "
    "shuffle on the 25-cell matrix key; DECIMAL money math",
)
def q_region_trade_matrix(spark, sf_dir):
    return _sql_query(
        TRADE_SQL,
        ("lineitem", "orders", "customer", "supplier", "nation", "region"),
    )(spark, sf_dir)


# -- lines-per-order histogram ---------------------------------------------

LINES_HIST_SQL = """
WITH per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM per_order GROUP BY n_lines
"""


@stage(
    "q_order_lines_histogram",
    LINES_HIST_SQL,
    "order-width histogram (lines per order): two partial-agg shuffles, "
    "second one over the tiny 1..7 domain — the cardinality profile "
    "feeding join-planning assumptions like the market-basket bound",
)
def q_order_lines_histogram(spark, sf_dir):
    return _sql_query(LINES_HIST_SQL, ("lineitem",))(spark, sf_dir)


# -- shingle document-frequency histogram ----------------------------------

SHINGLE_DF_SQL = r"""
WITH sh AS (
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
),
df AS (SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle)
SELECT CAST(n_docs AS BIGINT) AS doc_frequency,
       CAST(count(*) AS BIGINT) AS n_shingles
FROM df GROUP BY n_docs
"""

SHINGLE_DF_SPARK_SQL = r"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           explode(transform(
             sequence(0, size(toks) - 3),
             i -> concat_ws(' ', slice(toks, i + 1, 3))
           )) AS shingle
    FROM (
      SELECT doc_id, split(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ) WHERE size(toks) >= 3
  )
),
df AS (SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle)
SELECT CAST(n_docs AS BIGINT) AS doc_frequency,
       CAST(count(*) AS BIGINT) AS n_shingles
FROM df GROUP BY n_docs
"""


@stage(
    "dedup_shingle_df",
    SHINGLE_DF_SQL,
    "shingle document-frequency histogram: how many 3-gram shingles "
    "appear in exactly k docs — the tuning curve behind MinHash band "
    "thresholds and the decontamination false-positive rate; grams "
    "collapse map-side, the final histogram is domain-sized",
)
def q_dedup_shingle_df(spark, sf_dir):
    return _sql_query(SHINGLE_DF_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- incremental embedding near-dup ----------------------------------------

def _incremental_lsh_oracle(bands: int, r: int, threshold: float) -> str:
    from kenshin_spark.queries import _duck_band_sigs

    collide = " OR ".join(
        f"a.s[{j + 1}] = b.s[{j + 1}]" for j in range(bands)
    )
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding,
             {_duck_band_sigs('embedding', bands, r)} AS s
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS corpus_id, b.vec_id AS new_id,
             a.embedding AS ea, b.embedding AS eb
      FROM sigs a JOIN sigs b
        ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
       AND a.vec_id <> b.vec_id
      WHERE {collide}
    )
    SELECT corpus_id, new_id,
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


@stage(
    "dedup_embedding_incremental",
    _incremental_lsh_oracle(16, 4, 0.4),
    "incremental embedding near-dup — the daily-ingest shape for the "
    "vector corpus (mirrors dedup_minhash_incremental): only the new "
    "batch (vec_id % 10 = 0) is hyperplane-signed; the corpus "
    "contributes its persisted (vec_id, band, sig) index through the "
    "bucket join and its vectors only for colliding ids. The oracle "
    "recomputes the identical seeded planes and sign tests in SQL",
)
def q_dedup_embedding_incremental(spark, sf_dir):
    from kenshin_spark.dedup.embedding import (
        cross_neardup_against_index,
        hyperplane_band_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.where("vec_id % 10 = 0")
    corpus = emb.where("vec_id % 10 <> 0")
    return cross_neardup_against_index(
        new, corpus, hyperplane_band_index(corpus), threshold=0.4
    )


# -- DAU / MAU stickiness ---------------------------------------------------

STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
mau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 27 AND d.day
  GROUP BY d.day
)
SELECT dau.day, dau.dau, mau.mau,
       round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
"""

STICKINESS_SPARK_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
mau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 27 AND d.day
  GROUP BY d.day
)
SELECT dau.day, dau.dau, mau.mau,
       round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
"""


@stage(
    "q_events_stickiness",
    STICKINESS_SQL,
    "DAU/MAU stickiness per day: the rolling-28-day distinct-user count "
    "via a day-domain range join (|days| is calendar-sized, so the "
    "range join fans out day x active-day rows, never events x events); "
    "one exact integer division per day",
)
def q_events_stickiness(spark, sf_dir):
    return _sql_query(STICKINESS_SPARK_SQL, ("events",))(spark, sf_dir)


# -- per-metric trend slope -------------------------------------------------

#: least-squares slope with ts CENTERED per metric before any product:
#: raw epoch seconds (~1.7e9) would burn 10 digits of the double mantissa
#: on the offset and make the slope noise-dominated; centered covariance
#: keeps relative error ~1e-13 so the 4dp-rounded per-day slope is stable
#: across engines and partition orders.
TREND_SQL = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts, value
  FROM events WHERE value IS NOT NULL
),
c AS (
  SELECT metric, avg(ts * 1.0) AS mt, avg(value) AS mv FROM pts GROUP BY metric
)
SELECT p.metric,
       CAST(count(*) AS BIGINT) AS n_points,
       round(sum((p.ts - c.mt) * (p.value - c.mv))
             / sum((p.ts - c.mt) * (p.ts - c.mt)) * 86400, 4)
         AS slope_per_day
FROM pts p JOIN c ON p.metric = c.metric
GROUP BY p.metric
"""

TREND_SPARK_SQL = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(floor(unix_timestamp(ts)) AS BIGINT) AS ts, value
  FROM events WHERE value IS NOT NULL
),
c AS (
  SELECT metric, avg(ts * 1.0) AS mt, avg(value) AS mv FROM pts GROUP BY metric
)
SELECT p.metric,
       CAST(count(*) AS BIGINT) AS n_points,
       round(sum((p.ts - c.mt) * (p.value - c.mv))
             / sum((p.ts - c.mt) * (p.ts - c.mt)) * 86400, 4)
         AS slope_per_day
FROM pts p JOIN c ON p.metric = c.metric
GROUP BY p.metric
"""


@stage(
    "ts_trend_slope",
    TREND_SQL,
    "per-metric least-squares trend (units/day): centered covariance "
    "over broadcast per-metric means — ts is centered BEFORE the "
    "products so epoch magnitude doesn't eat the mantissa; 4dp rounding "
    "absorbs the remaining association noise (~1e-10 relative)",
)
def q_ts_trend_slope(spark, sf_dir):
    return _sql_query(TREND_SPARK_SQL, ("events",))(spark, sf_dir)


# -- order seasonality ------------------------------------------------------

SEASONALITY_SQL = """
SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM orders GROUP BY month(o_orderdate)
"""


@stage(
    "q_orders_seasonality",
    SEASONALITY_SQL,
    "month-of-year order seasonality across all years: one partial-agg "
    "shuffle onto a 12-row domain, DECIMAL money math",
)
def q_orders_seasonality(spark, sf_dir):
    return _sql_query(SEASONALITY_SQL, ("orders",))(spark, sf_dir)


# -- new vs returning users -------------------------------------------------

NEW_RETURNING_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
firsts AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
SELECT ud.day,
       CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_users
FROM ud JOIN firsts f ON ud.user_id = f.user_id
GROUP BY ud.day
"""

NEW_RETURNING_SPARK_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) AS day
  FROM events
),
firsts AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
SELECT ud.day,
       CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_users
FROM ud JOIN firsts f ON ud.user_id = f.user_id
GROUP BY ud.day
"""


@stage(
    "q_new_vs_returning",
    NEW_RETURNING_SQL,
    "daily new-vs-returning user split: per-user first-day aggregate "
    "joined back onto the (user, day) activity set — two partial-agg "
    "shuffles co-partitioned on user_id (AQE reuses the exchange), "
    "all-integer day arithmetic",
)
def q_new_vs_returning(spark, sf_dir):
    return _sql_query(NEW_RETURNING_SPARK_SQL, ("events",))(spark, sf_dir)


# -- document length histogram ----------------------------------------------

LENGTH_HIST_SQL = """
SELECT CAST(n_chars // 100 AS BIGINT) AS bucket_100chars,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY n_chars // 100
"""

LENGTH_HIST_SPARK_SQL = """
SELECT CAST(n_chars DIV 100 AS BIGINT) AS bucket_100chars,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY n_chars DIV 100
"""


@stage(
    "text_length_histogram",
    LENGTH_HIST_SQL,
    "document-length histogram in 100-char buckets (the length-filter "
    "tuning view): one integer floor-division, one partial-agg shuffle "
    "onto the bucket domain",
)
def q_text_length_histogram(spark, sf_dir):
    return _sql_query(LENGTH_HIST_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- order value outliers ---------------------------------------------------

#: round-then-compare: the per-class mean and stddev are ROUNDED to 4dp
#: before the threshold test, so aggregation-order ulp noise cannot flip
#: membership — the same determinism trick as emb_centroid_outliers.
OUTLIER_SQL = """
WITH stats AS (
  SELECT o_orderpriority,
         round(avg(o_totalprice), 4) AS mu,
         round(stddev_pop(o_totalprice), 4) AS sigma
  FROM orders GROUP BY o_orderpriority
)
SELECT CAST(o_orderkey AS BIGINT) AS orderkey, o.o_orderpriority,
       round(o_totalprice, 2) AS totalprice,
       round(mu, 2) AS class_mean
FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
WHERE o_totalprice > mu + 1.5 * sigma
"""


@stage(
    "q_order_value_outliers",
    OUTLIER_SQL,
    "per-priority-class order value outliers (> mean + 1.5 sigma — "
    "totalprice is a bounded sum-of-lines, so its tails end near 2 "
    "sigma): class "
    "stats broadcast, mean/stddev rounded to 4dp BEFORE the threshold "
    "so both engines compare identical operands; one scan + one "
    "broadcast join",
)
def q_order_value_outliers(spark, sf_dir):
    return _sql_query(OUTLIER_SQL, ("orders",))(spark, sf_dir)


# -- weekly activity heatmap ------------------------------------------------

#: dow convention differs: DuckDB dayofweek = 0(Sun)..6(Sat), Spark
#: dayofweek = 1(Sun)..7(Sat) — the Spark text subtracts 1.
HEATMAP_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS total_value
FROM events GROUP BY dayofweek(ts), hour(ts)
"""


HEATMAP_SPARK_SQL = """
SELECT CAST(dayofweek(ts) - 1 AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS total_value
FROM events GROUP BY dayofweek(ts), hour(ts)
"""


@stage(
    "q_events_hourly_heatmap",
    HEATMAP_SQL,
    "week-hour activity heatmap (dow x hour matrix, the dashboard "
    "staple): one partial-agg shuffle onto a 168-cell domain; values "
    "summed through DECIMAL so the matrix is order-exact",
)
def q_events_hourly_heatmap(spark, sf_dir):
    return _sql_query(HEATMAP_SPARK_SQL, ("events",))(spark, sf_dir)


# -- render combinators from the round-4b batch -----------------------------

from kenshin_spark.queries import LWW60, PTS, _points  # noqa: E402  (shared CTE fragments)


@stage(
    "render_moving_sum",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           round(sum(value) OVER (
             PARTITION BY metric ORDER BY ts
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS value
    FROM t0
    """,
    "graphite movingSum(series, 3) over tier0 — trailing-window sum, "
    "NULL-ignoring; both engines evaluate the 3-row ROWS window "
    "sequentially so the float sum order is identical (the same "
    "contract render_moving_average already holds)",
)
def q_render_moving_sum(spark, sf_dir):
    from kenshin_spark.functions.render import moving_sum
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return moving_sum(t0, 3).withColumn("value", F.round("value", 6))


@stage(
    "render_hitcount",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts - ts % 600 AS ts,
           round(sum(value * 60), 6) AS value
    FROM t0 GROUP BY metric, ts - ts % 600
    """,
    "graphite hitcount(series, '10min') over tier0: rate-to-total "
    "bucketing (sum of value x 60 s slot width per 600 s bucket); the "
    "per-bucket float sum is <= 10 terms of identical operands",
)
def q_render_hitcount(spark, sf_dir):
    from kenshin_spark.functions.render import hitcount
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return hitcount(t0, 600, 60).withColumn("value", F.round("value", 6))


@stage(
    "render_diff_series",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    f AS (SELECT min(metric) AS first FROM t0)
    SELECT 'diffSeries' AS metric, ts,
           round(sum(CASE WHEN metric = first THEN value
                          ELSE -value END), 6) AS value
    FROM t0, f GROUP BY ts
    """,
    "graphite diffSeries(series_list) over tier0: the lexicographically "
    "first series minus the per-slot sum of the rest (all-NULL slots "
    "stay NULL); the scalar first-metric aggregate broadcasts",
)
def q_render_diff_series(spark, sf_dir):
    from kenshin_spark.functions.render import diff_series
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return diff_series(t0).withColumn("value", F.round("value", 6))


@stage(
    "render_range_of_series",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT 'rangeOfSeries' AS metric, ts,
           round(max(value) - min(value), 6) AS value
    FROM t0 GROUP BY ts
    """,
    "graphite rangeOfSeries(series_list) over tier0: per-slot max - min "
    "across series — order-free extrema, exact in both engines",
)
def q_render_range_of_series(spark, sf_dir):
    from kenshin_spark.functions.render import range_of_series
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return range_of_series(t0).withColumn("value", F.round("value", 6))


# -- seasonal decomposition (STL-lite) --------------------------------------

#: round-then-derive: trend and seasonal are each rounded to 6dp before
#: the residual subtraction, so every downstream value is computed from
#: identical operands in both engines (ROWS windows evaluate
#: sequentially in both — the render_moving_average contract).
DECOMP_CORE = """
WITH pts AS ({PTS}),
t0 AS (
  SELECT metric, ts - ts % 3600 AS ts, {ARGMAX} AS value
  FROM pts GROUP BY 1, 2
),
tr AS (
  SELECT metric, ts, value,
         round(avg(value) OVER (
           PARTITION BY metric ORDER BY ts
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
         ), 6) AS trend
  FROM t0
),
se AS (
  SELECT metric, ts, value, trend,
         round(avg(value - trend) OVER (
           PARTITION BY metric, (ts % 86400)
         ), 6) AS seasonal
  FROM tr
)
SELECT metric, ts, value, trend, seasonal,
       round(value - trend - seasonal, 6) AS residual
FROM se
"""


@stage(
    "ts_seasonal_decompose",
    DECOMP_CORE.format(
        PTS=PTS, ARGMAX="arg_max(value, arrival)"
    ),
    "STL-lite decomposition over hourly tier0: centered 5-slot moving "
    "trend, hour-of-day seasonal means of the detrended series, "
    "residual = value - trend - seasonal — each component ROUNDED "
    "before the next subtraction so both engines derive from identical "
    "operands; two window scans co-partitioned with the metric",
)
def q_ts_seasonal_decompose(spark, sf_dir):
    spark_sql = DECOMP_CORE.format(
        PTS="""
  SELECT event_type AS metric,
         CAST(floor(unix_timestamp(ts)) AS BIGINT) AS ts,
         value, event_id AS arrival
  FROM events
""",
        ARGMAX="max_by(value, arrival)",
    )
    return _sql_query(spark_sql, ("events",))(spark, sf_dir)


# -- token-graph triangle counting ------------------------------------------

TRIANGLE_SQL = r"""
WITH big AS (
  SELECT t1 AS a, t2 AS b FROM (
    SELECT tok AS t1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM (
      SELECT doc_id, tok, row_number() OVER (
               PARTITION BY doc_id ORDER BY pos
             ) AS pos
      FROM (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+'))
                 AS tok,
               generate_subscripts(string_split_regex(trim(lower(text)),
                 '\s+'), 1) AS pos
        FROM documents
      ) WHERE tok <> ''
    )
  ) WHERE t2 IS NOT NULL AND t1 <> t2
),
edges AS (
  SELECT least(a, b) AS a, greatest(a, b) AS b
  FROM big GROUP BY 1, 2 HAVING count(*) >= 10
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
"""

TRIANGLE_SPARK_SQL = r"""
WITH big AS (
  SELECT t1 AS a, t2 AS b FROM (
    SELECT tok AS t1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM (
      SELECT doc_id, posexplode(split(trim(lower(text)), '\\s+'))
               AS (pos, tok)
      FROM documents
    ) WHERE tok <> ''
  ) WHERE t2 IS NOT NULL AND t1 <> t2
),
edges AS (
  SELECT least(a, b) AS a, greatest(a, b) AS b
  FROM big GROUP BY 1, 2 HAVING count(*) >= 10
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
"""


@stage(
    "graph_triangle_count",
    TRIANGLE_SQL,
    "triangle count on the token co-occurrence graph (support >= 10 "
    "bigram edges, canonical a<b orientation): the standard two-join "
    "wedge-closure shape — each wedge (e1, e2) around a shared low "
    "endpoint probes for its closing edge; the support threshold bounds "
    "the edge set so wedge fan-out stays small. Graph-analytics "
    "companion to the PageRank query",
)
def q_graph_triangle_count(spark, sf_dir):
    return _sql_query(TRIANGLE_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- funnel conversion time -------------------------------------------------

CONV_SQL = """
WITH v AS (
  SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id,
         min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t_conv, min(v.t_view) AS t_view
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase'
    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= v.t_view
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(t_conv - t_view, 0.5), 4) AS median_s,
       round(quantile_cont(t_conv - t_view, 0.9), 4) AS p90_s
FROM p
"""

CONV_SPARK_SQL = """
WITH v AS (
  SELECT user_id, min(CAST(floor(unix_timestamp(ts)) AS BIGINT)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id,
         min(CAST(floor(unix_timestamp(e.ts)) AS BIGINT)) AS t_conv, min(v.t_view) AS t_view
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase'
    AND CAST(floor(unix_timestamp(e.ts)) AS BIGINT) >= v.t_view
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(percentile(t_conv - t_view, 0.5), 4) AS median_s,
       round(percentile(t_conv - t_view, 0.9), 4) AS p90_s
FROM p
"""


@stage(
    "q_funnel_conversion_time",
    CONV_SQL,
    "view-to-purchase conversion latency: first view per user, first "
    "purchase at-or-after it, exact interpolated median/p90 of the gap "
    "(percentile == quantile_cont, R-7 over identical integers — the "
    "q_price_percentiles contract); two user-keyed partial aggregates",
)
def q_funnel_conversion_time(spark, sf_dir):
    return _sql_query(CONV_SPARK_SQL, ("events",))(spark, sf_dir)


# -- int8 scalar-quantization error profile ---------------------------------

SQ_ERR_SQL = """
WITH q AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         (CASE WHEN list_max(list_transform(embedding::DOUBLE[],
                 x -> abs(x))) = 0 THEN 1.0
               ELSE list_max(list_transform(embedding::DOUBLE[],
                 x -> abs(x))) END) AS s
  FROM embeddings
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       round(list_sum(list_transform(
         list_zip(v, list_transform(v,
           x -> floor(x * 127.0 / s + 0.5) * s / 127.0)),
         p -> (p[1] - p[2]) * (p[1] - p[2])
       )), 12) AS sq_err2
FROM q
"""

SQ_ERR_SPARK_SQL = """
WITH q AS (
  SELECT vec_id, label, embedding AS v,
         (CASE WHEN array_max(transform(embedding, x -> abs(x))) = 0D
               THEN 1.0D
               ELSE array_max(transform(embedding, x -> abs(x))) END) AS s
  FROM embeddings
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       round(aggregate(
         zip_with(v,
           transform(v, x -> floor(x * 127.0D / s + 0.5D) * s / 127.0D),
           (a, b) -> (a - b) * (a - b)),
         0.0D, (acc, e) -> acc + e
       ), 12) AS sq_err2
FROM q
"""


@stage(
    "emb_sq_error_profile",
    SQ_ERR_SQL,
    "int8 scalar-quantization reconstruction error per vector "
    "(quantize -> dequantize -> sum of squared deltas): the index-"
    "quality profile behind sim_topk_quantized. Entirely row-local "
    "sequential folds of identical IEEE op chains (the cosine-query "
    "contract), no cross-row float aggregation at all",
)
def q_emb_sq_error_profile(spark, sf_dir):
    return _sql_query(SQ_ERR_SPARK_SQL, ("embeddings",))(spark, sf_dir)


# -- nearest-centroid confusion matrix --------------------------------------

from kenshin_spark.queries import _NN_CTES  # noqa: E402  (shared CTEs)


@stage(
    "emb_label_confusion",
    f"""
    WITH {_NN_CTES.strip()}
    SELECT CAST(label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM best WHERE rn = 1
    GROUP BY label, pred_label
    """,
    "nearest-centroid confusion matrix: true x predicted label counts "
    "over the emb_nearest_centroid assignment (same rounded-centroid "
    "CTEs, so assignment is identical) — the label-quality dashboard "
    "view; output is |labels|^2-bounded",
)
def q_emb_label_confusion(spark, sf_dir):
    from kenshin_spark.similarity.classify import nearest_centroid

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        nearest_centroid(emb)
        .groupBy(
            F.col("label").cast("long").alias("true_label"),
            F.col("pred_label").cast("long").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


# -- near-dup rate by source ------------------------------------------------

def _source_dup_oracle() -> str:
    from kenshin_spark.queries import _minhash_oracle

    return f"""
    WITH pairs AS ({_minhash_oracle()}),
    dup_docs AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION
      SELECT doc_b FROM pairs
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(dd.doc_id) AS BIGINT) AS n_dup_docs
    FROM documents d LEFT JOIN dup_docs dd ON d.doc_id = dd.doc_id
    GROUP BY d.source
    """


@stage(
    "dedup_rate_by_source",
    _source_dup_oracle(),
    "near-duplication rate per source (which crawls are redundant — "
    "the mixture-weighting input): docs appearing in any MinHash-LSH "
    "pair, counted per source; the pair set is the oracled "
    "dedup_minhash_lsh machinery, the rollup is source-domain-sized",
)
def q_dedup_rate_by_source(spark, sf_dir):
    from kenshin_spark.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    # explode BOTH endpoints of each pair in one pass: the former
    # union-of-two-selects referenced the `pairs` subtree twice, so the
    # whole MinHash-LSH pipeline executed twice in one plan (26 scans /
    # 62 exchanges); explode(array(a, b)) + distinct is the same doc-id
    # set from a single evaluation (guide §2.4).
    dup = (
        pairs.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        )
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        docs.join(dup, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_dup").alias("n_dup_docs"),
        )
    )


# -- daily error rate -------------------------------------------------------

ERR_RATE_SQL = """
WITH d AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
)
SELECT day, n_events, n_errors,
       round(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_rate
FROM d
"""

ERR_RATE_SPARK_SQL = """
WITH d AS (
  SELECT CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
)
SELECT day, n_events, n_errors,
       round(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_rate
FROM d
"""


@stage(
    "q_events_error_rate",
    ERR_RATE_SQL,
    "daily error-rate SLI: one partial-agg shuffle onto the day domain, "
    "one exact integer division per day — the alerting input next to "
    "ts_availability's uptime view",
)
def q_events_error_rate(spark, sf_dir):
    return _sql_query(ERR_RATE_SPARK_SQL, ("events",))(spark, sf_dir)


# -- explicit GROUPING SETS -------------------------------------------------

GSETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


@stage(
    "q_orders_grouping_sets",
    GSETS_SQL,
    "explicit GROUPING SETS (status | priority | both): the irregular-"
    "lattice companion to the CUBE/ROLLUP queries — one Expand over the "
    "partial aggregate, DECIMAL money math",
)
def q_orders_grouping_sets(spark, sf_dir):
    return _sql_query(GSETS_SQL, ("orders",))(spark, sf_dir)


# -- session length histogram -----------------------------------------------

SESSION_HIST_CORE = """
WITH e AS (
  SELECT user_id, CAST(floor({EPOCH}(ts)) AS BIGINT) AS ts FROM events
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
),
d AS (
  SELECT user_id, session_id, max(ts) - min(ts) AS duration_s
  FROM sessions GROUP BY user_id, session_id
)
SELECT CAST(duration_s {DIV} 300 AS BIGINT) AS bucket_5min,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(min(duration_s) AS BIGINT) AS min_s,
       CAST(max(duration_s) AS BIGINT) AS max_s
FROM d GROUP BY duration_s {DIV} 300
"""


@stage(
    "q_session_length_histogram",
    SESSION_HIST_CORE.format(EPOCH="epoch", DIV="//"),
    "session-duration histogram in 5-minute buckets over the lag+cumsum "
    "sessionization (the same session definition q_event_sessions "
    "verifies) — engagement-distribution view, all-integer bucketing",
)
def q_session_length_histogram(spark, sf_dir):
    return _sql_query(
        SESSION_HIST_CORE.format(EPOCH="unix_timestamp", DIV="DIV"),
        ("events",),
    )(spark, sf_dir)


# -- discount distribution --------------------------------------------------

DISCOUNT_SQL = """
SELECT round(CAST(CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE), 2)
         AS discount,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS revenue
FROM lineitem GROUP BY CAST(l_discount AS DECIMAL(4,2))
"""


@stage(
    "q_discount_distribution",
    DISCOUNT_SQL,
    "discount-level distribution: lines and revenue per exact DECIMAL "
    "discount step (grouping on the DECIMAL, not the float, so bucket "
    "identity is exact) — one partial-agg shuffle onto the ~10-value "
    "discount domain",
)
def q_discount_distribution(spark, sf_dir):
    return _sql_query(DISCOUNT_SQL, ("lineitem",))(spark, sf_dir)


# -- per-type event value percentiles ---------------------------------------

TYPE_PCT_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""

TYPE_PCT_SPARK_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(percentile(value, 0.5D), 6) AS p50,
       round(percentile(value, 0.95D), 6) AS p95,
       round(percentile(value, 0.99D), 6) AS p99
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""


@stage(
    "q_events_value_percentiles",
    TYPE_PCT_SQL,
    "latency-style per-type value percentiles (p50/p95/p99): exact "
    "interpolated percentile == quantile_cont over identical parquet "
    "doubles (the q_price_percentiles contract), grouped by type",
)
def q_events_value_percentiles(spark, sf_dir):
    return _sql_query(TYPE_PCT_SPARK_SQL, ("events",))(spark, sf_dir)


# -- word length profile ----------------------------------------------------

WORDLEN_SQL = r"""
WITH w AS (
  SELECT doc_id, length(tok) AS wl FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+'))
             AS tok
    FROM documents
  ) WHERE tok <> ''
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wl) AS BIGINT) AS total_chars,
       CAST(max(wl) AS BIGINT) AS max_word_len,
       round(CAST(sum(wl) AS DOUBLE) / count(*), 6) AS mean_word_len
FROM w GROUP BY doc_id
"""

WORDLEN_SPARK_SQL = r"""
WITH w AS (
  SELECT doc_id, length(tok) AS wl FROM (
    SELECT doc_id, explode(split(trim(lower(text)), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wl) AS BIGINT) AS total_chars,
       CAST(max(wl) AS BIGINT) AS max_word_len,
       round(CAST(sum(wl) AS DOUBLE) / count(*), 6) AS mean_word_len
FROM w GROUP BY doc_id
"""


@stage(
    "text_word_length_profile",
    WORDLEN_SQL,
    "per-doc word-length profile (a Gopher-family signal: machine-"
    "generated text skews word length): exact integer sums, one "
    "division at the end — one explode + one partial-agg shuffle",
)
def q_text_word_length_profile(spark, sf_dir):
    return _sql_query(WORDLEN_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- counter monotonicity violations ----------------------------------------

MONO_CORE = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(floor({EPOCH}(ts)) AS BIGINT) AS ts, value,
         event_id AS arrival
  FROM events WHERE value IS NOT NULL
),
o AS (
  SELECT metric, ts, value,
         lag(value) OVER (PARTITION BY metric ORDER BY ts, arrival)
           AS prev
  FROM pts
)
SELECT metric,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT)
         AS n_decreases,
       round(CAST(sum(CASE WHEN value < prev THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS decrease_rate
FROM o GROUP BY metric
"""


@stage(
    "ts_monotonic_violations",
    MONO_CORE.format(EPOCH="epoch"),
    "counter-discipline audit: per metric, how often the raw series "
    "DECREASES (the reset events ts_counter_rate nulls out) — exact "
    "double comparisons over a (ts, arrival)-ordered lag window",
)
def q_ts_monotonic_violations(spark, sf_dir):
    return _sql_query(
        MONO_CORE.format(EPOCH="unix_timestamp"), ("events",)
    )(spark, sf_dir)


# -- weekday seasonal profile -----------------------------------------------

WKD_CORE = """
WITH pts AS (
  SELECT event_type AS metric,
         CAST(floor({EPOCH}(ts)) AS BIGINT) AS ts, value
  FROM events WHERE value IS NOT NULL
)
SELECT metric,
       CAST((ts {DIV} 86400 + 4) % 7 AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n_points,
       round(avg(value), 6) AS mean_value
FROM pts GROUP BY metric, (ts {DIV} 86400 + 4) % 7
"""


@stage(
    "ts_weekday_profile",
    WKD_CORE.format(EPOCH="epoch", DIV="//"),
    "day-of-week seasonal profile per metric (epoch-day + 4 mod 7 — "
    "pure integer arithmetic, no calendar functions to disagree on): "
    "the weekly companion to the hourly ts_seasonal_profile; 6dp-"
    "rounded means over identical doubles",
)
def q_ts_weekday_profile(spark, sf_dir):
    return _sql_query(
        WKD_CORE.format(EPOCH="unix_timestamp", DIV="DIV"), ("events",)
    )(spark, sf_dir)


# -- render asPercent + sortByTotal -----------------------------------------

@stage(
    "render_as_percent",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60})
    SELECT metric, ts,
           round(CASE WHEN sum(value) OVER (PARTITION BY ts) <> 0
                      THEN value * 100.0 / sum(value) OVER (PARTITION BY ts)
                 END, 6) AS value
    FROM t0
    """,
    "graphite asPercent(series_list) over tier0: per-slot share of the "
    "cross-series total — one window sum keyed by ts; zero-total slots "
    "stay NULL; the handful-of-series slot sum rounds at 6dp",
)
def q_render_as_percent(spark, sf_dir):
    from kenshin_spark.functions.render import as_percent
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return as_percent(t0).withColumn("value", F.round("value", 6))


@stage(
    "render_sort_by_total",
    f"""
    WITH pts AS ({PTS}), t0 AS ({LWW60}),
    keep AS (
      SELECT metric FROM t0
      GROUP BY metric ORDER BY sum(value) DESC, metric LIMIT 2
    )
    SELECT t0.metric, ts, value FROM t0 JOIN keep ON t0.metric = keep.metric
    """,
    "graphite sortByTotal + limit(2) over tier0: keep the two series "
    "with the highest NULL-ignoring totals (well-separated on this "
    "corpus, so the float totals order identically in both engines); "
    "series selection via a broadcast semi-join",
)
def q_render_sort_by_total(spark, sf_dir):
    from kenshin_spark.functions.render import sort_by_total
    from kenshin_spark.operators.align import last_write_wins

    t0 = last_write_wins(_points(spark, sf_dir), 60, arrival_col="arrival")
    return sort_by_total(t0, 2)


# -- part-type revenue share ------------------------------------------------

#: Spark DIV vs DuckDB // again; every operand is an exact BIGINT of
#: cents, so the ppm share is integer-exact in both engines (DECIMAL
#: division was tried first and the engines pick different result
#: scales — floor-div sidesteps the type negotiation entirely).
PART_SHARE_CORE = """
WITH r AS (
  SELECT p_type,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type
),
tot AS (SELECT sum(cents) AS t FROM r)
SELECT p_type,
       round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
       CAST(cents * 1000000 {DIV} t AS BIGINT) AS share_ppm
FROM r, tot
"""


@stage(
    "q_part_type_share",
    PART_SHARE_CORE.format(DIV="//"),
    "revenue share per part type: BIGINT-cents sums with the share as "
    "an exact integer ppm (cents x 1e6 floor-div total) — no float "
    "division at all; part dim broadcasts, one partial-agg shuffle",
)
def q_part_type_share(spark, sf_dir):
    return _sql_query(
        PART_SHARE_CORE.format(DIV="DIV"), ("lineitem", "part")
    )(spark, sf_dir)


# -- props value histogram --------------------------------------------------

PROPS_HIST_SQL = """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
            AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events
FROM events WHERE props IS NOT NULL
GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
"""

PROPS_HIST_SPARK_SQL = """
SELECT CAST(CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10
            AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events
FROM events WHERE props IS NOT NULL
GROUP BY CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10
"""


@stage(
    "q_events_props_histogram",
    PROPS_HIST_SQL,
    "schema-on-read histogram of the JSON property: decade buckets of "
    "the extracted integer (get_json_object == json_extract_string), "
    "one partial-agg shuffle onto the bucket domain",
)
def q_events_props_histogram(spark, sf_dir):
    return _sql_query(PROPS_HIST_SPARK_SQL, ("events",))(spark, sf_dir)


# -- digit ratio -------------------------------------------------------------

DIGIT_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
         AS n_digits,
       round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                  AS DOUBLE) / length(text), 6) AS digit_ratio
FROM documents WHERE length(text) > 0
"""

DIGIT_SPARK_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^0-9]', '')) AS BIGINT)
         AS n_digits,
       round(CAST(length(regexp_replace(text, '[^0-9]', ''))
                  AS DOUBLE) / length(text), 6) AS digit_ratio
FROM documents WHERE length(text) > 0
"""


@stage(
    "text_digit_ratio",
    DIGIT_SQL,
    "per-doc digit density (a boilerplate/table-dump signal the "
    "quality rules consume): strip-and-measure via regexp_replace "
    "(global by default in Spark, 'g' flag in DuckDB) — exact integer "
    "counts, one division",
)
def q_text_digit_ratio(spark, sf_dir):
    return _sql_query(DIGIT_SPARK_SQL, ("documents",))(spark, sf_dir)


# -- customer order value range ---------------------------------------------

CUST_RANGE_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS min_order,
       round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS max_order,
       round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2)))
                  - min(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS order_range
FROM orders GROUP BY o_custkey HAVING count(*) >= 2
"""


@stage(
    "q_customer_order_range",
    CUST_RANGE_SQL,
    "per-customer order-value spread (repeat customers only): DECIMAL "
    "extrema and exact difference — one partial-agg shuffle keyed by "
    "customer",
)
def q_customer_order_range(spark, sf_dir):
    return _sql_query(CUST_RANGE_SQL, ("orders",))(spark, sf_dir)


# -- centroid pair distances ------------------------------------------------

CENT_PAIR_SQL = """
WITH c AS (
  SELECT label, t.dim, round(avg(embedding[t.dim + 1]), 6) AS cv
  FROM embeddings, range(64) t(dim) GROUP BY 1, 2
),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.cv * b.cv) AS dot,
         sum(a.cv * a.cv) AS n2a,
         sum(b.cv * b.cv) AS n2b
  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       round(dot / (sqrt(n2a) * sqrt(n2b)), 6) AS centroid_cosine
FROM dots
"""

CENT_PAIR_SPARK_SQL = """
WITH c AS (
  SELECT label, dim, round(avg(v), 6) AS cv
  FROM (SELECT label, posexplode(embedding) AS (dim, v) FROM embeddings)
  GROUP BY 1, 2
),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.cv * b.cv) AS dot,
         sum(a.cv * a.cv) AS n2a,
         sum(b.cv * b.cv) AS n2b
  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       round(dot / (sqrt(n2a) * sqrt(n2b)), 6) AS centroid_cosine
FROM dots
"""


@stage(
    "emb_centroid_pair_distance",
    CENT_PAIR_SQL,
    "label-separability matrix: cosine between every pair of class "
    "centroids (centroids rounded to 6dp first — round-then-derive, so "
    "the 64-term dot products run on identical operands); |labels|^2/2 "
    "output rows",
)
def q_emb_centroid_pair_distance(spark, sf_dir):
    return _sql_query(CENT_PAIR_SPARK_SQL, ("embeddings",))(spark, sf_dir)


# -- metric value profile ---------------------------------------------------

VRANGE_CORE = """
WITH pts AS (
  SELECT event_type AS metric, value
  FROM events WHERE value IS NOT NULL
)
SELECT metric,
       CAST(count(*) AS BIGINT) AS n_points,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(max(value) - min(value), 6) AS value_range
FROM pts GROUP BY metric
"""


@stage(
    "ts_value_profile",
    VRANGE_CORE,
    "per-metric value-range profile (order-free extrema — the "
    "dashboard's y-axis bounds and the range input to histogram bucket "
    "sizing): one partial-agg shuffle",
)
def q_ts_value_profile(spark, sf_dir):
    return _sql_query(VRANGE_CORE, ("events",))(spark, sf_dir)
