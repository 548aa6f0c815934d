"""Exact substring-level deduplication: find w-token windows whose exact
text recurs anywhere in the corpus (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr side of
that paper; the doc-level near-dup side lives in dedup/minhash.py).

The reference engine has no analog (douban/Kenshin is a TSDB); this is
part of the LLM-pipeline extension surface.

Spark-first shape: windows are generated row-locally (sequence +
explode + slice — pure JVM expressions), then immediately reduced to a
portable 60-bit md5-prefix hash so ONLY 8-byte keys ever shuffle, never
window text. Corpus-wide duplicate detection is one partial-aggregated
groupBy over the hashes; attribution back to documents is a hash-keyed
join. Cost is linear in total tokens — there is no pairwise step at
all, which is what lets exact-substring dedup run where Jaccard-style
pairwise methods need banding.

Scale notes (100 TB):
- the gram stream is ~n_tokens rows of (doc_id, int64) — 16 bytes/token
  ≈ the size of the tokenized corpus; both aggregations partial-combine
  map-side, and AQE handles the skew of stop-phrases.
- ``suffix-array`` implementations find *maximal* duplicated spans;
  fixed-w windows are the standard distributed relaxation (a duplicated
  span of length L ≥ w is detected by all its L-w+1 windows).
- the gram stream is computed once and reused for the duplicate set and
  the attribution join. Two reuse modes: the default ``.cache()`` (fine
  while the stream fits executor storage), and ``materialize_dir`` —
  pass a path and the stream (hash rows only, never text) is written to
  parquet ONCE and both consumers read it back, so text is tokenized
  exactly once regardless of executor-cache eviction. At 100 TB the
  cached stream is ~corpus-sized and WILL be evicted (silent recompute
  = re-reading and re-splitting the full text per consumer);
  ``materialize_dir`` is the cluster-scale mode and is plan-tested to
  touch the text source once end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hash(gram: F.Column) -> F.Column:
    """Portable 60-bit hash: md5 prefix as BIGINT (same scheme as the
    rest of the repo — any SQL engine replays it bit-exactly)."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def gram_hashes(
    docs: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, pos, gh)`` — one row per w-token window position with
    the window's 60-bit hash. Row-local: zero shuffles."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    )
    gram = F.array_join(F.slice("_toks", F.col("pos") + 1, F.lit(w)), " ")
    return (
        base.where(F.col("_n") >= w)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_n") - w)).alias("pos"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"),
                _gram_hash(gram).alias("gh"))
    )


def gram_stream(
    docs: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The self-sufficient gram stream: ``(doc_id, n_grams, pos, gh)``
    in ONE row-local text scan. Docs shorter than w tokens emit a single
    ``(doc_id, 0, NULL, NULL)`` row so the complete document list (and
    each doc's window count) can be recovered from the stream alone —
    the property that lets ``materialize_dir`` replace every later text
    scan with a read of this narrow table."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    )
    gram = F.array_join(F.slice("_toks", F.col("pos") + 1, F.lit(w)), " ")
    n_grams = F.greatest(F.col("_n") - (w - 1), F.lit(0)).cast("long")
    seq = F.when(
        F.col("_n") >= w, F.sequence(F.lit(0), F.col("_n") - w)
    )
    return (
        base.select(
            "doc_id",
            "_toks",
            n_grams.alias("n_grams"),
            F.explode_outer(seq).alias("pos"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("pos").cast("long").alias("pos"),
            F.when(F.col("pos").isNotNull(), _gram_hash(gram)).alias("gh"),
        )
    )


def _reusable_grams(
    docs: DataFrame,
    w: int,
    id_col: str,
    text_col: str,
    materialize_dir: str | None,
) -> DataFrame:
    """One gram stream, two reuse disciplines: parquet-materialized
    (text tokenized exactly once, eviction-proof — the cluster-scale
    mode) or ``.cache()`` (zero extra IO while it fits storage)."""
    grams = gram_stream(docs, w, id_col, text_col)
    if materialize_dir is not None:
        grams.write.mode("overwrite").parquet(materialize_dir)
        return docs.sparkSession.read.parquet(materialize_dir)
    return grams.cache()


def duplicated_ngram_profile(
    docs: DataFrame,
    w: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_dir: str | None = None,
) -> DataFrame:
    """Per-document duplicated-substring profile: ``(doc_id, n_grams,
    dup_grams, dup_frac)`` where dup_grams counts window positions whose
    exact w-token text occurs ≥ min_count times corpus-wide (intra-doc
    repeats included — a doc repeating its own boilerplate is a dup).

    dup_frac is the trainer-facing signal: the fraction of the document
    that is memorized-elsewhere text. Docs shorter than w tokens emit
    n_grams = 0 and NULL dup_frac.

    With ``materialize_dir`` the gram stream is checkpointed to parquet
    and the whole profile computes from it — the text source is touched
    exactly once (plan-tested)."""
    grams = _reusable_grams(docs, w, id_col, text_col, materialize_dir)
    hashed = grams.where(F.col("gh").isNotNull())
    dup = (
        hashed.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_count)
        .select("gh")
    )
    per = (
        hashed.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_dup"))
    )
    dupc = F.coalesce(F.col("_dup"), F.lit(0)).cast("long")
    return (
        grams.groupBy("doc_id")
        .agg(F.max("n_grams").alias("n_grams"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            dupc.alias("dup_grams"),
            F.when(
                F.col("n_grams") > 0, F.round(dupc / F.col("n_grams"), 6)
            ).alias("dup_frac"),
        )
    )


def top_duplicated_grams(
    docs: DataFrame,
    w: int = 8,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The k most-repeated w-token windows WITH their text recovered:
    ``(gram_text, occurrences, n_docs)`` — the boilerplate audit view.

    Text is carried only for the k winners: occurrence counting runs on
    hashes, then one semi-join pulls the text of the top-k hashes back
    out of the (row-local, recomputed) gram stream. first() is safe —
    equal hashes ⇒ equal text (60-bit space; collisions would need
    ~2^30 distinct grams per bucket)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    )
    gram = F.array_join(F.slice("_toks", F.col("pos") + 1, F.lit(w)), " ")
    withtext = (
        base.where(F.col("_n") >= w)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_n") - w)).alias("pos"),
        )
        .select("doc_id", gram.alias("gram_text"))
        .withColumn("gh", _gram_hash(F.col("gram_text")))
    )
    counts = withtext.groupBy("gh").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.col("occurrences").desc(), F.col("gh")).limit(k)
    return (
        withtext.join(F.broadcast(top), "gh")
        .groupBy("gh", "occurrences", "n_docs")
        .agg(F.min("gram_text").alias("gram_text"))
        .orderBy(F.col("occurrences").desc(), "gh")
        .select("gram_text", "occurrences", "n_docs")
    )


def duplicated_spans(
    docs: DataFrame,
    w: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_dir: str | None = None,
) -> DataFrame:
    """The actionable form of substring dedup (Lee et al. REMOVE the
    duplicated spans, they don't drop documents): maximal runs of
    consecutive duplicated window positions per document —
    ``(doc_id, span_start, n_windows, span_tokens)`` where the span
    covers tokens [span_start, span_start + span_tokens).

    A duplicated region of L ≥ w tokens appears as L - w + 1 consecutive
    duplicated windows, so ``span_tokens = n_windows + w - 1`` recovers
    its full extent. Islands are grouped with the classic
    ``pos - row_number()`` trick — one window function over the (small)
    duplicated-position set, keyed by document."""
    from pyspark.sql import Window

    grams = _reusable_grams(
        docs, w, id_col, text_col, materialize_dir
    ).where(F.col("gh").isNotNull())
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_count)
        .select("gh")
    )
    pos = grams.join(dup, "gh").select("doc_id", "pos")
    isl = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    return (
        pos.withColumn("_isl", isl)
        .groupBy("doc_id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            F.col("n_windows").cast("long").alias("n_windows"),
            (F.col("n_windows") + (w - 1)).cast("long").alias("span_tokens"),
        )
    )


def substring_gram_index(
    corpus: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persistable side of incremental substring dedup: corpus-wide
    gram-hash occurrence counts ``(gh, occ)``. At scale this table is
    maintained across ingest batches (upsert occ += batch counts) and is
    tiny relative to the corpus — 16 bytes per DISTINCT gram."""
    return (
        gram_hashes(corpus, w, id_col, text_col)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occ"))
    )


def duplicated_profile_against_index(
    new_batch: DataFrame,
    gram_index: DataFrame,
    w: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_dir: str | None = None,
) -> DataFrame:
    """Incremental substring dedup — the daily-ingest shape: profile
    ONLY the new batch against the precomputed corpus gram index. A
    batch window is duplicated if its corpus count plus its batch count
    reaches ``min_count`` (so intra-batch repeats still count, exactly
    as the full-corpus profile would).

    Only the batch is tokenized; the corpus contributes its (gh, occ)
    index via one hash-keyed join — per-batch cost is O(batch tokens +
    index collisions), never a corpus re-scan.

    The batch gram stream is reused twice (occurrence counts, then the
    per-doc join); ``materialize_dir`` gives it the same two
    disciplines as the full-corpus path: hash-only parquet checkpoint
    (tokenize-once even under cache eviction) vs the ``.cache()``
    default (batches are micro-batch-sized, so memory reuse is the
    normal mode)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = gram_hashes(new_batch, w, id_col, text_col)
    if materialize_dir is not None:
        grams.write.mode("overwrite").parquet(materialize_dir)
        grams = new_batch.sparkSession.read.parquet(materialize_dir)
    else:
        grams = grams.cache()
    batch_occ = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("_bocc"))
    dup = (
        batch_occ.join(gram_index, "gh", "left")
        .where(
            F.col("_bocc") + F.coalesce(F.col("occ"), F.lit(0)) >= min_count
        )
        .select("gh")
    )
    per = (
        grams.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_dup"))
    )
    n_grams = F.greatest(F.size(toks) - (w - 1), F.lit(0)).cast("long")
    dupc = F.coalesce(F.col("_dup"), F.lit(0)).cast("long")
    return (
        new_batch.select(
            F.col(id_col).alias("doc_id"), n_grams.alias("n_grams")
        )
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            dupc.alias("dup_grams"),
            F.when(
                F.col("n_grams") > 0, F.round(dupc / F.col("n_grams"), 6)
            ).alias("dup_frac"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    w: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_dir: str | None = None,
) -> DataFrame:
    """The removal step completing the Lee et al. pipeline: drop every
    token covered by a duplicated span and re-join the survivors —
    ``(doc_id, n_tokens, removed_tokens, kept_tokens, clean_md5)``.

    A position is covered if any duplicated window includes it
    (positions p..p+w-1 for each duplicated window start p). The span
    set per doc is tiny (bounded by dup windows), so it is collected
    into an array per doc and the scrub is ONE row-local filter
    expression over the token array — no token-level shuffle, the
    corpus is touched once. clean_md5 fingerprints the scrubbed text so
    downstream stages (and the SQL oracle) can verify the edit
    byte-exactly without moving text.

    The scrub itself must re-read text (it rewrites documents), so with
    ``materialize_dir`` the text source is scanned exactly twice total —
    once to build the gram checkpoint, once to apply the edit — instead
    of 2 + (cache-eviction recomputes)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = _reusable_grams(
        docs, w, id_col, text_col, materialize_dir
    ).where(F.col("gh").isNotNull())
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_count)
        .select("gh")
    )
    spans = (
        grams.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("_starts"))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    ).join(spans, "doc_id", "left")
    # covered(i) = exists start s with s <= i <= s + w - 1
    kept = F.expr(
        f"filter(_toks, (x, i) -> _starts IS NULL OR NOT exists(_starts, "
        f"s -> s <= i AND i <= s + {w - 1}))"
    )
    return base.select(
        "doc_id",
        F.col("_n").cast("long").alias("n_tokens"),
        (F.col("_n") - F.size(kept)).cast("long").alias("removed_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        F.md5(F.array_join(kept, " ")).alias("clean_md5"),
    )
