"""Session windows and watermarked dedup — Structured-Streaming-native
operators that also run in batch (Spark's ``session_window`` and
``dropDuplicatesWithinWatermark`` accept both).

The reference's cache-query daemon answers "what happened recently per
key"; session windows are the streaming-analytics generalization the
LLM-pipeline brief asks for. Batch parity matters: the SAME call tree
serves the backfill job and the live stream, so results can't drift
between the two (the invariant tests/test_streaming.py asserts for
Holt is asserted for sessions too).

Scale notes: session state is per-key and bounded by the watermark —
late events beyond it are dropped instead of growing state; the batch
form is one gap-merge shuffle keyed by user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"


def sessionize(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Merge each key's events into sessions separated by ≥ ``gap`` of
    silence: ``(user_id, session_start, session_end, n_events[,
    sum_value])``. ``session_end`` is Spark's convention — last event
    time + gap (the instant the session would have expired).

    Batch and streaming take the identical plan; in streaming, call
    ``.withWatermark(ts_col, ...)`` upstream so session state is
    evicted once the watermark passes a session's end."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        # money-math discipline: DECIMAL sum is order-exact, then one
        # conversion — engines agree bit-for-bit
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("sum_value")
        )
    return (
        events.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *(
                ["n_events"]
                if value_col is None
                else ["n_events", "sum_value"]
            ),
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once → effectively-once ingestion guard: drop re-sent
    rows whose ``keys`` were already seen, holding state only inside the
    watermark horizon (bounded, unlike a global ``dropDuplicates`` whose
    state grows forever on an unbounded stream).

    On a batch DataFrame this degrades to plain ``dropDuplicates`` over
    the same keys — same result set, no state."""
    if stream.isStreaming:
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return stream.dropDuplicates(keys)


def attribute_conversions(
    clicks: DataFrame,
    conversions: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream interval join — the attribution primitive: every
    (conversion, prior click) pair by the same key where the click
    happened within ``window`` BEFORE the conversion. Output columns:
    ``(user_id, click_ts, conv_ts, lag_s)``.

    On streaming inputs both sides carry a watermark and the join's time
    range bounds the state Spark must hold (clicks age out once no
    conversion can still match them — the canonical watermarked
    stream-stream join). On batch inputs the SAME call is a plain
    interval join, so backfill and live attribution can't drift; the
    most-recent-click reduction (``min_by`` over lag_s) is left to the
    caller because chaining an aggregate after a stream-stream join
    constrains output modes — pairs compose with either.
    """
    c = clicks.select(
        F.col(key_col).alias("_ck"), F.col(ts_col).alias("click_ts")
    )
    v = conversions.select(
        F.col(key_col).alias(key_col), F.col(ts_col).alias("conv_ts")
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if conversions.isStreaming:
        v = v.withWatermark("conv_ts", watermark)
    joined = v.join(
        c,
        (F.col(key_col) == F.col("_ck"))
        & (F.col("click_ts") <= F.col("conv_ts"))
        & (
            F.col("click_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {window}")
        ),
    )
    return joined.select(
        key_col,
        "click_ts",
        "conv_ts",
        (
            F.unix_timestamp("conv_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_s"),
    )
