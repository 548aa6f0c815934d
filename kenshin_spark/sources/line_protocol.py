"""S1 — Graphite line-protocol source, and the events→points mapping.

Reference: ``MetricLineReceiver.lineReceived`` parses
``"<metric> <value> <timestamp>"``; malformed lines are logged and dropped
(rurouni/protocols.py:31-42). Here the parse is a declarative
split + cast — casts yield NULL on garbage, so "malformed" is a filter, and
the dead letters stay available on a side output instead of a log line.

Works identically on a batch DataFrame of lines and on a streaming source
(``spark.readStream.format("socket"|"kafka")``) — same columns in, same
columns out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POINT_COLUMNS = ("metric", "ts", "value")


def parse_metric_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse line-protocol text rows into points.

    Input: one string column (default ``value``, matching the socket/kafka
    source convention). Output: ``(metric STRING, ts LONG, value DOUBLE,
    corrupt STRING)`` — ``corrupt`` carries the raw line when the parse
    failed (dead-letter column), else NULL.
    """
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    # F.get (NULL on out-of-range, ANSI-safe) + try_cast (NULL on garbage):
    # malformed lines become dead letters instead of an ANSI error killing
    # the stream
    parsed = lines.select(
        F.col(line_col).alias("_raw"),
        F.get(parts, 0).alias("metric"),
        F.get(parts, 2).try_cast("double").try_cast("long").alias("ts"),
        F.get(parts, 1).try_cast("double").alias("value"),
        F.size(parts).alias("_n"),
    )
    ok = (
        (F.col("_n") == 3)
        & F.col("metric").isNotNull()
        & (F.col("metric") != "")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return parsed.select(
        "metric",
        "ts",
        "value",
        F.when(~ok, F.col("_raw")).alias("corrupt"),
    )


def events_as_points(events: DataFrame) -> DataFrame:
    """Map the driver's ``events`` stream table to the engine's point model
    (FIXTURES.md §6): event-time → epoch-second ``ts``, ``event_type`` →
    ``metric``, measure → ``value``; ``event_id`` is kept as the arrival
    order for last-write-wins dedup."""
    return events.select(
        F.col("event_type").alias("metric"),
        F.unix_timestamp(F.col("ts")).cast("long").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("long").alias("arrival"),
    )
