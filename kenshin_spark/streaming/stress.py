"""M12 — the metric stress generator (examples/metric_stresser.py:24-88).

The reference forks N processes that blast line/pickle batches at the
daemon. Spark-native: the ``rate`` source synthesizes an arbitrarily fast
firehose of well-formed line-protocol rows; pipe it straight into
``StreamingIngest.start_lines`` for an end-to-end soak, or use
``rows_per_second`` to match the reference's stress level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stress_lines(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    n_metrics: int = 100,
    prefix: str = "stress.metric",
) -> DataFrame:
    """A streaming DataFrame of line-protocol text (column ``value``):
    ``"<prefix>_<i> <value> <ts>"`` — deterministic value = f(metric, ts)
    so correctness checks can recompute it."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    metric = F.concat_ws(
        "_", F.lit(prefix), (F.col("value") % n_metrics).cast("string")
    )
    ts = F.unix_timestamp("timestamp").cast("long")
    val = (F.col("value") % 1000).cast("double") / 10.0
    return rate.select(
        F.concat_ws(" ", metric, val.cast("string"), ts.cast("string")).alias(
            "value"
        )
    )
