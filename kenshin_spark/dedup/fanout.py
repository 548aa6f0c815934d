"""Input fan-out for explode-heavy document operators.

Small-file inputs arrive as one Parquet partition; the per-doc CPU work
(shingling, token hashing) then serializes on a single task until the
first shuffle. Repartitioning the *documents* (cheap: rows are small
before the explode) spreads that work across all cores. At 100 TB inputs
are already many partitions and this is a no-op — we only repartition
when the input has fewer partitions than the session's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
