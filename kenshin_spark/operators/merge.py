"""S7 — merge metric sources with gap fill.

Reference: ``merge_metrics`` / ``merge_points`` / ``fill_gap``
(bin/kenshin-rehash.py:103-214) merges M single-metric source files into one
kenshin file, aligning on timestamp and filling gaps with NULL. In
DataFrame land this is ``unionByName`` + a full-outer alignment — trivial
and shuffle-minimal (one shuffle on the merge key).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_series(sources: list[DataFrame], prefer_first: bool = True) -> DataFrame:
    """Merge point sets for the same logical metric space.

    Each source is ``(metric, ts, value)``. On (metric, ts) collisions the
    earlier source wins when ``prefer_first`` (the reference merges the
    original file's point over the supplement, bin/kenshin-rehash.py:154-163
    ``merge_points`` keeps the first non-null). NULLs never beat values.
    """
    tagged = [
        df.select(
            "metric", "ts", "value", F.lit(i).alias("_src")
        )
        for i, df in enumerate(sources)
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    order = F.when(F.col("value").isNull(), F.lit(1)).otherwise(F.lit(0))
    # first non-null value by source priority: min_by over (is_null, src)
    key = (order * F.lit(len(sources)) + F.col("_src")) if prefer_first else order
    return (
        unioned.withColumn("_key", key)
        .groupBy("metric", "ts")
        .agg(F.expr("min_by(value, _key)").alias("value"))
    )
