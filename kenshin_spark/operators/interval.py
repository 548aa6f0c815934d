"""Bucketized interval (range) join — points to containing intervals
without a nested-loop plan.

Spark executes ``l.ts BETWEEN r.start AND r.end`` as a
BroadcastNestedLoopJoin (small side) or a cartesian product — O(|L|·|R|)
either way, hopeless at scale. The standard fix is bucketization:

1. map each point to its time bucket ``floor(ts / W)``;
2. explode each interval into every bucket it covers
   (``sequence(floor(start/W), floor(end/W))`` — |interval|/W + 1 rows);
3. EQUI-join on (key?, bucket) — hash/sort-merge, shuffles prune to
   matching buckets only;
4. post-filter the exact containment predicate.

Cost: |L| + Σ(span_i/W) join-input rows instead of |L|·|R| comparisons.
``W`` trades interval fan-out against bucket collision width; pick it
near the median interval span. Same technique as Spark's own
range-join-hint bucketing and DuckDB's IEJoin alternative — expressed
with plain DataFrame ops so AQE sizes the shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: str | None = None,
    bucket: int = 3600,
) -> DataFrame:
    """Inner join of each ``left`` point row to every ``right`` interval
    row containing it (``start <= ts <= end``, inclusive), optionally
    also keyed by ``on``. Output: all left columns + the right payload
    columns."""
    lb = left.withColumn("_b", F.floor(F.col(ts_col) / bucket))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket),
                F.floor(F.col(end_col) / bucket),
            )
        ),
    )
    keys = ([on] if on else []) + ["_b"]
    return (
        lb.join(rb, keys)
        .where(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_b")
    )
