"""As-of (point-in-time) join — for each left row, the most recent right
row at-or-before its timestamp, per key.

The naive formulation is a range join (``l.key = r.key AND r.ts <= l.ts``
+ a per-row argmax), which Spark executes as a broadcast nested loop or an
exploding theta-join — quadratic per key, hopeless at 100 TB. The
scalable plan is the union-tag trick used by every distributed as-of
implementation:

1. tag both inputs and union them — no join at all;
2. one window per key ordered by (ts, side): ``last(right_payload,
   ignorenulls=True)`` carries the latest right value forward onto every
   subsequent row;
3. keep the left rows; the carried payload IS the as-of match.

Cost: ONE shuffle on the key (the window), linear in |L| + |R|. Skewed
keys behave like any window aggregate (AQE-sized partitions); ordering
within a key is a local sort. DuckDB's native ``ASOF JOIN`` provides the
oracle for the driver's cross-engine gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "metric",
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right`` row with the
    greatest ``right_ts`` <= ``left_ts`` for the same ``on`` key
    (``direction="backward"``, inclusive — DuckDB/pandas ``merge_asof``
    semantics) or the least ``right_ts`` >= ``left_ts``
    (``direction="forward"``). Unmatched left rows keep NULL right
    columns; ``tolerance`` (seconds) drops matches further than that from
    the left timestamp.

    Forward is implemented as backward on negated timestamps — one code
    path, both directions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sign = 1 if direction == "backward" else -1

    r_payload = [c for c in right.columns if c != on]
    l_cols = [c for c in left.columns]
    taken = set(l_cols)
    out_names = {
        c: (c + suffix if c in taken else c) for c in r_payload
    }

    l_tagged = left.select(
        F.col(on).alias("_k"),
        (F.col(left_ts) * sign).alias("_t"),
        # left sorts AFTER right at equal ts so an exact-ts right row is
        # visible to it (inclusive match)
        F.lit(1).alias("_side"),
        F.struct(*l_cols).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        (F.col(right_ts) * sign).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*l_cols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "_m",
            F.when(
                F.col("_m").isNotNull()
                & (F.col("_t") - F.col("_m")[right_ts] * sign <= tolerance),
                F.col("_m"),
            ),
        )
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in r_payload],
    )
