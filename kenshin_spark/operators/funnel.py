"""Sequential funnel analysis — who progressed view → click → purchase,
each step within a time window of the previous.

Semantics (the standard product-analytics definition): step 1 anchors at
the user's FIRST step-1 event; step i anchors at the first step-i event
at-or-after the step-(i-1) anchor and within ``within`` seconds of it.
Users keep their row when they drop off — later step columns are NULL —
so conversion rates fall out of one count/count.

Scale shape: each step is one filtered aggregate keyed by user plus one
join back, all hash-partitioned on the user key — no windows over the
full event stream, no per-user collect. Skewed power-users cost one
AQE-handled join key, not a cross product; step filters push into the
scan (event_type predicate prunes row groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    within: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """``(user, t_<step1>, t_<step2>, ...)`` — anchor timestamp per
    completed step, NULL from the first missed step on. One row per user
    who completed step 1."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    cols = [f"t_{s}" for s in steps]
    out = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias(cols[0]))
    )
    for prev, (step, col) in zip(cols, zip(steps[1:], cols[1:])):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(
                out.select("user", prev), F.col(user_col) == F.col("user")
            )
            .where(
                (F.col(ts_col) >= F.col(prev))
                & (F.col(ts_col) <= F.col(prev) + within)
            )
            .groupBy("user")
            .agg(F.min(ts_col).alias(col))
        )
        out = out.join(nxt, "user", "left")
    return out.withColumnRenamed("user", user_col)
