"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 3.5+).

At 100 TB, "distinct users per day/week/month" cannot re-scan the events
stream per rollup window. The sketch pattern: aggregate each day ONCE
into a fixed-size (~2^lgk bytes) HLL sketch, persist the sketches, and
answer every coarser rollup by UNIONING sketches — associative,
re-aggregable, and exact-cost-free. Estimates are within ~1.6% at
lgk=12 (the DataSketches published bound, ±2σ).

No DuckDB oracle: approximation internals differ across engines by
design; correctness is pinned by tolerance tests against exact counts
(tests/test_ops.py::TestHllSketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LGK = 12  # DataSketches default; ~1.6% relative standard error


def hll_distinct(
    df: DataFrame, key_col: str, *group_cols: str, lgk: int = LGK
) -> DataFrame:
    """Approximate distinct ``key_col`` per group — one pass, map-side
    partial sketches, constant-size shuffle rows."""
    est = F.expr(f"hll_sketch_estimate(hll_sketch_agg({key_col}, {lgk}))")
    if not group_cols:
        return df.agg(est.alias("approx_distinct"))
    return df.groupBy(*group_cols).agg(est.alias("approx_distinct"))


def hll_sketches(
    df: DataFrame, key_col: str, *group_cols: str, lgk: int = LGK
) -> DataFrame:
    """Persistable per-group sketches: ``(*group_cols, sketch binary)``.
    Write these once per ingest window; every coarser rollup unions them
    instead of re-scanning the raw data."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({key_col}, {lgk})").alias("sketch")
    )


def hll_rollup(
    sketches: DataFrame, *group_cols: str, sketch_col: str = "sketch"
) -> DataFrame:
    """Union persisted sketches up to a coarser grouping and estimate:
    ``(*group_cols, approx_distinct)``. ``hll_union_agg`` is associative,
    so this re-aggregates already-aggregated state — the property raw
    distinct counts fundamentally lack."""
    est = F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}))")
    if not group_cols:
        return sketches.agg(est.alias("approx_distinct"))
    return sketches.groupBy(*group_cols).agg(est.alias("approx_distinct"))
