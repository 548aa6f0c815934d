"""Pairwise metric correlation — the "which metrics move together"
fleet diagnostic, with an explicit pair-space bound for scale.

The core plan is a ts-equijoin of the aligned grid against itself with
one ``corr`` aggregate per metric pair. That join emits O(M²/2) pair rows
per co-observed slot for M metrics in scope — fine for a dashboard's
worth of metrics, a scale-killer fleet-wide (a 3M-metric fleet would be
~4.5e12 pairs per slot). So the operator takes a SCOPE, and the scope is
the documented contract:

- ``targets=[...]``: both sides restricted to an explicit metric list —
  pair space ≤ |targets|²/2 × slots. The list is pushed into the scan
  (an ``IN`` filter → parquet row-group pruning), so the corpus is
  never read beyond the scope.
- ``glob="sys.cpu.*"``: same, with the scope resolved by a Graphite
  node glob (``operators.maintenance.glob_to_regex``), mirroring
  ``store.fetch_glob``.
- ``seeds=[...]``: one-vs-fleet — only the LEFT side is restricted, so
  the pair space is |seeds| × M × slots. This is the "what correlates
  with this alerting metric" shape; the seed side is tiny and broadcast.
- no scope: all-pairs. Allowed (the sf0.01 driver query and its DuckDB
  oracle need it) but documented as test-scale only.

The reference has no correlation operator (closest: reading two series
and eyeballing them via bin/kenshin-fetch.py); this is part of the
engine's analytical extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metric_correlation(
    grid: DataFrame,
    targets: list[str] | None = None,
    glob: str | None = None,
    seeds: list[str] | None = None,
    min_slots: int = 1,
) -> DataFrame:
    """Pearson correlation per metric pair over co-observed slots:
    ``(metric_a, metric_b, r, n_slots)`` with ``metric_a < metric_b``.

    ``grid`` is an aligned ``(metric, ts, value)`` frame (e.g. the
    last-write-wins 60 s grid). Scope via ``targets``/``glob`` (both
    sides) or ``seeds`` (left side only) — see module docstring for the
    pair-space bound each one buys. Scopes compose: ``seeds`` with
    ``targets``/``glob`` restricts the right side too.
    """
    if glob is not None:
        from kenshin_spark.operators.maintenance import glob_to_regex

        scoped = grid.where(F.col("metric").rlike(glob_to_regex(glob)))
    elif targets is not None:
        # IN-list filter: pushed down to the scan, prunes row groups
        scoped = grid.where(F.col("metric").isin(list(targets)))
    else:
        scoped = grid

    left = scoped if seeds is None else grid.where(
        F.col("metric").isin(list(seeds))
    )

    a, b = left.alias("a"), scoped.alias("b")
    pair_cond = (
        (F.col("a.metric") != F.col("b.metric"))
        if seeds is not None
        else (F.col("a.metric") < F.col("b.metric"))
    )
    out = (
        a.join(b, (F.col("a.ts") == F.col("b.ts")) & pair_cond)
        .where(F.col("a.value").isNotNull() & F.col("b.value").isNotNull())
        .groupBy(
            F.col("a.metric").alias("metric_a"),
            F.col("b.metric").alias("metric_b"),
        )
        .agg(
            F.round(F.corr("a.value", "b.value"), 6).alias("r"),
            F.count("*").alias("n_slots"),
        )
    )
    if min_slots > 1:
        out = out.where(F.col("n_slots") >= min_slots)
    return out
