"""Bucketed co-located joins — shuffle elimination for repeated
metric-keyed joins.

At 100 TB the dominant cost of metric-keyed operations (hot/cold union
resolution, as-of joins against reference series, metric-correlation
self-joins, mor log resolve) is re-shuffling the fact table on ``metric``
for every query. Hive-style bucketing fixes the layout ONCE at write
time: rows are hash-partitioned into ``n_buckets`` files per partition
and sorted within each bucket, so a join or aggregation keyed on the
bucket column needs NO exchange — Spark's bucketed scan reports the
hash partitioning to Catalyst and the sort-merge join consumes both
sides in place (also the layout ``spark.sql.sources.bucketing.enabled``
AQE-reuses). This is the Spark analog of the reference packing N
metrics per .hs file with a stable fnv1a shard (kenshin/storage.py:21-33,
rurouni/hashing.py) — co-locate once, never re-shard at read.

Pick ``n_buckets`` so one bucket ≈ one executor-core's worth of a
partition (buckets × partitions = files; too many buckets → small
files, too few → skewed tasks). Bucketed tables require the session
catalog (``saveAsTable``) — the metastore records the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 8,
    key: str = "metric",
    sort_cols: tuple[str, ...] = ("metric", "ts"),
) -> None:
    """Persist ``df`` hash-bucketed by ``key`` and sorted within buckets
    (the sort makes merge joins and range scans zero-work)."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two tables bucketed the same way on the same key — with equal
    bucket counts Catalyst plans a sort-merge join with NO exchange on
    either side (assert via .explain: no Exchange above the scans)."""
    return spark.table(left_table).join(spark.table(right_table), on)
