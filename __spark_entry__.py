"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``kenshin_spark`` package — a PySpark-native engine with the
query/data-processing capabilities of douban/Kenshin plus LLM-data-pipeline
operators. Each ``queries()`` entry is one operator from SURVEY.md §2 (or
the driver's extension list); ``oracle_sql()`` carries the DuckDB twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kenshin_spark.queries import QUERIES, driver_order  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full engine read path —
    ingest events as points, build the downsample cascade, fetch a 24 h
    window as a NULL-filled regular grid (SURVEY §3.2)."""
    # the driver may pass a session without our parquet-nanos setting
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    from kenshin_spark.engine import KenshinEngine
    from kenshin_spark.io import load_table
    from kenshin_spark.queries import TS_SCHEMA
    from kenshin_spark.sources import events_as_points

    sf_dir = "/root/testdata/sf0.001"
    points = events_as_points(load_table(spark, sf_dir, "events"))
    eng = KenshinEngine(TS_SCHEMA)
    tiers = eng.tiers(points, arrival_col="arrival")
    now = int(points.agg(F.max("ts")).collect()[0][0])
    metrics = points.select("metric").distinct()
    return eng.fetch(tiers, metrics, now - 86400, now, now)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries without a prior driver CORRECTNESS row come first
    (the driver evaluates a bounded prefix of this dict); long-verified
    queries follow, regression-guarded by tests/test_queries_oracle.py.
    """

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(QUERIES[name].fn) for name in driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable twins; omitted entries get the rows-only check."""
    return {
        name: QUERIES[name].oracle
        for name in driver_order()
        if QUERIES[name].oracle
    }
