"""SparkSession factory tuned for this engine.

Local mode is the test harness; the same conf scales to a cluster: AQE for
runtime re-planning (skew joins, partition coalescing), Arrow for the few
Pandas-UDF paths, UTC session time so epoch arithmetic is deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kenshin_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle_parts = str(cpus or os.cpu_count() or 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's synthetic parquet stores TIMESTAMP(NANOS), which the
        # vectorized reader rejects by default; read them as BIGINT nanos
        # (kenshin_spark.io converts to epoch seconds / timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
