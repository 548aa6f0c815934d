"""Input fan-out for explode-heavy document operators.

Small-file inputs arrive as one Parquet partition; the per-doc CPU work
(shingling, token hashing) then serializes on a single task until the
first shuffle. Repartitioning the *documents* (cheap: rows are small
before the explode) spreads that work across all cores. At 100 TB inputs
are already many partitions and this is a no-op — we only repartition
when the input has fewer partitions than the session's parallelism.

The partition count is estimated from the scan's input files (Spark packs
files into splits of ``maxPartitionBytes`` with ``openCostInBytes`` per
file) — a few ms of driver time, vs ~200 ms for ``df.rdd.getNumPartitions``
which builds the whole Python-conversion plan. Non-file sources fall back
to the RDD path.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_MAX_PARTITION_BYTES = 128 << 20  # spark.sql.files.maxPartitionBytes default
_OPEN_COST_BYTES = 4 << 20  # spark.sql.files.openCostInBytes default


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the file-scan partition count, or None if not a file scan."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        path = urlparse(f).path
        try:
            total += os.path.getsize(path) + _OPEN_COST_BYTES
        except OSError:
            return None
    return max(1, -(-total // _MAX_PARTITION_BYTES))


def fan_out(df: DataFrame) -> DataFrame:
    par = df.sparkSession.sparkContext.defaultParallelism
    n = _estimated_scan_partitions(df)
    if n is None:
        n = df.rdd.getNumPartitions()
    if n < par:
        return df.repartition(par)
    return df
