#!/usr/bin/env python
"""Benchmark harness — runs every registered engine query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute) against the `noop` sink so
we measure engine throughput, not driver-side collect/serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from kenshin_spark.queries import QUERIES
    from kenshin_spark.session import get_spark

    spark = get_spark("kenshin-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM / codegen paths so q1 doesn't pay session startup
    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()

    # warm-then-measure: the first execution of each query pays one-time
    # codegen/JIT compilation (~4s for the DECIMAL-heavy plans); the timed
    # run reports steady-state engine throughput, the number that scales.
    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        spec.fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
