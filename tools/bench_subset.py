#!/usr/bin/env python
"""A/B subset bench — times a named subset of registry queries with the
exact bench.py methodology (warm run, then timed run against the noop
sink) so per-query before/after numbers are comparable without paying a
full 497-row sweep per iteration.

Usage: python tools/bench_subset.py name1 name2 ...   (or prefix: with a
trailing '*' e.g. 'ingest_*'); repeats each timed run
$SPARK_GRAFT_BENCH_REPS times (default 3) and reports min/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    from kenshin_spark.queries import QUERIES, driver_order
    from kenshin_spark.session import get_spark

    args = sys.argv[1:]
    names = []
    for a in args:
        if a.endswith("*"):
            names += [n for n in driver_order() if n.startswith(a[:-1])]
        elif a in QUERIES:
            names.append(a)
        else:
            print(f"unknown query: {a}", file=sys.stderr)
            sys.exit(2)
    spark = get_spark("kenshin-bench-subset", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()

    out = {}
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        # all reps measure the same (cold-cache) regime — the warm run
        # otherwise leaves InMemoryRelations that only rep 0 sees
        # (ADVICE r11)
        spark.catalog.clearCache()
        times = []
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = {
            "min": round(min(times), 3),
            "median": round(statistics.median(times), 3),
            "runs": [round(t, 3) for t in times],
        }
        print(
            f"{name}: min={out[name]['min']} median={out[name]['median']} "
            f"runs={out[name]['runs']}",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
