#!/usr/bin/env python
"""Job/task-count profile for registry queries (VERDICT r11 items 2/3/7:
"job count is the right noise-free metric on this noisy box").

For each named query: one warm pass (codegen/JIT), then a measured pass
wrapped in a job group — reports Spark JOB count, total TASK count, and
wall seconds for the measured pass. Job/task counts are deterministic
per plan shape (unlike wall-clock on this box), so before/after deltas
of an optimization are attributable.

Usage: python tools/job_profile.py name1 name2 ...  (trailing '*' = prefix)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def profile_one(spark, name, fn):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup(f"warm:{name}", f"warm:{name}")
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    group = f"prof:{name}"
    sc.setJobGroup(group, group)
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    job_ids = tracker.getJobIdsForGroup(group)
    n_tasks = 0
    stages_seen = set()
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            if sid in stages_seen:
                continue
            stages_seen.add(sid)
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_tasks += sinfo.numTasks
    spark.catalog.clearCache()
    return {
        "jobs": len(job_ids),
        "stages": len(stages_seen),
        "tasks": n_tasks,
        "wall": round(wall, 3),
    }


def main() -> None:
    from kenshin_spark.queries import QUERIES, driver_order
    from kenshin_spark.session import get_spark

    names = []
    for a in sys.argv[1:]:
        if a.endswith("*"):
            names += [n for n in driver_order() if n.startswith(a[:-1])]
        elif a in QUERIES:
            names.append(a)
        else:
            print(f"unknown query: {a}", file=sys.stderr)
            sys.exit(2)
    spark = get_spark("kenshin-job-profile", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()
    out = {}
    for name in names:
        out[name] = profile_one(spark, name, QUERIES[name].fn)
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
