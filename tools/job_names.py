#!/usr/bin/env python
"""Per-job breakdown of one registry query: runs the query in a
UI-enabled session and dumps every Spark job's description + stage/task
counts from the REST API — the "where do the 40 jobs of this row
actually come from" tool (VERDICT r11 item 2 wants the planning gaps
named, not guessed).

Usage: python tools/job_names.py <query> [more...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession

    from kenshin_spark.queries import QUERIES

    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("job-names")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "2000")
        .config("spark.ui.retainedStages", "4000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    for name in names:
        fn = QUERIES[name].fn
        sc.setLocalProperty("spark.jobGroup.id", f"warm:{name}")
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        group = f"prof:{name}"
        # raw local property, NOT setJobGroup(desc) — a group description
        # would shadow the per-action SQL descriptions we want to read
        sc.setLocalProperty("spark.jobGroup.id", group)
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        sc.setLocalProperty("spark.jobGroup.id", None)
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
            jobs = json.loads(r.read())
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/sql?length=10000&details=true") as r:
            sqls = json.loads(r.read())
        job_to_sql = {}
        for s in sqls:
            label = s.get("description", "")
            for jid in s.get("successJobIds", []) + s.get("runningJobIds", []):
                job_to_sql[jid] = label
        mine = [j for j in jobs if j.get("jobGroup") == group]
        mine.sort(key=lambda j: j["jobId"])
        print(f"==== {name}: {len(mine)} jobs")
        for j in mine:
            print(
                f"  [{j['jobId']:>4}] tasks={j['numTasks']:>5} "
                f"stages={len(j['stageIds'])} "
                f"{job_to_sql.get(j['jobId'], '(non-sql)')[:110]}"
            )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
