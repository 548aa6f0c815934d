#!/usr/bin/env python
"""Measure merge-on-read amplification: fetch cost vs uncompacted log
length, grounding ``needs_compaction``'s defaults in data.

The mor store's write path is O(batch) appends (the analog of the
reference's O(1) ring write, kenshin/storage.py:499-503); the read
path pays a last-write-wins resolve over every appended version until
``compact()`` folds the log. This tool prices that trade: one store,
one fixed key universe (every batch REWRITES the same keys — the LWW
worst case, B live versions per slot), fetch wall measured after each
doubling of the log, then again after compaction folds the same
content. The amp ratio (uncompacted / folded at identical content)
isolates fragmentation cost from data volume.

Output: one JSON document on stdout; SCALING.md records the table.
Usage: python tools/mor_read_amp.py [--rows N] [--points 1,2,4,...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timed_reads(store, metrics, frm, until, now, n_trials=3):
    """Median wall of a full grid fetch + a tier-0 resolve count."""
    fetch_walls, resolve_walls = [], []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        df = store.fetch(metrics, frm, until, now)
        n = df.count() if df is not None else 0
        fetch_walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        store.read(0).count()
        resolve_walls.append(time.perf_counter() - t0)
    fetch_walls.sort()
    resolve_walls.sort()
    return {
        "fetch_s": round(fetch_walls[len(fetch_walls) // 2], 3),
        "resolve_s": round(resolve_walls[len(resolve_walls) // 2], 3),
        "grid_rows": n,
    }


def run(spark, sf_dir: str, target_rows: int, points: list[int]) -> dict:
    import math

    from pyspark.sql import functions as F

    from kenshin_spark.config import Schema
    from kenshin_spark.io import load_table
    from kenshin_spark.sources.line_protocol import events_as_points
    from kenshin_spark.store import ParquetTieredStore

    schema = Schema.from_strings(
        "amp", ".*", "60s:90d,300s:180d", xff=20.0, agg_method="max"
    )
    base = events_as_points(load_table(spark, sf_dir, "events"))
    n_base = base.count()
    reps = max(1, math.ceil(target_rows / max(n_base, 1)))
    pts = (
        base.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(reps)]))
        )
        .withColumn("metric", F.concat_ws("_", "metric", F.col("_r")))
        .drop("_r")
    )
    # one fixed batch of LWW60-aligned slots; every upsert rewrites it
    slots = (
        pts.groupBy(
            "metric", (F.col("ts") - F.col("ts") % 60).alias("ts")
        )
        .agg(F.max(F.struct("arrival", "value"))["value"].alias("value"))
        .localCheckpoint(eager=True)
    )
    n_slots = slots.count()
    lo, hi = [int(v) for v in slots.agg(F.min("ts"), F.max("ts")).first()]
    probe = [
        r["metric"]
        for r in slots.groupBy("metric").count()
        .orderBy(F.desc("count"), "metric").limit(4).collect()
    ]
    window = (max(lo, hi - 4 * 3600), hi, hi)

    root = tempfile.mkdtemp(prefix="kenshin_amp_")
    rows = []
    try:
        store = ParquetTieredStore(spark, schema, root, mode="mor")
        written = 0
        for b in range(1, max(points) + 1):
            store.upsert(0, slots)
            written = b
            if b in points:
                m = _timed_reads(store, probe, *window)
                rep = store.file_report(0)
                m.update(
                    batches=b,
                    versions_rows=n_slots * b,
                    files=sum(r["n_files"] for r in rep),
                    degraded_days=len(store.needs_compaction(0, report=rep)),
                )
                rows.append(m)
                print(f"[mor_amp] log B={b}: {m}", file=sys.stderr, flush=True)
        # fold the log: identical content, one version per slot
        store.compact(0)
        m = _timed_reads(store, probe, *window)
        rep = store.file_report(0)
        m.update(
            batches=written,
            versions_rows=n_slots,
            files=sum(r["n_files"] for r in rep),
            degraded_days=0,
            compacted=True,
        )
        rows.append(m)
        print(f"[mor_amp] compacted: {m}", file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    folded = rows[-1]
    for r in rows[:-1]:
        r["fetch_amp"] = round(r["fetch_s"] / max(folded["fetch_s"], 1e-9), 2)
    return {"slots": n_slots, "probe": probe, "rows": rows}


def main() -> None:
    from kenshin_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = int(os.environ.get("SPARK_GRAFT_AMP_ROWS", "200000"))
    points = [1, 2, 4, 8, 16, 32]
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            target = int(a.split("=", 1)[1])
        elif a.startswith("--points"):
            points = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark("mor-read-amp", cpus=None)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, sf_dir, target, points), indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
