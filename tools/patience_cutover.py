#!/usr/bin/env python
"""Measure the patience=8 escalation cutover on diameter-9..25 graphs.

ADVICE r9: the patience=8 default changes the cost profile for label
callers whose graphs have diameter between ~8 and max_iter — they now
take the hybrid escalation (contraction join + localCheckpoint + count
+ composition join) where plain label propagation would have finished
on its own. This script prices that trade so the default is deliberate:
for each diameter D it builds parallel-chain graphs (20k chains of D
edges each -> ~20k*D edges, diameter exactly D), runs the label path
with patience=None (pure label, rounds ~= D) and patience=8 (hybrid
fires at D > 8), asserts identical labellings, and reports wall
seconds + rounds. SCALING.md records the table.

Usage: python tools/patience_cutover.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAINS = 20_000


def build(spark, diameter: int):
    from pyspark.sql import functions as F

    # chain c occupies ids [c*(D+1), c*(D+1)+D]; edges link consecutive
    n = diameter + 1
    return (
        spark.range(CHAINS * diameter)
        .select(
            (F.col("id") % diameter
             + (F.col("id") / diameter).cast("long") * n).alias("doc_a"),
        )
        .withColumn("doc_b", F.col("doc_a") + 1)
    )


def main() -> None:
    from kenshin_spark.dedup.cluster import connected_components
    from kenshin_spark.session import get_spark

    spark = get_spark("patience-cutover")
    rows = []
    for d in (6, 9, 12, 16, 20, 25):
        pairs = build(spark, d).localCheckpoint(eager=True)
        row = {"diameter": d, "edges": pairs.count()}
        fps = {}
        for label, patience in (("pure_label", None), ("patience8", 8)):
            stats: dict = {}
            t0 = time.time()
            cc = connected_components(
                pairs, algorithm="label", stats=stats, patience=patience,
                max_iter=40,
            )
            agg = cc.groupBy().agg(
                __import__("pyspark.sql.functions", fromlist=["x"]).sum(
                    "cluster_id"
                ).alias("s"),
                __import__("pyspark.sql.functions", fromlist=["x"]).count(
                    "*"
                ).alias("n"),
            ).collect()[0]
            row[f"{label}_wall_s"] = round(time.time() - t0, 2)
            row[f"{label}_rounds"] = stats.get("rounds")
            if stats.get("escalated_from_label") is not None:
                row["escalated_after"] = stats["escalated_from_label"]
            fps[label] = (agg["s"], agg["n"])
        assert fps["pure_label"] == fps["patience8"], (d, fps)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"table": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
