#!/usr/bin/env python
"""Measure the LSH banding recall curve on the sf1 soak corpus
(VERDICT r6 item 4 / "What's wrong" #2).

For each (bands, rows_per_band) along density_scaled_banding's
trajectory — plus the recall_calibrated_banding points — run
embedding_neardup_pairs_lsh at threshold 0.4 over testdata_sf1
embeddings and report recall against the EXACT ground truth
(embedding_neardup_pairs, the same oracle the driver hashes), pair
counts, and wall seconds.  Output: a markdown table for SCALING.md and
one JSON line for trending.

Usage:  python tools/recall_curve.py [sf_dir]   (default testdata_sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_sf1"
    )
    from kenshin_spark.dedup.embedding import (
        density_scaled_banding,
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
        recall_calibrated_banding,
    )
    from kenshin_spark.io import load_table
    from kenshin_spark.session import get_spark

    spark = get_spark("recall-curve", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()

    t0 = time.time()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    exact_wall = time.time() - t0
    print(f"# n={n} vectors; exact ground truth: {len(exact)} pairs "
          f"in {exact_wall:.1f}s", flush=True)

    # trajectory: the density law's own points from the floor up to the
    # auto pick for this corpus, then the recall-calibrated points.
    auto_b, auto_r = density_scaled_banding(n)
    points: list[tuple[str, int, int]] = [("fixed floor", 16, 4)]
    for r in range(5, auto_r + 1):
        points.append((f"density r={r}", 16 + (r - 4), r))
    for tr in (0.8, 0.9):
        cb, cr = recall_calibrated_banding(n, threshold=0.4, target_recall=tr)
        points.append((f"calibrated R={tr}", cb, cr))

    rows_out = []
    for label, b, r in points:
        t0 = time.time()
        got = {
            (x["vec_a"], x["vec_b"])
            for x in embedding_neardup_pairs_lsh(
                emb, threshold=0.4, bands=b, rows_per_band=r
            ).collect()
        }
        wall = time.time() - t0
        assert got <= exact, f"{label}: LSH invented pairs"
        recall = len(got) / len(exact) if exact else 1.0
        rows_out.append(
            dict(label=label, bands=b, rows=r, pairs=len(got),
                 recall=round(recall, 4), wall_s=round(wall, 2))
        )
        print(f"| {label} | ({b}, {r}) | {len(got)} | {recall:.1%} "
              f"| {wall:.1f} |", flush=True)

    print(json.dumps(dict(
        n_vectors=n, exact_pairs=len(exact),
        exact_wall_s=round(exact_wall, 1), sweep=rows_out,
    )))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
