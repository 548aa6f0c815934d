#!/usr/bin/env python
"""Scaling-curve soak (VERDICT r9 next-round #5): run the most
expensive bench rows at sf1 (tools/gen_sf1.py — 10× the sf0.1
documents/embeddings) and report wall vs a same-session sf0.1 run.
A row whose wall grows ≫10× on 10× data is hiding a superlinear step.

Eligible families: document/embedding-driven rows (gen_sf1 regrows the
corpora 10×) and — since r11 — events-driven engine rows (gen_sf1
scales events 10× by SERIES count: 50 event types over the same
30-day window at unchanged per-series density). TPC-H-table rows
(q_*, most ts_ analytics on orders/lineitem) stay ineligible: those
tables are copied from sf0.1 verbatim (the driver's generator is not
ours to reproduce).

Usage:
    python tools/sf1_soak.py [--top N] [name ...]

Picks the top N (default 20) eligible rows by sf0.1 wall from
bench_partial.json when no names are given. Emits a markdown table on
stdout (paste into SCALING.md) plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "testdata_sf1")

#: name prefixes whose inputs gen_sf1 actually scales
SCALED_PREFIXES = (
    "dedup_", "sim_", "text_", "bpe_", "pipeline_", "quality_",
    "sample_", "sketch_", "mm_", "ann_",
    # events scale 10x by series count since r11 — the store/ingest
    # engine rows and the ts_ analytics ingest events-as-points, so
    # they're now measurable
    "store_", "ingest_", "serving_", "emb_", "ts_",
)


def _eligible(name: str) -> bool:
    return name.startswith(SCALED_PREFIXES)


def _wall(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return time.perf_counter() - t0


def main() -> None:
    from kenshin_spark.queries import QUERIES
    from kenshin_spark.session import get_spark

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("names", nargs="*")
    ns = ap.parse_args()
    top = ns.top
    if ns.names:
        names = ns.names
    else:
        partial = os.path.join(REPO, "bench_partial.json")
        timings = json.load(open(partial))["queries"]
        names = [
            n for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])
            if _eligible(n)
        ][:top]
    if not os.path.isdir(SF1):
        sys.exit("testdata_sf1 missing — run tools/gen_sf1.py first")

    spark = get_spark("sf1-soak", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        fn = QUERIES[name].fn
        _wall(fn, spark, SF01)  # warm codegen/JIT for this plan shape
        w01 = _wall(fn, spark, SF01)
        _wall(fn, spark, SF1)
        w1 = _wall(fn, spark, SF1)
        ratio = w1 / w01 if w01 else float("inf")
        rows.append((name, w01, w1, ratio))
        print(
            f"[sf1_soak] {name}: sf0.1 {w01:.2f}s  sf1 {w1:.2f}s  "
            f"x{ratio:.1f}",
            file=sys.stderr, flush=True,
        )
    print("| row | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for name, w01, w1, ratio in rows:
        flag = " ⚠" if ratio > 10 else ""
        print(f"| {name} | {w01:.2f} | {w1:.2f} | {ratio:.1f}×{flag} |")
    print(json.dumps({
        "rows": {n: {"sf01_s": round(a, 3), "sf1_s": round(b, 3),
                     "ratio": round(r, 2)} for n, a, b, r in rows},
        "superlinear": [n for n, _, _, r in rows if r > 10],
    }))


if __name__ == "__main__":
    main()
