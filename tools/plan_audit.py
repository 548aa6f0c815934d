#!/usr/bin/env python
"""Plan audit over the full query registry (optimization guide §1/§7.2).

For every registered query: capture ``explain('formatted')`` and emit a
one-line summary — #Exchange, join strategies, Python-eval nodes, scans
without pushed filters — so outliers pop. Writes the full plan text per
query under ``plans/<tag>/`` and a TSV summary to stdout.

Usage: python tools/plan_audit.py <tag> [name_prefix ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_text(df) -> str:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def summarize(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", txt)),
        "pyeval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython)\b", txt)
        ),
        "mapinarrow": len(
            re.findall(r"\b(MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b", txt)
        ),
        "scans": len(re.findall(r"Scan parquet", txt)),
        "nofilter_scans": len(
            re.findall(r"PushedFilters: \[\]", txt)
        ),
        "window": len(re.findall(r"\bWindow\b", txt)),
        "rows": len(txt.splitlines()),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "audit"
    prefixes = tuple(sys.argv[2:])
    from kenshin_spark.queries import QUERIES, driver_order
    from kenshin_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    names = [
        n for n in driver_order() if not prefixes or n.startswith(prefixes)
    ]
    cols = [
        "name", "exchanges", "smj", "bhj", "shj", "bnlj", "cartesian",
        "pyeval", "mapinarrow", "scans", "nofilter_scans", "window", "rows",
    ]
    print("\t".join(cols), flush=True)
    for n in names:
        try:
            df = QUERIES[n].fn(spark, SF_DIR)
            txt = plan_text(df)
        except Exception:
            print(f"{n}\tERROR", flush=True)
            with open(os.path.join(out_dir, f"{n}.err"), "w") as f:
                f.write(traceback.format_exc())
            continue
        with open(os.path.join(out_dir, f"{n}.txt"), "w") as f:
            f.write(txt)
        s = summarize(txt)
        print("\t".join([n] + [str(s[c]) for c in cols[1:]]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
