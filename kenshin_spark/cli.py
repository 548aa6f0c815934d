"""CLI — the reference's bin/ tools over a tiered store.

Mirrors the operator surface of bin/kenshin-info.py, bin/kenshin-fetch.py,
bin/kenshin-get-metrics.py, bin/kenshin-delete.py, and
bin/kenshin-change-schema.py as subcommands over a ``ParquetTieredStore``
root. Usage::

    python -m kenshin_spark.cli info   --root /data/store --retentions 60s:1d,300s:7d
    python -m kenshin_spark.cli fetch  --root ... --metric sys.cpu --from 0 --until 3600
    python -m kenshin_spark.cli search --root ... --pattern '^sys\\.'
    python -m kenshin_spark.cli delete --root ... --metric sys.cpu.old
    python -m kenshin_spark.cli expire --root ... --now 1700000000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from kenshin_spark.config import Schema
from kenshin_spark.operators.maintenance import index_rebuild, metric_search
from kenshin_spark.session import get_spark
from kenshin_spark.store import ParquetTieredStore


def _store(args) -> ParquetTieredStore:
    spark = get_spark("kenshin-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    schema = Schema.from_strings(
        "cli", ".*", args.retentions, xff=args.xff, agg_method=args.agg
    )
    return ParquetTieredStore(spark, schema, args.root)


def cmd_info(args) -> None:
    """bin/kenshin-info.py — per-metric stats from tier 0."""
    store = _store(args)
    for r in index_rebuild(store.read(0)).collect():
        print(json.dumps(r.asDict()))


def cmd_fetch(args) -> None:
    """bin/kenshin-fetch.py — grid fetch of one metric."""
    store = _store(args)
    now = args.now or int(time.time())
    grid = store.fetch([args.metric], args.from_ts, args.until_ts, now)
    if grid is None:
        print("null")  # window entirely outside retention
        return
    for r in grid.orderBy("ts").collect():
        print(f"{r['ts']}\t{r['value']}")


def cmd_search(args) -> None:
    """bin/kenshin-get-metrics.py — regex search over stored metrics."""
    store = _store(args)
    for r in metric_search(store.read(0), [args.pattern]).collect():
        print(r["metric"])


def cmd_delete(args) -> None:
    """bin/kenshin-delete.py — remove a metric's rows from all tiers."""
    store = _store(args)
    store.delete_metrics([args.metric])
    print(f"deleted {args.metric}")


def cmd_expire(args) -> None:
    """The retention-expiry job (SURVEY O4) — partition drops."""
    store = _store(args)
    now = args.now or int(time.time())
    dropped = store.expire(now)
    print(json.dumps({str(k): v for k, v in dropped.items()}))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kenshin-spark")
    p.add_argument("--root", required=True)
    p.add_argument("--retentions", default="60s:1d,300s:7d,3600s:90d")
    p.add_argument("--agg", default="average")
    p.add_argument("--xff", type=float, default=20.0)
    p.add_argument("--cpus", type=int, default=4)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("info")
    f = sub.add_parser("fetch")
    f.add_argument("--metric", required=True)
    f.add_argument("--from", dest="from_ts", type=int, required=True)
    f.add_argument("--until", dest="until_ts", type=int, required=True)
    f.add_argument("--now", type=int, default=None)
    s = sub.add_parser("search")
    s.add_argument("--pattern", required=True)
    d = sub.add_parser("delete")
    d.add_argument("--metric", required=True)
    e = sub.add_parser("expire")
    e.add_argument("--now", type=int, default=None)

    args = p.parse_args(argv)
    {
        "info": cmd_info,
        "fetch": cmd_fetch,
        "search": cmd_search,
        "delete": cmd_delete,
        "expire": cmd_expire,
    }[args.cmd](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
