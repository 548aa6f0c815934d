"""Overflow bank — ROUND 16: exactly one row, ``q_ship_latency_bands``,
deferred from the round-9 bank so round 9's 50-slot driver window could
seat the re-verification of ``q_zero_discount_share`` (the one
never-green registry row, red on the r8 HUGEINT oracle-typing bug fixed
in this round's ``oracle_types`` sweep) alongside 49 new rows.

Same staging mechanism and gate as the earlier banks
(``tests/test_queries_staged_r16.py``). Promote with
``python tools/promote_staged.py queries_staged_r16`` once round 15's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QuerySpec

STAGED_R16: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R16[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "q_ship_latency_bands",
    """
    SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                  THEN '0-30'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 60
                  THEN '31-60'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90
                  THEN '61-90'
                ELSE '90+' END AS band,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
    "order-to-ship latency bands per order month: the lineitem-orders "
    "key join (co-partitioned on orderkey — the classic TPC-H join "
    "Catalyst plans as one shuffle pair) with integer day arithmetic "
    "banded into fulfilment SLas",
)
def q_q_ship_latency_bands(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lat = F.datediff("l_shipdate", "o_orderdate")
    band = (
        F.when(lat <= 30, "0-30")
        .when(lat <= 60, "31-60")
        .when(lat <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        j.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            band.alias("band"),
        )
        .groupBy("month", "band")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
