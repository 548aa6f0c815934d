"""KenshinEngine — the facade tying ingest → tiers → fetch together.

Plays the role of the reference's ``kenshin`` module facade
(kenshin/__init__.py:10-24: create/update/fetch/header) plus the rurouni
cache's hot/cold split (§3.3 of SURVEY.md), as a library over DataFrames:

- ``ingest(points)``     → aligned, deduplicated tier-0 (W1/W5)
- ``tiers(points)``      → the full downsample cascade (W7)
- ``fetch(...)``         → clamped, tier-selected, grid-filled read (R1-R3)
- ``fetch_union(...)``   → hot (unflushed) ∪ cold with last-write-wins,
                           the cache-query merge (S3, rurouni/cache.py:161-169)

Storage is the caller's concern (Parquet/Delta partitioned by
(resolution, date), bucketed by metric at scale); every method returns a
declarative plan Catalyst can prune and push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.config import Schema
from kenshin_spark.operators.align import last_write_wins
from kenshin_spark.operators.downsample import cascade
from kenshin_spark.operators.fetch import fetch as _fetch
from kenshin_spark.operators.retention import apply_retention


class KenshinEngine:
    def __init__(self, schema: Schema, skew_salts: int | None = None):
        self.schema = schema
        #: spread hot metrics' LWW align over N reducers (SURVEY §7.3)
        self.skew_salts = skew_salts

    def ingest(self, points: DataFrame, arrival_col: str | None = None) -> DataFrame:
        """Raw points → tier-0: align to the finest step, last-write-wins
        per slot (W5, kenshin/storage.py:427-445)."""
        step = self.schema.archives[0].sec_per_point
        return last_write_wins(
            points, step, arrival_col=arrival_col, skew_salts=self.skew_salts
        )

    def tiers(self, points: DataFrame, arrival_col: str | None = None) -> list[DataFrame]:
        """The full cascade, tier 0..n-1 (W7, kenshin/storage.py:482-586)."""
        tier0 = self.ingest(points, arrival_col)
        return cascade(tier0, list(self.schema.archives), self.schema.agg_method)

    def fetch(
        self,
        tiers: list[DataFrame],
        metrics: DataFrame | list[str],
        from_time: int,
        until_time: int,
        now: int,
    ) -> DataFrame | None:
        return _fetch(
            tiers, list(self.schema.archives), metrics, from_time, until_time, now
        )

    def retained(self, tiers: list[DataFrame], now: int) -> list[DataFrame]:
        """Apply per-archive retention (O4) to each tier."""
        return [
            apply_retention(t, a, now)
            for t, a in zip(tiers, self.schema.archives)
        ]

    def fetch_union(
        self,
        cold: DataFrame,
        hot: DataFrame,
        arrival_col: str = "arrival",
    ) -> DataFrame:
        """S3/§3.3 — merge the hot (unflushed, e.g. streaming state or a
        short-retention partition) and cold tiers; on slot collisions the
        hot point wins (it is by construction the newer write,
        rurouni/cache.py:264-280)."""
        c = cold.select("metric", "ts", "value", F.lit(0).alias("_src"))
        h = hot.select("metric", "ts", "value", F.lit(1).alias("_src"))
        return (
            c.unionByName(h)
            .groupBy("metric", "ts")
            .agg(F.expr("max_by(value, _src)").alias("value"))
        )
