"""O4 — retention expiry.

The reference's fixed-size ring buffer silently overwrites points older than
``sec_per_point * count`` (kenshin/storage.py:499-503); a slot whose stored
ts is outside the queried lap is stale and reads as NULL
(kenshin/storage.py:686-691). In a table world expiry is an explicit,
partition-prunable DELETE: ``ts >= now - retention``.

At 100 TB the points table is partitioned by date (derived from ts), so
expiry is a metadata-only partition drop, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenshin_spark.config import Archive


def apply_retention(
    df: DataFrame, archive: Archive, now: int, ts_col: str = "ts"
) -> DataFrame:
    """Rows still live in this archive: ``ts >= now - retention`` and not in
    the future (future points are rejected upstream; the filter keeps the
    read path safe regardless, mirroring the stale-slot filter R5)."""
    oldest = now - archive.retention
    return df.where(
        (F.col(ts_col) >= F.lit(oldest)) & (F.col(ts_col) <= F.lit(now))
    )


def expired(df: DataFrame, archive: Archive, now: int, ts_col: str = "ts") -> DataFrame:
    """The complement — what a retention job would DELETE / drop."""
    return df.where(F.col(ts_col) < F.lit(now - archive.retention))
